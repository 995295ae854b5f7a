// Drives the reference's OFDM slot modulator + demodulator for IQ-level
// cross-validation of ops/ofdm.py (DFT + TS 38.211 Section 5.4 phase
// compensation + CP insertion/removal).
// Usage: dump_ofdm <bw_rb> <dft_size> <slot_in_subframe> <seed> <center_freq_hz>
#include "ofdm_demodulator_impl.h"
#include "ofdm_modulator_impl.h"
#include "dft_processor_generic_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/support/resource_grid_writer.h"
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <random>
#include <vector>

using namespace srsran;

namespace {
class dense_grid : public resource_grid_reader, public resource_grid_writer
{
public:
  dense_grid(unsigned nsubc_, unsigned nsym_)
    : nsubc(nsubc_), nsym(nsym_), data(nsubc_ * nsym_), data_cbf16(nsubc_ * nsym_) {}

  void set(unsigned l, unsigned k, cf_t v)
  {
    data[l * nsubc + k]       = v;
    data_cbf16[l * nsubc + k] = to_cbf16(v);
  }
  cf_t     at(unsigned l, unsigned k) const { return data[l * nsubc + k]; }
  unsigned get_nof_subc() const override { return nsubc; }
  unsigned get_nof_symbols() const override { return nsym; }
  unsigned get_nof_ports() const override { return 1; }
  bool     is_empty(unsigned) const override { return false; }
  bool     is_empty() const override { return false; }

  // ------------------------------------------------------------- reader --
  span<cf_t> get(span<cf_t> symbols, unsigned, unsigned l, unsigned k_init,
                 const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(), [&](unsigned k) { symbols[count++] = data[l * nsubc + k_init + k]; });
    return symbols.subspan(count, symbols.size() - count);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned, unsigned l, unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(), [&](unsigned k) { symbols[count++] = to_cbf16(data[l * nsubc + k_init + k]); });
    return symbols.subspan(count, symbols.size() - count);
  }
  void get(span<cf_t> symbols, unsigned, unsigned l, unsigned k_init, unsigned stride) const override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = data[l * nsubc + k_init + i * stride];
  }
  void get(span<cbf16_t> symbols, unsigned, unsigned l, unsigned k_init) const override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = to_cbf16(data[l * nsubc + k_init + i]);
  }
  span<const cbf16_t> get_view(unsigned, unsigned l) const override
  {
    return span<const cbf16_t>(data_cbf16).subspan(l * nsubc, nsubc);
  }

  // ------------------------------------------------------------- writer --
  span<const cf_t> put(unsigned, unsigned l, unsigned k_init,
                       const bounded_bitset<MAX_RB * NRE>& mask, span<const cf_t> symbols) override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(), [&](unsigned k) { set(l, k_init + k, symbols[count++]); });
    return symbols.subspan(count, symbols.size() - count);
  }
  void put(unsigned, unsigned l, unsigned k_init, span<const cf_t> symbols) override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      set(l, k_init + i, symbols[i]);
  }
  void put(unsigned, unsigned l, unsigned k_init, unsigned stride, span<const cf_t> symbols) override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      set(l, k_init + i * stride, symbols[i]);
  }

private:
  unsigned             nsubc;
  unsigned             nsym;
  std::vector<cf_t>    data;
  std::vector<cbf16_t> data_cbf16;
};
} // namespace

int main(int argc, char** argv)
{
  if (argc < 6) {
    fprintf(stderr, "usage: dump_ofdm bw_rb dft_size slot seed center_freq_hz\n");
    return 1;
  }
  unsigned bw_rb    = atoi(argv[1]);
  unsigned dft_size = atoi(argv[2]);
  unsigned slot     = atoi(argv[3]);
  unsigned seed     = atoi(argv[4]);
  double   fc_hz    = atof(argv[5]);

  const unsigned nsym = 14;
  dense_grid     grid(bw_rb * NRE, nsym);

  std::mt19937                    rng(seed);
  std::normal_distribution<float> gauss(0.0F, 1.0F);
  printf("GRID");
  for (unsigned l = 0; l != nsym; ++l)
    for (unsigned k = 0; k != bw_rb * NRE; ++k) {
      cf_t v(gauss(rng), gauss(rng));
      grid.set(l, k, v);
      printf(" %a %a", v.real(), v.imag());
    }

  ofdm_modulator_configuration mod_cfg;
  mod_cfg.numerology     = 1;
  mod_cfg.bw_rb          = bw_rb;
  mod_cfg.dft_size       = dft_size;
  mod_cfg.cp             = cyclic_prefix::NORMAL;
  mod_cfg.scale          = 1.0F;
  mod_cfg.center_freq_hz = fc_hz;

  ofdm_modulator_common_configuration mod_common;
  mod_common.dft = std::make_unique<dft_processor_generic_impl>(
      dft_processor::configuration{dft_size, dft_processor::direction::INVERSE});
  ofdm_slot_modulator_impl modulator(mod_common, mod_cfg);

  unsigned          slot_size = modulator.get_slot_size(slot);
  std::vector<cf_t> samples(slot_size);
  modulator.modulate(samples, grid, 0, slot);
  printf("\nSAMPLES");
  for (const cf_t& s : samples)
    printf(" %a %a", s.real(), s.imag());

  ofdm_demodulator_configuration dem_cfg;
  dem_cfg.numerology                = 1;
  dem_cfg.bw_rb                     = bw_rb;
  dem_cfg.dft_size                  = dft_size;
  dem_cfg.cp                        = cyclic_prefix::NORMAL;
  dem_cfg.nof_samples_window_offset = 0;
  dem_cfg.scale                     = 1.0F;
  dem_cfg.center_freq_hz            = fc_hz;

  ofdm_demodulator_common_configuration dem_common;
  dem_common.dft = std::make_unique<dft_processor_generic_impl>(
      dft_processor::configuration{dft_size, dft_processor::direction::DIRECT});
  ofdm_slot_demodulator_impl demodulator(dem_common, dem_cfg);

  dense_grid rx_grid(bw_rb * NRE, nsym);
  demodulator.demodulate(rx_grid, samples, 0, slot);
  printf("\nDEMOD");
  for (unsigned l = 0; l != nsym; ++l)
    for (unsigned k = 0; k != bw_rb * NRE; ++k) {
      cf_t v = rx_grid.at(l, k);
      printf(" %a %a", v.real(), v.imag());
    }
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
