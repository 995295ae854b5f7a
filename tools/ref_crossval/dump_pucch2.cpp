// Drives the reference's PUCCH format-2 demodulator (equalize over all rx
// ports -> QPSK soft demap -> descramble) + short-block ML detector for
// cross-validation of phy/pucch.py process_pucch_format2.
// Reads the scenario from stdin (text):
//   nof_prb nsym l0 rnti n_id k nports
//   per port: h_re h_im nvar
//   per (port, symbol): 12*nof_prb x (re im)   [hexfloat]
#include "pucch_demodulator_impl.h"
#include "channel_equalizer_generic_impl.h"
#include "demodulation_mapper_impl.h"
#include "pseudo_random_generator_impl.h"
#include "short_block_detector_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/upper/channel_estimation.h"
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <vector>

using namespace srsran;

namespace {
class dense_grid : public resource_grid_reader
{
public:
  dense_grid(unsigned nsubc_, unsigned nsym_, unsigned nport_)
    : nsubc(nsubc_), nsym(nsym_), nport(nport_), data(nsubc_ * nsym_ * nport_) {}

  cf_t&    at(unsigned p, unsigned l, unsigned k) { return data[(p * nsym + l) * nsubc + k]; }
  unsigned get_nof_subc() const override { return nsubc; }
  unsigned get_nof_symbols() const override { return nsym; }
  unsigned get_nof_ports() const override { return nport; }
  bool     is_empty(unsigned) const override { return false; }
  bool     is_empty() const override { return false; }

  span<cf_t> get(span<cf_t> symbols, unsigned p, unsigned l, unsigned k_init,
                 const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(),
                  [&](unsigned k) { symbols[count++] = data[(p * nsym + l) * nsubc + k_init + k]; });
    return symbols.subspan(count, symbols.size() - count);
  }
  span<cbf16_t> get(span<cbf16_t> symbols, unsigned p, unsigned l, unsigned k_init,
                    const bounded_bitset<MAX_RB * NRE>& mask) const override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(),
                  [&](unsigned k) { symbols[count++] = to_cbf16(data[(p * nsym + l) * nsubc + k_init + k]); });
    return symbols.subspan(count, symbols.size() - count);
  }
  void get(span<cf_t> symbols, unsigned p, unsigned l, unsigned k_init, unsigned stride) const override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = data[(p * nsym + l) * nsubc + k_init + i * stride];
  }
  void get(span<cbf16_t> symbols, unsigned p, unsigned l, unsigned k_init) const override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      symbols[i] = to_cbf16(data[(p * nsym + l) * nsubc + k_init + i]);
  }
  span<const cbf16_t> get_view(unsigned, unsigned) const override { return {}; }

private:
  unsigned          nsubc;
  unsigned          nsym;
  unsigned          nport;
  std::vector<cf_t> data;
};
} // namespace

int main()
{
  unsigned nof_prb, nsym, l0, rnti, n_id, k, nports;
  if (scanf("%u %u %u %u %u %u %u", &nof_prb, &nsym, &l0, &rnti, &n_id, &k, &nports) != 7)
    return 1;

  const unsigned first_prb = 2;
  const unsigned bwp_rb    = first_prb + nof_prb + 2;
  dense_grid       grid(bwp_rb * NRE, 14, nports);
  channel_estimate estimate({bwp_rb, 14, nports, 1});

  for (unsigned p = 0; p != nports; ++p) {
    float hr, hi, nv;
    if (scanf("%a %a %a", &hr, &hi, &nv) != 3)
      return 1;
    for (unsigned l = 0; l != 14; ++l)
      for (unsigned kk = 0; kk != bwp_rb * NRE; ++kk)
        estimate.set_ch_estimate(cf_t(hr, hi), kk, l, p, 0);
    estimate.set_noise_variance(nv, p, 0);
  }
  for (unsigned p = 0; p != nports; ++p)
    for (unsigned s = 0; s != nsym; ++s)
      for (unsigned kk = 0; kk != nof_prb * NRE; ++kk) {
        float re, im;
        if (scanf("%a %a", &re, &im) != 2)
          return 1;
        grid.at(p, l0 + s, first_prb * NRE + kk) = cf_t(re, im);
      }

  pucch_demodulator_impl demod(
      std::make_unique<channel_equalizer_generic_impl>(channel_equalizer_algorithm_type::zf),
      std::make_unique<demodulation_mapper_impl>(),
      std::make_unique<pseudo_random_generator_impl>());

  pucch_demodulator::format2_configuration cfg;
  for (unsigned p = 0; p != nports; ++p)
    cfg.rx_ports.push_back(p);
  cfg.first_prb          = first_prb;
  cfg.nof_prb            = nof_prb;
  cfg.start_symbol_index = l0;
  cfg.nof_symbols        = nsym;
  cfg.rnti               = static_cast<uint16_t>(rnti);
  cfg.n_id               = n_id;

  unsigned                          e = 16 * nof_prb * nsym;
  std::vector<log_likelihood_ratio> llr(e);
  demod.demodulate(llr, grid, estimate, cfg);
  printf("LLR");
  for (auto v : llr)
    printf(" %d", v.to_int());

  short_block_detector_impl detector;
  std::vector<uint8_t>      out(k);
  bool                      valid = detector.detect(out, llr, modulation_scheme::QPSK);
  printf("\nBITS");
  for (auto b : out)
    printf(" %u", b);
  printf("\nVALID %d\n", valid ? 1 : 0);
  fflush(stdout);
  _Exit(0);
}
