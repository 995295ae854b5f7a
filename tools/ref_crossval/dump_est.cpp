// Drives the reference's port_channel_estimator_average_impl for
// cross-validation of ops/channel_estimate.py (CE, noise, TA, CFO, RSRP,
// EPRE, SNR).  Synthesizes a two-tap channel + CFO + AWGN on DM-RS type-1
// pilots (comb offset 0, one layer, one hop, one port), prints the exact
// inputs (hexfloat) and the estimator outputs.
// Usage: dump_est <nof_rb> <rb_start> <noise_milli> <cfo_hz> <seed> <ndmrs> <sym0> [sym1 ...]
#include "port_channel_estimator_average_impl.h"
#include "interpolator/interpolator_linear_impl.h"
#include "time_alignment_estimator/time_alignment_estimator_dft_impl.h"
#include "dft_processor_generic_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <random>
#include <vector>

using namespace srsran;

namespace {
// Minimal dense resource grid: one port, 14 symbols, nsubc subcarriers.
class dense_grid : public resource_grid_reader
{
public:
  dense_grid(unsigned nsubc_, unsigned nsym_)
    : nsubc(nsubc_), nsym(nsym_), data(nsubc_ * nsym_), data_cbf16(nsubc_ * nsym_) {}

  void set(unsigned l, unsigned k, cf_t v)
  {
    data[l * nsubc + k]       = v;
    data_cbf16[l * nsubc + k] = to_cbf16(v);
  }
  unsigned get_nof_subc() const override { return nsubc; }
  unsigned get_nof_symbols() const override { return nsym; }
  unsigned get_nof_ports() const override { return 1; }
  bool     is_empty(unsigned /**/) const override { return false; }
  bool     is_empty() const override { return false; }

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

private:
  unsigned             nsubc;
  unsigned             nsym;
  std::vector<cf_t>    data;
  std::vector<cbf16_t> data_cbf16;
};
} // namespace

int main(int argc, char** argv)
{
  if (argc < 8) {
    fprintf(stderr, "usage: dump_est nof_rb rb_start noise_milli cfo_hz seed ndmrs sym...\n");
    return 1;
  }
  unsigned nof_rb      = atoi(argv[1]);
  unsigned rb_start    = atoi(argv[2]);
  float    noise_amp   = atoi(argv[3]) * 1e-3F;
  float    cfo_hz      = atof(argv[4]);
  unsigned seed        = atoi(argv[5]);
  unsigned ndmrs       = atoi(argv[6]);
  std::vector<unsigned> dmrs_syms;
  for (unsigned i = 0; i != ndmrs; ++i)
    dmrs_syms.push_back(atoi(argv[7 + i]));

  const subcarrier_spacing scs  = subcarrier_spacing::kHz30;
  const cyclic_prefix      cp   = cyclic_prefix::NORMAL;
  const unsigned           nsym = 14;
  unsigned                 bwp_rb = rb_start + nof_rb;
  unsigned                 npil   = nof_rb * 6; // type-1 comb, stride 2
  double                   scs_hz = 30e3;

  // Symbol start epochs in SECONDS (the reference computes them normalized
  // to the OFDM symbol duration; print both conventions' common source).
  std::vector<double> epoch_s(nsym);
  double acc = 0.0;
  for (unsigned l = 0; l != nsym; ++l) {
    epoch_s[l] = acc + cp.get_length(l, scs).to_seconds();
    acc        = epoch_s[l] + 1.0 / scs_hz;
  }

  std::mt19937                          rng(seed);
  std::normal_distribution<float>       gauss(0.0F, 1.0F);
  std::uniform_int_distribution<int>    qpsk(0, 3);

  // Two-tap channel frequency response over the hop's pilots.
  float  tau_s   = 0.12e-6F; // ~120 ns echo
  cf_t   a0(1.0F, 0.3F), a1(0.25F, -0.15F);
  auto h_at = [&](unsigned k_abs) {
    float ph = -2.0F * float(M_PI) * float(k_abs) * float(scs_hz) * tau_s;
    return a0 + a1 * std::polar(1.0F, ph);
  };

  // Pilots: unit-magnitude QPSK, per (dmrs symbol, pilot).
  dmrs_symbol_list pilots;
  pilots.resize({npil, ndmrs, 1});
  dense_grid grid(bwp_rb * NRE, nsym);
  printf("PILOTS");
  for (unsigned m = 0; m != ndmrs; ++m) {
    span<cf_t> row = pilots.get_symbol(m, 0);
    for (unsigned i = 0; i != npil; ++i) {
      int   q  = qpsk(rng);
      float re = (q & 1) ? -float(M_SQRT1_2) : float(M_SQRT1_2);
      float im = (q & 2) ? -float(M_SQRT1_2) : float(M_SQRT1_2);
      row[i]   = cf_t(re, im);
      printf(" %a %a", re, im);
    }
  }
  printf("\nRX");
  for (unsigned m = 0; m != ndmrs; ++m) {
    unsigned l   = dmrs_syms[m];
    cf_t     rot = std::polar(1.0F, 2.0F * float(M_PI) * cfo_hz * float(epoch_s[l]));
    span<const cf_t> row = pilots.get_symbol(m, 0);
    for (unsigned i = 0; i != npil; ++i) {
      unsigned k_abs = rb_start * NRE + 2 * i;
      cf_t     v     = h_at(k_abs) * row[i] * rot + noise_amp * cf_t(gauss(rng), gauss(rng));
      grid.set(l, k_abs, v);
      printf(" %a %a", v.real(), v.imag());
    }
  }
  printf("\nEPOCHS");
  for (unsigned m = 0; m != ndmrs; ++m)
    printf(" %.9e", epoch_s[dmrs_syms[m]]);

  // Configure and run the reference estimator.
  port_channel_estimator::configuration cfg;
  cfg.scs          = scs;
  cfg.cp           = cp;
  cfg.first_symbol = 0;
  cfg.nof_symbols  = nsym;
  cfg.rx_ports     = {0};
  cfg.scaling      = 1.0F;
  port_channel_estimator::layer_dmrs_pattern pattern;
  pattern.symbols.resize(nsym);
  for (unsigned l : dmrs_syms)
    pattern.symbols.set(l);
  pattern.rb_mask.resize(bwp_rb);
  for (unsigned rb = rb_start; rb != rb_start + nof_rb; ++rb)
    pattern.rb_mask.set(rb);
  pattern.re_pattern.resize(NRE);
  for (unsigned k = 0; k != NRE; k += 2)
    pattern.re_pattern.set(k);
  cfg.dmrs_pattern.push_back(pattern);

  auto est_impl = std::make_unique<port_channel_estimator_average_impl>(
      std::make_unique<interpolator_linear_impl>(),
      std::make_unique<time_alignment_estimator_dft_impl>(
          std::make_unique<dft_processor_generic_impl>(dft_processor::configuration{
              port_channel_estimator_average_impl::DFT_SIZE, dft_processor::direction::INVERSE})),
      port_channel_estimator_fd_smoothing_strategy::filter,
      /*compensate_cfo=*/true);

  channel_estimate estimate({bwp_rb, nsym, 1, 1});
  est_impl->compute(estimate, grid, 0, pilots, cfg);

  // CE on the allocated RBs at a DM-RS symbol and at symbol 0.
  for (unsigned which : {0U, dmrs_syms[0]}) {
    printf("\nCE%u", which);
    span<const cbf16_t> ce = estimate.get_symbol_ch_estimate(which, 0, 0);
    for (unsigned rb = rb_start; rb != rb_start + nof_rb; ++rb)
      for (unsigned k = 0; k != NRE; ++k) {
        cf_t v = to_cf(ce[rb * NRE + k]);
        printf(" %a %a", v.real(), v.imag());
      }
  }
  std::optional<float> cfo = estimate.get_cfo_Hz(0, 0);
  printf("\nSTATS %a %a %a %a %a %a\n",
         estimate.get_noise_variance(0, 0),
         estimate.get_rsrp(0, 0),
         estimate.get_epre(0, 0),
         estimate.get_snr(0, 0),
         static_cast<float>(estimate.get_time_alignment(0, 0).to_seconds()),
         cfo.has_value() ? cfo.value() : 0.0F);
  fflush(stdout);
  _Exit(0);
}
