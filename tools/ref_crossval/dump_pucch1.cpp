// Drives the reference's PUCCH format-1 detector (ZF equalize over all rx
// ports -> OCC/base-sequence marginalization) for cross-validation of
// phy/pucch.py detect_pucch_format1 detected bits and valid decision.
// Reads the scenario from stdin (text):
//   n_id slot l0 nsym m0 occ nharq nports
//   per port: h_re h_im nvar
//   per (port, symbol): 12 x (re im)   [hexfloat]
// The channel estimate handed to the detector is the true single-tap h.
#include "pucch_detector_impl.h"
#include "low_papr_sequence_collection_impl.h"
#include "low_papr_sequence_generator_impl.h"
#include "pseudo_random_generator_impl.h"
#include "channel_equalizer_generic_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include "srsran/phy/upper/channel_estimation.h"
#include <array>
#include <cmath>
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
  unsigned n_id, slot, l0, nsym, m0, occ, nharq, nports;
  if (scanf("%u %u %u %u %u %u %u %u", &n_id, &slot, &l0, &nsym, &m0, &occ, &nharq, &nports) != 8)
    return 1;

  const unsigned prb    = 2;
  const unsigned bwp_rb = 12;
  dense_grid     grid(bwp_rb * NRE, 14, nports);
  channel_estimate estimate({bwp_rb, 14, nports, 1});

  for (unsigned p = 0; p != nports; ++p) {
    float hr, hi, nv;
    if (scanf("%a %a %a", &hr, &hi, &nv) != 3)
      return 1;
    for (unsigned l = 0; l != 14; ++l)
      for (unsigned k = 0; k != bwp_rb * NRE; ++k)
        estimate.set_ch_estimate(cf_t(hr, hi), k, l, p, 0);
    estimate.set_noise_variance(nv, p, 0);
  }
  for (unsigned p = 0; p != nports; ++p)
    for (unsigned s = 0; s != nsym; ++s)
      for (unsigned k = 0; k != NRE; ++k) {
        float re, im;
        if (scanf("%a %a", &re, &im) != 2)
          return 1;
        grid.at(p, l0 + s, prb * NRE + k) = cf_t(re, im);
      }

  std::array<float, NRE> alphas;
  std::generate(alphas.begin(), alphas.end(),
                [n = 0U]() mutable { return 2.0F * float(M_PI) * static_cast<float>(n++) / float(NRE); });
  low_papr_sequence_generator_impl lpg;

  pucch_detector_impl detector(
      std::make_unique<low_papr_sequence_collection_impl>(lpg, 1, 0, alphas),
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<channel_equalizer_generic_impl>(channel_equalizer_algorithm_type::zf),
      nullptr);

  pucch_detector::format1_configuration cfg;
  cfg.slot                 = slot_point(1, slot);
  cfg.cp                   = cyclic_prefix::NORMAL;
  cfg.starting_prb         = prb;
  cfg.second_hop_prb       = std::nullopt;
  cfg.start_symbol_index   = l0;
  cfg.nof_symbols          = nsym;
  cfg.group_hopping        = pucch_group_hopping::NEITHER;
  for (unsigned p = 0; p != nports; ++p)
    cfg.ports.push_back(p);
  cfg.beta_pucch           = 1.0F;
  cfg.time_domain_occ      = occ;
  cfg.initial_cyclic_shift = m0;
  cfg.n_id                 = n_id;
  cfg.nof_harq_ack         = nharq;

  auto result = detector.detect(grid, estimate, cfg);
  printf("BITS");
  for (unsigned i = 0; i != result.uci_message.get_harq_ack_bits().size(); ++i)
    printf(" %u", result.uci_message.get_harq_ack_bits()[i]);
  printf("\nSTATUS %d\nMETRIC %a\n",
         result.uci_message.get_status() == uci_status::valid ? 1 : 0,
         result.detection_metric);
  fflush(stdout);
  _Exit(0);
}
