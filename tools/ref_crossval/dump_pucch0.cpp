// Drives the reference's PUCCH format-0 detector for cross-validation of
// phy/pucch.py detect_pucch_format0 (incl. multi-port combining).
// Usage: dump_pucch0 <n_id> <slot> <start_symbol> <nof_symbols> <m0> <nof_harq> <nports> <mcs> <snr_milli> <seed>
//   mcs < 0 -> noise-only grid (no transmitted PUCCH).
#include "pucch_detector_format0.h"
#include "low_papr_sequence_collection_impl.h"
#include "low_papr_sequence_generator_impl.h"
#include "pseudo_random_generator_impl.h"
#include "srsran/phy/support/resource_grid_reader.h"
#include <array>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <random>
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

int main(int argc, char** argv)
{
  if (argc < 11) {
    fprintf(stderr, "usage: dump_pucch0 n_id slot l0 nsym m0 nharq nports mcs snr_milli seed\n");
    return 1;
  }
  unsigned n_id   = atoi(argv[1]);
  unsigned slot   = atoi(argv[2]);
  unsigned l0     = atoi(argv[3]);
  unsigned nsym   = atoi(argv[4]);
  unsigned m0     = atoi(argv[5]);
  unsigned nharq  = atoi(argv[6]);
  unsigned nports = atoi(argv[7]);
  int      mcs    = atoi(argv[8]);
  float    amp    = atoi(argv[9]) * 1e-3F;
  unsigned seed   = atoi(argv[10]);

  std::array<float, NRE> alphas;
  std::generate(alphas.begin(), alphas.end(),
                [n = 0U]() mutable { return 2.0F * float(M_PI) * static_cast<float>(n++) / float(NRE); });
  low_papr_sequence_generator_impl  lpg;
  auto                              collection = std::make_unique<low_papr_sequence_collection_impl>(lpg, 1, 0, alphas);
  low_papr_sequence_collection*     coll_ptr   = collection.get();
  pucch_detector_format0            detector(std::make_unique<pseudo_random_generator_impl>(), std::move(collection));

  // A helper of our own for the Tx side (group NEITHER: u = n_id % 30).
  pucch_helper helper(std::make_unique<pseudo_random_generator_impl>());

  const unsigned prb = 2;
  dense_grid     grid(12 * NRE, 14, nports);

  std::mt19937                    rng(seed);
  std::normal_distribution<float> gauss(0.0F, float(M_SQRT1_2));

  unsigned u = n_id % 30;
  printf("RX");
  for (unsigned p = 0; p != nports; ++p) {
    cf_t h(gauss(rng) * float(M_SQRT2), gauss(rng) * float(M_SQRT2));
    for (unsigned s = 0; s != nsym; ++s) {
      unsigned l = l0 + s;
      span<const cf_t> seq;
      if (mcs >= 0) {
        unsigned alpha_idx = helper.get_alpha_index(
            slot_point(1, slot), cyclic_prefix::NORMAL, n_id, l, m0, static_cast<unsigned>(mcs));
        seq = coll_ptr->get(u, 0, alpha_idx);
      }
      for (unsigned k = 0; k != NRE; ++k) {
        cf_t v(gauss(rng), gauss(rng));
        if (mcs >= 0)
          v += amp * h * seq[k];
        grid.at(p, l, prb * NRE + k) = v;
        printf(" %a %a", v.real(), v.imag());
      }
    }
  }

  pucch_detector::format0_configuration cfg;
  cfg.slot                 = slot_point(1, slot);
  cfg.cp                   = cyclic_prefix::NORMAL;
  cfg.starting_prb         = prb;
  cfg.second_hop_prb       = std::nullopt;
  cfg.start_symbol_index   = l0;
  cfg.nof_symbols          = nsym;
  cfg.initial_cyclic_shift = m0;
  cfg.n_id                 = n_id;
  cfg.nof_harq_ack         = nharq;
  cfg.sr_opportunity       = false;
  for (unsigned p = 0; p != nports; ++p)
    cfg.ports.push_back(p);

  auto result = detector.detect(grid, cfg);
  printf("\nBITS");
  for (unsigned i = 0; i != result.first.get_harq_ack_bits().size(); ++i)
    printf(" %u", result.first.get_harq_ack_bits()[i]);
  printf("\nSTATUS %d\n", result.first.get_status() == uci_status::valid ? 1 : 0);
  fflush(stdout);
  _Exit(0);
}
