// Drives the reference's DM-RS sequence generation (the c_init formula of
// dmrs_pusch_estimator_impl/dmrs_pdsch_processor_impl + the CRB-indexed
// dmrs_helper generator) for cross-validation of ops/dmrs.py.
// Usage: dump_dmrs <n_id> <n_scid> <slot> <symbol> <nof_rb> <rb_start> <type 1|2>
#include "pseudo_random_generator_impl.h"
#include "srsran/phy/upper/sequence_generators/pseudo_random_generator.h"
#include "srsran/phy/constants.h"
#include "dmrs_helper.h"
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

using namespace srsran;

int main(int argc, char** argv)
{
  if (argc < 8) {
    fprintf(stderr, "usage: dump_dmrs n_id n_scid slot symbol nof_rb rb_start type\n");
    return 1;
  }
  unsigned n_id     = atoi(argv[1]);
  unsigned n_scid   = atoi(argv[2]);
  unsigned slot     = atoi(argv[3]);
  unsigned symbol   = atoi(argv[4]);
  unsigned nof_rb   = atoi(argv[5]);
  unsigned rb_start = atoi(argv[6]);
  unsigned type     = atoi(argv[7]);

  // TS 38.211 Section 6.4.1.1.1 / 7.4.1.1.1 sequence initialization (the
  // formula at dmrs_pusch_estimator_impl.cpp:126).
  const unsigned nsymb  = 14;
  unsigned       c_init = static_cast<unsigned>(
      ((static_cast<uint64_t>(nsymb * slot + symbol + 1) * (2 * n_id + 1)) << 17U) % (1UL << 31U));
  c_init = static_cast<unsigned>(
      ((static_cast<uint64_t>(nsymb * slot + symbol + 1) * (2 * n_id + 1) * (1UL << 17U)) + (2 * n_id + n_scid)) %
      (1UL << 31U));

  unsigned nof_dmrs_per_rb = (type == 1) ? 6 : 4;

  bounded_bitset<MAX_RB> rb_mask(rb_start + nof_rb);
  for (unsigned rb = rb_start; rb != rb_start + nof_rb; ++rb)
    rb_mask.set(rb);

  pseudo_random_generator_impl prg;
  prg.init(c_init);

  std::vector<cf_t> seq(nof_dmrs_per_rb * nof_rb);
  dmrs_sequence_generate(seq, prg, float(M_SQRT1_2), 0, nof_dmrs_per_rb, rb_mask);

  printf("SEQ");
  for (auto v : seq)
    printf(" %a %a", v.real(), v.imag());
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
