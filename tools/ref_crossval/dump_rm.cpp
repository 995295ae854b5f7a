// Drives the reference's LDPC rate matcher + dematcher for cross-validation.
// Usage: dump_rm <bg> <z> <rv> <qm> <E> <filler> <seed>
#include "ldpc_rate_matcher_impl.h"
#include "ldpc_rate_dematcher_impl.h"
#include "srsran/adt/bit_buffer.h"
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace srsran;
using namespace srsran::ldpc;

int main(int argc, char** argv) {
  int bg = atoi(argv[1]);
  int z = atoi(argv[2]);
  int rv = atoi(argv[3]);
  int qm = atoi(argv[4]);
  int E = atoi(argv[5]);
  int filler = atoi(argv[6]);
  unsigned seed = argc > 7 ? atoi(argv[7]) : 0;

  unsigned kb = bg == 1 ? 22 : 10;
  unsigned nfull = bg == 1 ? 68 : 52;
  unsigned K = kb * z, N = (nfull - 2) * z;

  std::mt19937 rng(seed);
  std::vector<uint8_t> cw(N);
  for (auto& b : cw) b = rng() & 1;
  // Mark filler bits (positions K - 2Z - filler .. K - 2Z) as FILLER_BIT.
  dynamic_bit_buffer in(N);
  for (unsigned i = 0; i < N; ++i) in.insert(cw[i], i, 1);

  codeblock_metadata cfg = {};
  cfg.tb_common.base_graph = static_cast<ldpc_base_graph_type>(bg);
  cfg.tb_common.lifting_size = static_cast<ldpc::lifting_size_t>(z);
  cfg.tb_common.rv = rv;
  cfg.tb_common.mod = static_cast<modulation_scheme>(qm);
  cfg.tb_common.Nref = 0;
  cfg.cb_specific.full_length = N;
  cfg.cb_specific.rm_length = E;
  cfg.cb_specific.nof_filler_bits = filler;

  ldpc_rate_matcher_impl rm;
  dynamic_bit_buffer out(E);
  rm.rate_match(out, in, cfg);
  printf("CW");
  for (unsigned i = 0; i < N; ++i) printf(" %u", cw[i]);
  printf("\nRM");
  for (int i = 0; i < E; ++i) printf(" %u", (unsigned)out.extract(i, 1));
  printf("\n");

  // Dematch random LLRs into the soft buffer.
  std::vector<log_likelihood_ratio> llrs(E);
  for (int i = 0; i < E; ++i) llrs[i] = (int)(rng() % 41) - 20;
  printf("LLR");
  for (int i = 0; i < E; ++i) printf(" %d", llrs[i].to_int());
  printf("\n");
  ldpc_rate_dematcher_impl rdm;
  std::vector<log_likelihood_ratio> soft(N, 0);
  rdm.rate_dematch(soft, llrs, true, cfg);
  printf("DM");
  for (unsigned i = 0; i < N; ++i) printf(" %d", soft[i].to_int());
  printf("\n");
  return 0;
}
