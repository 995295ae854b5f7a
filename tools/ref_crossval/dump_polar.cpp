// Drives the reference's full polar chain for cross-validation:
// construction -> allocate -> encode -> interleave(tx) -> rate match, then
// LLRs -> rate dematch -> SSC decode -> deallocate.
// Usage: dump_polar <K> <E> <nMax> <ibil 0|1> <seed> <flip_pct>
#include "polar_allocator_impl.h"
#include "polar_code_impl.h"
#include "polar_deallocator_impl.h"
#include "polar_decoder_impl.h"
#include "polar_encoder_impl.h"
#include "polar_interleaver_impl.h"
#include "polar_rate_dematcher_impl.h"
#include "polar_rate_matcher_impl.h"
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <random>
#include <vector>

using namespace srsran;

int main(int argc, char** argv) {
  unsigned K = atoi(argv[1]);
  unsigned E = atoi(argv[2]);
  unsigned nMax = atoi(argv[3]);
  bool ibil_on = atoi(argv[4]) != 0;
  unsigned seed = atoi(argv[5]);
  int flip_pct = argc > 6 ? atoi(argv[6]) : 0;

  polar_code_impl code;
  code.set(K, E, nMax, ibil_on ? polar_code_ibil::present : polar_code_ibil::not_present);
  unsigned N = code.get_N();
  unsigned n = code.get_n();

  std::mt19937 rng(seed);
  std::vector<uint8_t> msg(K), msg_i(K), alloc(N), enc(N), rm(E);
  for (auto& b : msg) b = rng() & 1;

  polar_interleaver_impl itl;
  itl.interleave(msg_i, msg, polar_interleaver_direction::tx);
  polar_allocator_impl alc;
  alc.allocate(alloc, msg_i, code);
  polar_encoder_impl enc_impl;
  enc_impl.encode(enc, alloc, n);
  polar_rate_matcher_impl rmatch;
  rmatch.rate_match(rm, enc, code);

  printf("MSG");
  for (unsigned i = 0; i < K; ++i) printf(" %u", msg[i]);
  printf("\nALLOC");
  for (unsigned i = 0; i < N; ++i) printf(" %u", alloc[i]);
  printf("\nENC");
  for (unsigned i = 0; i < N; ++i) printf(" %u", enc[i]);
  printf("\nRM");
  for (unsigned i = 0; i < E; ++i) printf(" %u", rm[i]);

  // LLRs: +-8 with optional sign flips at half magnitude.
  std::vector<log_likelihood_ratio> llr(E);
  std::uniform_int_distribution<int> pct(0, 99);
  std::vector<int> llr_vals(E);
  for (unsigned i = 0; i < E; ++i) {
    int v = rm[i] ? -8 : 8;
    if (flip_pct && pct(rng) < flip_pct) v = -v / 2;
    llr_vals[i] = v;
    llr[i] = v;
  }
  printf("\nLLR");
  for (unsigned i = 0; i < E; ++i) printf(" %d", llr_vals[i]);

  std::vector<log_likelihood_ratio> llr_n(N);
  polar_rate_dematcher_impl rdm;
  rdm.rate_dematch(llr_n, llr, code);
  printf("\nDEMATCH");
  for (unsigned i = 0; i < N; ++i) printf(" %d", (int)llr_n[i].to_int());

  polar_decoder_impl dec(std::make_unique<polar_encoder_impl>(), nMax);
  std::vector<uint8_t> decoded(N), msg_out(K);
  dec.decode(decoded, llr_n, code);
  polar_deallocator_impl dealc;
  dealc.deallocate(msg_out, decoded, code);
  std::vector<uint8_t> msg_final(K);
  itl.interleave(msg_final, msg_out, polar_interleaver_direction::rx);
  printf("\nDEC");
  for (unsigned i = 0; i < K; ++i) printf(" %u", msg_final[i]);
  printf("\n");
  // polar_decoder_impl aborts in its destructor under this standalone
  // build (free(): invalid pointer at teardown); all output is already
  // emitted, so skip static destruction.
  fflush(stdout);
  _Exit(0);
}
