// Drives the reference's short-block encoder + ML detector for
// cross-validation of ops/short_block.py (TS 38.212 Section 5.3.3).
// Usage: dump_short <K> <E> <bits_per_symbol 1|2|4> <seed>
#include "short_block_detector_impl.h"
#include "short_block_encoder_impl.h"
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace srsran;

int main(int argc, char** argv)
{
  if (argc < 5) {
    fprintf(stderr, "usage: dump_short K E bps seed\n");
    return 1;
  }
  unsigned k    = atoi(argv[1]);
  unsigned e    = atoi(argv[2]);
  unsigned bps  = atoi(argv[3]);
  unsigned seed = atoi(argv[4]);

  modulation_scheme mod = modulation_scheme::BPSK;
  if (bps == 2)
    mod = modulation_scheme::QPSK;
  else if (bps == 4)
    mod = modulation_scheme::QAM16;

  std::mt19937                       rng(seed);
  std::uniform_int_distribution<int> bit(0, 1);
  std::uniform_int_distribution<int> noise(-9, 9);

  std::vector<uint8_t> msg(k);
  for (auto& b : msg)
    b = static_cast<uint8_t>(bit(rng));
  printf("MSG");
  for (auto b : msg)
    printf(" %u", b);

  short_block_encoder_impl encoder;
  std::vector<uint8_t>     cw(e);
  encoder.encode(cw, msg, mod);
  printf("\nENC");
  for (auto b : cw)
    printf(" %u", b);

  // The reference encoder leaves the TS 38.212 placeholders as sentinels in
  // its output (255 = 'x', 254 = 'y' repeat-previous); the scrambler
  // resolves them downstream.  Resolve them here (x -> 1, y -> previous) so
  // the channel LLRs carry the actually-transmitted values.
  std::vector<uint8_t> resolved(e);
  uint8_t              prev = 0;
  for (unsigned i = 0; i != e; ++i) {
    uint8_t b = cw[i];
    if (b == 255)
      b = 1;
    else if (b == 254)
      b = prev;
    resolved[i] = b;
    prev        = b;
  }

  // Noisy LLRs from the resolved bits (amplitude 6, int noise): positive =
  // bit 0, like the log_likelihood_ratio convention.
  std::vector<log_likelihood_ratio> llr(e);
  printf("\nLLR");
  for (unsigned i = 0; i != e; ++i) {
    int v  = (resolved[i] ? -6 : 6) + noise(rng);
    llr[i] = log_likelihood_ratio(v);
    printf(" %d", v);
  }

  short_block_detector_impl detector;
  std::vector<uint8_t>      out(k);
  bool                      valid = detector.detect(out, llr, mod);
  printf("\nDET");
  for (auto b : out)
    printf(" %u", b);
  printf("\nVALID %d\n", valid ? 1 : 0);
  fflush(stdout);
  _Exit(0);
}
