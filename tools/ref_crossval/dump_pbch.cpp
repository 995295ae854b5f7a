// Drives the reference's PBCH encoder (payload interleave, first scramble,
// CRC24C, polar encode + rate match) for cross-validation of phy/pbch.py
// pbch_encode.
// Usage: dump_pbch <n_id> <sfn> <ssb_idx> <l_max> <hrf> <k_ssb> <seed>
#include "pbch_encoder_impl.h"
#include "crc_calculator_lut_impl.h"
#include "polar_allocator_impl.h"
#include "polar_code_impl.h"
#include "polar_encoder_impl.h"
#include "polar_interleaver_impl.h"
#include "polar_rate_matcher_impl.h"
#include "pseudo_random_generator_impl.h"
#include <cstdio>
#include <cstdlib>
#include <random>

using namespace srsran;

int main(int argc, char** argv)
{
  if (argc < 8) {
    fprintf(stderr, "usage: dump_pbch n_id sfn ssb_idx l_max hrf k_ssb seed\n");
    return 1;
  }
  pbch_encoder::pbch_msg_t msg;
  msg.N_id    = atoi(argv[1]);
  msg.sfn     = atoi(argv[2]);
  msg.ssb_idx = atoi(argv[3]);
  msg.L_max   = atoi(argv[4]);
  msg.hrf     = atoi(argv[5]) != 0;
  msg.k_ssb   = atoi(argv[6]);
  unsigned seed = atoi(argv[7]);

  std::mt19937                       rng(seed);
  std::uniform_int_distribution<int> bit(0, 1);
  printf("MIB");
  for (unsigned i = 0; i != 24; ++i) {
    msg.payload[i] = static_cast<uint8_t>(bit(rng));
    printf(" %u", msg.payload[i]);
  }

  pbch_encoder_impl encoder(
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
      std::make_unique<pseudo_random_generator_impl>(),
      std::make_unique<polar_interleaver_impl>(),
      std::make_unique<polar_allocator_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_encoder_impl>(),
      std::make_unique<polar_rate_matcher_impl>());

  std::array<uint8_t, pbch_encoder::E> encoded;
  encoder.encode(encoded, msg);
  printf("\nENC");
  for (auto b : encoded)
    printf(" %u", b);
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
