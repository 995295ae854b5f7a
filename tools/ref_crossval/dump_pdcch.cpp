// Drives the reference's PDCCH encoder (CRC24C + RNTI mask + polar encode +
// rate match) for cross-validation of phy/pdcch.py pdcch_encode.
// Usage: dump_pdcch <nof_dci_bits> <E> <rnti> <seed>
#include "pdcch_encoder_impl.h"
#include "crc_calculator_lut_impl.h"
#include "polar_allocator_impl.h"
#include "polar_code_impl.h"
#include "polar_encoder_impl.h"
#include "polar_interleaver_impl.h"
#include "polar_rate_matcher_impl.h"
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace srsran;

int main(int argc, char** argv)
{
  if (argc < 5) {
    fprintf(stderr, "usage: dump_pdcch nof_dci_bits E rnti seed\n");
    return 1;
  }
  unsigned k    = atoi(argv[1]);
  unsigned e    = atoi(argv[2]);
  unsigned rnti = atoi(argv[3]);
  unsigned seed = atoi(argv[4]);

  std::mt19937                       rng(seed);
  std::uniform_int_distribution<int> bit(0, 1);
  std::vector<uint8_t>               dci(k);
  printf("DCI");
  for (auto& b : dci) {
    b = static_cast<uint8_t>(bit(rng));
    printf(" %u", b);
  }

  pdcch_encoder_impl encoder(
      std::make_unique<crc_calculator_lut_impl>(crc_generator_poly::CRC24C),
      std::make_unique<polar_interleaver_impl>(),
      std::make_unique<polar_allocator_impl>(),
      std::make_unique<polar_code_impl>(),
      std::make_unique<polar_encoder_impl>(),
      std::make_unique<polar_rate_matcher_impl>());

  pdcch_encoder::config_t cfg;
  cfg.E    = e;
  cfg.rnti = rnti;
  std::vector<uint8_t> enc(e);
  encoder.encode(enc, dci, cfg);
  printf("\nENC");
  for (auto b : enc)
    printf(" %u", b);
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
