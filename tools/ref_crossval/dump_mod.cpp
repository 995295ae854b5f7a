// Drives the reference's LUT modulation mapper for cross-validation.
// Usage: dump_mod <qm 1|2|4|6|8> <nbits> <seed>
#include "modulation_mapper_lut_impl.h"
#include "srsran/adt/bit_buffer.h"
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace srsran;

int main(int argc, char** argv) {
  int qm = atoi(argv[1]);
  unsigned n = atoi(argv[2]);
  unsigned seed = atoi(argv[3]);

  modulation_scheme mod;
  switch (qm) {
    case 1: mod = modulation_scheme::BPSK; break;
    case 2: mod = modulation_scheme::QPSK; break;
    case 4: mod = modulation_scheme::QAM16; break;
    case 6: mod = modulation_scheme::QAM64; break;
    default: mod = modulation_scheme::QAM256; break;
  }

  std::mt19937 rng(seed);
  dynamic_bit_buffer bits(n);
  std::vector<unsigned> raw(n);
  for (unsigned i = 0; i < n; ++i) {
    raw[i] = rng() & 1;
    bits.insert(raw[i], i, 1);
  }

  std::vector<cf_t> syms(n / qm);
  modulation_mapper_lut_impl mapper;
  mapper.modulate(syms, bits, mod);

  printf("BITS");
  for (unsigned i = 0; i < n; ++i) printf(" %u", raw[i]);
  printf("\nSYM");
  for (auto& s : syms) printf(" %a %a", s.real(), s.imag());
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
