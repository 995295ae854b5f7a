// Drives the reference's pseudo-random (Gold) generator and low-PAPR
// sequence generator for cross-validation of ops/prg.py and ops/low_papr.py.
// Usage: dump_seq prg <c_init> <advance> <n>
//        dump_seq papr <u> <v> <alpha_num> <alpha_den> <len>
#include "low_papr_sequence_generator_impl.h"
#include "pseudo_random_generator_impl.h"
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

using namespace srsran;

int main(int argc, char** argv)
{
  if (argc >= 5 && strcmp(argv[1], "prg") == 0) {
    unsigned c_init  = strtoul(argv[2], nullptr, 0);
    unsigned advance = atoi(argv[3]);
    unsigned n       = atoi(argv[4]);

    pseudo_random_generator_impl prg;
    prg.init(c_init);
    if (advance != 0)
      prg.advance(advance);
    std::vector<uint8_t> zero(n, 0), out(n);
    prg.apply_xor(out, zero);
    printf("BITS");
    for (auto b : out)
      printf(" %u", b);
    printf("\n");
    fflush(stdout);
    _Exit(0);
  }
  if (argc >= 7 && strcmp(argv[1], "papr") == 0) {
    unsigned u         = atoi(argv[2]);
    unsigned v         = atoi(argv[3]);
    unsigned alpha_num = atoi(argv[4]);
    unsigned alpha_den = atoi(argv[5]);
    unsigned len       = atoi(argv[6]);

    low_papr_sequence_generator_impl gen;
    std::vector<cf_t>                seq(len);
    gen.generate(seq, u, v, alpha_num, alpha_den);
    printf("SEQ");
    for (auto s : seq)
      printf(" %a %a", s.real(), s.imag());
    printf("\n");
    fflush(stdout);
    _Exit(0);
  }
  fprintf(stderr, "usage: dump_seq prg c_init advance n | papr u v an ad len\n");
  return 1;
}
