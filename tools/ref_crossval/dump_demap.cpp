// Drives the reference's interval-table soft demapper for cross-validation.
// Usage: dump_demap <qm 2|4|6|8> <nsym> <seed>
// Prints symbols/noise vars as hexfloat and the int8 LLR output.
#include "demodulation_mapper_impl.h"
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
    case 2: mod = modulation_scheme::QPSK; break;
    case 4: mod = modulation_scheme::QAM16; break;
    case 6: mod = modulation_scheme::QAM64; break;
    default: mod = modulation_scheme::QAM256; break;
  }

  std::mt19937 rng(seed);
  std::normal_distribution<float> gauss(0.0f, 1.0f);
  std::uniform_real_distribution<float> unif(0.05f, 1.0f);
  std::vector<cf_t> syms(n);
  std::vector<float> nvar(n);
  for (unsigned i = 0; i < n; ++i) {
    syms[i] = {gauss(rng), gauss(rng)};
    nvar[i] = unif(rng);
  }

  std::vector<log_likelihood_ratio> llr(n * qm);
  demodulation_mapper_impl demap;
  demap.demodulate_soft(llr, syms, nvar, mod);

  printf("RE");
  for (unsigned i = 0; i < n; ++i) printf(" %a %a", syms[i].real(), syms[i].imag());
  printf("\nNVAR");
  for (unsigned i = 0; i < n; ++i) printf(" %a", nvar[i]);
  printf("\nLLR");
  for (unsigned i = 0; i < n * qm; ++i) printf(" %d", (int)llr[i].to_int());
  printf("\n");
  return 0;
}
