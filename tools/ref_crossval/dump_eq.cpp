// Drives the reference's MMSE/ZF channel equalizer for cross-validation.
// Usage: dump_eq <mmse 1|0> <nre> <nports> <nlayers> <seed>
// Prints the cbf16-quantized inputs (hexfloat, as the equalizer sees them)
// and the equalized symbols + post-equalization noise variances.
#include "channel_equalizer_generic_impl.h"
#include "srsran/adt/tensor.h"
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

using namespace srsran;

int main(int argc, char** argv) {
  bool mmse = atoi(argv[1]) != 0;
  unsigned nre = atoi(argv[2]);
  unsigned nports = atoi(argv[3]);
  unsigned nlayers = atoi(argv[4]);
  unsigned seed = atoi(argv[5]);

  using re_dims = channel_equalizer::re_list::dims;
  using ch_dims = channel_equalizer::ch_est_list::dims;
  dynamic_tensor<std::underlying_type_t<re_dims>(re_dims::nof_dims), cbf16_t, re_dims> rx;
  dynamic_tensor<std::underlying_type_t<ch_dims>(ch_dims::nof_dims), cbf16_t, ch_dims> est;
  rx.resize({nre, nports});
  est.resize({nre, nports, nlayers});

  std::mt19937 rng(seed);
  std::normal_distribution<float> gauss(0.0f, 1.0f);
  std::uniform_real_distribution<float> unif(0.01f, 0.5f);
  std::vector<float> nvars(nports);
  for (auto& v : nvars) v = unif(rng);
  if (nlayers > 1) {
    // The reference's 2-layer ZF closed form assumes one noise variance for
    // all ports (equalize_zf_2xn.h) -- feed the convention it defines.
    std::fill(nvars.begin(), nvars.end(), nvars[0]);
  }
  for (unsigned p = 0; p != nports; ++p) {
    span<cbf16_t> col = rx.get_view<static_cast<unsigned>(re_dims::slice)>({p});
    for (unsigned i = 0; i != nre; ++i)
      col[i] = cf_t(gauss(rng), gauss(rng));
    for (unsigned l = 0; l != nlayers; ++l) {
      span<cbf16_t> ch = est.get_view<static_cast<unsigned>(ch_dims::rx_port)>({p, l});
      for (unsigned i = 0; i != nre; ++i)
        ch[i] = cf_t(gauss(rng), gauss(rng));
    }
  }

  // Print the bf16-quantized inputs (what the equalizer actually consumes).
  printf("RX");
  for (unsigned p = 0; p != nports; ++p) {
    span<const cbf16_t> col = rx.get_view<static_cast<unsigned>(re_dims::slice)>({p});
    for (unsigned i = 0; i != nre; ++i) {
      cf_t v = to_cf(col[i]);
      printf(" %a %a", v.real(), v.imag());
    }
  }
  printf("\nEST");
  for (unsigned p = 0; p != nports; ++p)
    for (unsigned l = 0; l != nlayers; ++l) {
      span<const cbf16_t> ch = est.get_view<static_cast<unsigned>(ch_dims::rx_port)>({p, l});
      for (unsigned i = 0; i != nre; ++i) {
        cf_t v = to_cf(ch[i]);
        printf(" %a %a", v.real(), v.imag());
      }
    }
  printf("\nNVAR");
  for (auto v : nvars) printf(" %a", v);

  channel_equalizer_generic_impl eq(
      mmse ? channel_equalizer_algorithm_type::mmse
           : channel_equalizer_algorithm_type::zf);
  std::vector<cf_t> out(nre * nlayers);
  std::vector<float> out_nv(nre * nlayers);
  eq.equalize(out, out_nv, rx, est, nvars, 1.0f);

  printf("\nEQ");
  for (auto& s : out) printf(" %a %a", s.real(), s.imag());
  printf("\nEQNV");
  for (auto v : out_nv) printf(" %a", v);
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
