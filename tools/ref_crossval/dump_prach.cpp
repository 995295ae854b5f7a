// Drives the reference's PRACH detector for cross-validation.
// Usage: dump_prach <long 0|1> <root> <zcz> <nports> <preamble> <delay> <snr_db> <seed>
// Synthesizes one occasion (preamble delayed + AWGN), runs
// prach_detector_generic_impl, prints the frequency-domain input (hexfloat)
// and the detection results.
#include "prach_detector_generic_impl.h"
#include "prach_generator_impl.h"
#include "dft_processor_generic_impl.h"
#include "srsran/phy/support/prach_buffer.h"
#include <cmath>
#include <complex>
#include <cstdio>
#include <cstdlib>
#include <memory>
#include <random>
#include <vector>

using namespace srsran;

namespace {
class simple_prach_buffer : public prach_buffer {
public:
  simple_prach_buffer(unsigned nports, unsigned l) : nports_(nports), l_(l), data_(nports * l) {}
  unsigned get_max_nof_ports() const override { return nports_; }
  unsigned get_max_nof_td_occasions() const override { return 1; }
  unsigned get_max_nof_fd_occasions() const override { return 1; }
  unsigned get_max_nof_symbols() const override { return 1; }
  unsigned get_sequence_length() const override { return l_; }
  span<cf_t> get_symbol(unsigned p, unsigned, unsigned, unsigned) override {
    return span<cf_t>(data_).subspan(p * l_, l_);
  }
  span<const cf_t> get_symbol(unsigned p, unsigned, unsigned, unsigned) const override {
    return span<const cf_t>(data_).subspan(p * l_, l_);
  }

private:
  unsigned nports_, l_;
  std::vector<cf_t> data_;
};
} // namespace

int main(int argc, char** argv) {
  bool is_long = atoi(argv[1]) != 0;
  unsigned root = atoi(argv[2]);
  unsigned zcz = atoi(argv[3]);
  unsigned nports = atoi(argv[4]);
  unsigned preamble = atoi(argv[5]);
  double delay = atof(argv[6]);
  double snr_db = atof(argv[7]);
  unsigned seed = atoi(argv[8]);

  unsigned L = is_long ? 839 : 139;
  prach_format_type fmt = is_long ? prach_format_type::zero : prach_format_type::B4;

  prach_generator_impl gen;
  prach_generator::configuration gcfg = {};
  gcfg.format = fmt;
  gcfg.root_sequence_index = root;
  gcfg.preamble_index = preamble;
  gcfg.restricted_set = restricted_set_config::UNRESTRICTED;
  gcfg.zero_correlation_zone = zcz;
  span<const cf_t> seq = gen.generate(gcfg);

  // Synthesize: delayed preamble + AWGN per port.
  std::mt19937 rng(seed);
  std::normal_distribution<float> gauss(0.0f, 1.0f);
  float namp = std::pow(10.0f, -snr_db / 20.0f) / std::sqrt(2.0f);
  simple_prach_buffer buf(nports, L);
  for (unsigned p = 0; p != nports; ++p) {
    span<cf_t> sym = buf.get_symbol(p, 0, 0, 0);
    for (unsigned n = 0; n != L; ++n) {
      float ang = -2.0f * float(M_PI) * delay * float(n) / float(L);
      cf_t rot(std::cos(ang), std::sin(ang));
      sym[n] = seq[n] * rot + cf_t(namp * gauss(rng), namp * gauss(rng));
    }
  }

  printf("IN");
  for (unsigned p = 0; p != nports; ++p) {
    span<const cf_t> sym = buf.get_symbol(p, 0, 0, 0);
    for (unsigned n = 0; n != L; ++n)
      printf(" %a %a", sym[n].real(), sym[n].imag());
  }
  printf("\n");

  dft_processor::configuration long_cfg = {1024, dft_processor::direction::INVERSE};
  dft_processor::configuration short_cfg = {256, dft_processor::direction::INVERSE};
  auto det = std::make_unique<prach_detector_generic_impl>(
      std::make_unique<dft_processor_generic_impl>(long_cfg),
      std::make_unique<dft_processor_generic_impl>(short_cfg),
      std::make_unique<prach_generator_impl>(), true);

  prach_detector::configuration dcfg = {};
  dcfg.root_sequence_index = root;
  dcfg.format = fmt;
  dcfg.restricted_set = restricted_set_config::UNRESTRICTED;
  dcfg.zero_correlation_zone = zcz;
  dcfg.start_preamble_index = 0;
  dcfg.nof_preamble_indices = 64;
  dcfg.ra_scs = is_long ? prach_subcarrier_spacing::kHz1_25 : prach_subcarrier_spacing::kHz15;
  dcfg.nof_rx_ports = nports;
  prach_detection_result res = det->detect(buf, dcfg);

  printf("RSSI %a\nTA_RES %a\n", res.rssi_dB, res.time_resolution.to_seconds() * 1e9);
  printf("DET");
  for (const auto& d : res.preambles) {
    printf(" %u %a %a", d.preamble_index,
           d.time_advance.to_seconds() * 1e9, d.detection_metric);
  }
  printf("\nNDET %zu\n", res.preambles.size());
  fflush(stdout);
  _Exit(0);
}
