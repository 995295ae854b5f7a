// Drives the reference's PSS and SSS processors for cross-validation of
// phy/pbch.py pss_sequence/sss_sequence (m-sequences, TS 38.211 7.4.2).
// Usage: dump_ssb <phys_cell_id>
#include "pss_processor_impl.h"
#include "sss_processor_impl.h"
#include "srsran/phy/support/resource_grid_writer.h"
#include <cstdio>
#include <cstdlib>
#include <vector>

using namespace srsran;

namespace {
class dense_writer : public resource_grid_writer
{
public:
  dense_writer(unsigned nsubc_, unsigned nsym_) : nsubc(nsubc_), data(nsubc_ * nsym_) {}

  cf_t     at(unsigned l, unsigned k) const { return data[l * nsubc + k]; }
  unsigned get_nof_subc() const override { return nsubc; }
  unsigned get_nof_symbols() const override { return 14; }
  unsigned get_nof_ports() const override { return 1; }

  span<const cf_t> put(unsigned, unsigned l, unsigned k_init,
                       const bounded_bitset<MAX_RB * NRE>& mask, span<const cf_t> symbols) override
  {
    unsigned count = 0;
    mask.for_each(0, mask.size(), [&](unsigned k) { data[l * nsubc + k_init + k] = symbols[count++]; });
    return symbols.subspan(count, symbols.size() - count);
  }
  void put(unsigned, unsigned l, unsigned k_init, span<const cf_t> symbols) override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      data[l * nsubc + k_init + i] = symbols[i];
  }
  void put(unsigned, unsigned l, unsigned k_init, unsigned stride, span<const cf_t> symbols) override
  {
    for (unsigned i = 0; i != symbols.size(); ++i)
      data[l * nsubc + k_init + i * stride] = symbols[i];
  }

private:
  unsigned          nsubc;
  std::vector<cf_t> data;
};
} // namespace

int main(int argc, char** argv)
{
  if (argc < 2) {
    fprintf(stderr, "usage: dump_ssb phys_cell_id\n");
    return 1;
  }
  unsigned pci = atoi(argv[1]);

  dense_writer grid(240, 14);

  pss_processor_impl           pss;
  pss_processor::config_t      pss_cfg;
  pss_cfg.phys_cell_id         = pci;
  pss_cfg.ssb_first_symbol     = 0;
  pss_cfg.ssb_first_subcarrier = 0;
  pss_cfg.amplitude            = 1.0F;
  pss_cfg.ports                = {0};
  pss.map(grid, pss_cfg);

  sss_processor_impl           sss;
  sss_processor::config_t      sss_cfg;
  sss_cfg.phys_cell_id         = pci;
  sss_cfg.ssb_first_symbol     = 0;
  sss_cfg.ssb_first_subcarrier = 0;
  sss_cfg.amplitude            = 1.0F;
  sss_cfg.ports                = {0};
  sss.map(grid, sss_cfg);

  // PSS on SSB symbol 0, SSS on symbol 2, both at subcarriers 56..182.
  printf("PSS");
  for (unsigned k = 0; k != 127; ++k) {
    cf_t v = grid.at(0, 56 + k);
    printf(" %a %a", v.real(), v.imag());
  }
  printf("\nSSS");
  for (unsigned k = 0; k != 127; ++k) {
    cf_t v = grid.at(2, 56 + k);
    printf(" %a %a", v.real(), v.imag());
  }
  printf("\n");
  fflush(stdout);
  _Exit(0);
}
