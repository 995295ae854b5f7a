"""SRS estimation and CSI-RS generation tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops.srs import SrsConfig, srs_sequence, srs_subcarriers, srs_estimate
from srsran_projectvtlmo_tpu.ops.csi_rs import CsiRsConfig, csi_rs_sequence, map_csi_rs


def test_srs_estimates_flat_channel():
    cfg = SrsConfig(nof_rb=8, comb_size=2)
    seq = srs_sequence(cfg)
    sub = srs_subcarriers(cfg)
    rng = np.random.default_rng(0)
    h = 0.8 - 0.5j
    grid = np.zeros((1, 1, 1, cfg.nof_rb * 12), np.complex64)
    grid[0, 0, 0, sub] = h * seq
    grid += 0.01 * (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape))
    pair = np.stack([grid.real, grid.imag], -1).astype(np.float32)
    out = srs_estimate(jnp.asarray(pair), cfg)
    ce = np.asarray(out["ce_pair"])[0, 0]
    ce_c = ce[..., 0] + 1j * ce[..., 1]
    assert np.abs(ce_c - h).max() < 0.1, f"estimate error {np.abs(ce_c - h).max()}"
    assert float(np.asarray(out["noise_var"])[0, 0]) < 0.01


def test_srs_cyclic_shift_ports_orthogonal():
    cfg = SrsConfig(nof_rb=8, comb_size=2, nof_antenna_ports=2, cyclic_shift=0)
    s0 = srs_sequence(cfg, 0)
    s1 = srs_sequence(cfg, 1)
    # Different cyclic shifts: low cross-correlation, unit auto-correlation.
    assert abs(np.vdot(s0, s1)) / len(s0) < 0.05
    assert abs(np.vdot(s0, s0)) / len(s0) > 0.99


def test_csi_rs_mapping():
    cfg = CsiRsConfig(nof_rb=8, prb_start=2, symbol=4, subcarrier_offset=3, scrambling_id=5)
    grid = np.zeros((14, 12 * 12), np.complex64)
    map_csi_rs(grid, cfg)
    seq = csi_rs_sequence(cfg)
    k = (2 + np.arange(8)) * 12 + 3
    np.testing.assert_allclose(grid[4, k], seq)
    # Nothing else written.
    mask = np.zeros_like(grid, dtype=bool)
    mask[4, k] = True
    assert np.abs(grid[~mask]).max() == 0
    # QPSK unit power.
    np.testing.assert_allclose(np.abs(seq), 1 / np.sqrt(2) * np.sqrt(2), rtol=1e-6)


def test_csi_rs_row11_fd_cdm2_oracle():
    """Row 11 (16 ports) is fd-CDM2 with 8 CDM groups: l_bar = l0 + g//4,
    k_bar = k_ref[g % 4] (reference: csi_rs_pattern.cpp mapping_row_11,
    which asserts cdm == fd_CDM2)."""
    from srsran_projectvtlmo_tpu.ops.csi_rs import csi_rs_pattern

    k_ref = (0, 4, 6, 8)
    l0 = 5
    cfg = CsiRsConfig(nof_rb=4, prb_start=1, row=11, k_ref=k_ref, symbol=l0,
                      density="one", scrambling_id=7)
    pat = csi_rs_pattern(cfg)
    assert len(pat) == 16
    rbs = 1 + np.arange(4)
    for p, (symbols, subc, vals) in enumerate(pat):
        g = p // 2
        exp_k = k_ref[g % 4]
        exp_l = l0 + g // 4
        # fd-CDM2: one time symbol per port, pair of adjacent subcarriers.
        np.testing.assert_array_equal(symbols, [exp_l])
        exp_subc = (rbs[:, None] * 12 + np.array([exp_k, exp_k + 1])).reshape(-1)
        np.testing.assert_array_equal(subc, exp_subc)
        # CDM weights: even in-group index (1,1), odd (1,-1) on the pair.
        base = pat[(p // 2) * 2][2]  # even port of the same group
        sign = 1 if p % 2 == 0 else -1
        np.testing.assert_allclose(vals[0, 0::2], base[0, 0::2])
        np.testing.assert_allclose(vals[0, 1::2], sign * base[0, 1::2])
    # Ports within one CDM group share positions; both symbols l0 and l0+1 used.
    all_l = sorted({int(s[0]) for s, _, _ in pat})
    assert all_l == [l0, l0 + 1]


@pytest.mark.parametrize("row,nports,nkref,cdm", [
    (13, 24, 3, "fd2"), (14, 24, 3, "cdm4"), (15, 24, 3, "cdm8"),
    (16, 32, 4, "fd2"), (17, 32, 4, "cdm4"), (18, 32, 4, "cdm8"),
])
def test_csi_rs_rows_13_18_table_oracle(row, nports, nkref, cdm):
    """Rows 13-18 (24/32-port arrays) straight from TS 38.211 Table
    7.4.1.5.3-1: per-port (k_bar, l_bar) references with both l_0 and l_1,
    and CDM weights from Tables 7.4.1.5.3-2/4/5 (reference knows the port
    counts at csi_rs_config_helpers.cpp:124; its pattern builder stops at
    row 12, so the oracle here is the standard's table directly)."""
    from srsran_projectvtlmo_tpu.ops.csi_rs import csi_rs_pattern

    k_ref = (2, 4, 6, 8)[:nkref]
    l0, l1 = 4, 9
    cfg = CsiRsConfig(nof_rb=3, prb_start=2, row=row, k_ref=k_ref, symbol=l0,
                      symbol_l1=l1, density="one", scrambling_id=11)
    pat = csi_rs_pattern(cfg)
    assert len(pat) == nports
    csize = {"fd2": 2, "cdm4": 4, "cdm8": 8}[cdm]
    td = {"fd2": 1, "cdm4": 2, "cdm8": 4}[cdm]
    rbs = 2 + np.arange(3)

    # Expected (k_bar, l_bar) per CDM group, k-major within each l reference.
    def exp_group(g):
        if row in (13, 16):
            return k_ref[g % nkref], (l0, l0 + 1, l1, l1 + 1)[g // nkref]
        if row in (14, 17):
            return k_ref[g % nkref], l0 if g < nkref else l1
        return k_ref[g], l0  # rows 15, 18

    # CDM time weights (Tables 7.4.1.5.3-4/5); frequency weight is
    # (+1, -1)^(idx odd) on the second subcarrier of the pair.
    wt_cdm8 = [(1, 1, 1, 1), (1, 1, 1, 1), (1, -1, 1, -1), (1, -1, 1, -1),
               (1, 1, -1, -1), (1, 1, -1, -1), (1, -1, -1, 1), (1, -1, -1, 1)]
    for p, (symbols, subc, vals) in enumerate(pat):
        g, idx = p // csize, p % csize
        exp_k, exp_l = exp_group(g)
        np.testing.assert_array_equal(symbols, exp_l + np.arange(td))
        exp_subc = (rbs[:, None] * 12 + np.array([exp_k, exp_k + 1])).reshape(-1)
        np.testing.assert_array_equal(subc, exp_subc)
        base = pat[g * csize][2]  # in-group index 0 port
        wf = 1 if idx % 2 == 0 else -1
        if cdm == "fd2":
            wt = (1,)
        elif cdm == "cdm4":
            wt = (1, 1) if idx < 2 else (1, -1)
        else:
            wt = wt_cdm8[idx]
        # Compare per CDM time symbol: the in-group-0 port carries the raw
        # per-symbol sequence (its w_f/w_t are all +1).
        for si in range(td):
            np.testing.assert_allclose(vals[si, 0::2], wt[si] * base[si, 0::2])
            np.testing.assert_allclose(vals[si, 1::2],
                                       wf * wt[si] * base[si, 1::2])
    # Every port's per-RE magnitude is the configured QPSK amplitude.
    for _, _, vals in pat:
        np.testing.assert_allclose(np.abs(vals), 1.0, rtol=1e-6)


def test_csi_rs_row_13_18_fapi_validation():
    """Row range extended to 18; l1 rows validate the second time reference."""
    from srsran_projectvtlmo_tpu.fapi import validators as v
    from srsran_projectvtlmo_tpu.fapi.pdus import CsiRsPdu, DlTtiRequest

    ok = DlTtiRequest(slot=0, csi_rs=(CsiRsPdu(
        nof_rb=4, row=17, k_ref=(0, 2, 4, 6), symbol=4, symbol_l1=8),))
    assert v.validate_dl_tti_request(ok).ok
    bad_row = DlTtiRequest(slot=0, csi_rs=(CsiRsPdu(nof_rb=4, row=19),))
    assert not v.validate_dl_tti_request(bad_row).ok
    bad_l1 = DlTtiRequest(slot=0, csi_rs=(CsiRsPdu(
        nof_rb=4, row=13, k_ref=(0, 2, 4), symbol=6, symbol_l1=6),))
    assert not v.validate_dl_tti_request(bad_l1).ok
