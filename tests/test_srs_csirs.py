"""SRS estimation and CSI-RS generation tests."""

import numpy as np

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
