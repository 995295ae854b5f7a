"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from srsran_projectvtlmo_tpu.parallel import cell_mesh, shard_leading
from srsran_projectvtlmo_tpu.parallel.multi_cell import (
    build_multi_cell_pusch_rx, build_multi_cell_ulsch_tx,
)
from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig, flatten_tb_bits
from srsran_projectvtlmo_tpu.ran.modulation import Modulation


def test_eight_cell_sharded_loopback():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = cell_mesh(8)
    cfg = PuschRxConfig(nof_rb=8, modulation=Modulation.QPSK, target_code_rate=0.4,
                        nof_rx_ports=1, dft_size=128, numerology=1)
    tx = build_multi_cell_ulsch_tx(cfg, mesh)
    rx = build_multi_cell_pusch_rx(cfg, mesh)

    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (8, cfg.tbs)).astype(np.uint8)
    with mesh:
        tb_dev = shard_leading(jnp.asarray(tb), mesh)
        _, samples = tx(tb_dev)
        out = rx(samples[:, None])
        ok = np.asarray(jax.block_until_ready(out["tb_crc_ok"]))
    assert ok.shape == (8,)
    assert ok.all()
    got = flatten_tb_bits(np.asarray(out["tb_bits_cb"]), cfg.tbs)
    np.testing.assert_array_equal(got, tb)


def test_sharding_actually_partitions():
    mesh = cell_mesh(8)
    x = jnp.zeros((8, 4))
    with mesh:
        xs = shard_leading(x, mesh)
    assert len(xs.sharding.device_set) == 8


def test_codeblock_axis_sharded_decode():
    """Decode 16 codeblocks sharded over 8 devices; identical to local decode."""
    from srsran_projectvtlmo_tpu.parallel.cb_shard import build_sharded_ldpc_decode
    from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
    from srsran_projectvtlmo_tpu.ops.ldpc.decode import ldpc_decode
    from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph

    mesh = cell_mesh(8, axis="cb")
    bg, z = BaseGraph.BG1, 16
    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (16, 22 * z)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(jnp.asarray(info), bg, z))[:, 2 * z:]
    noisy = (1 - 2 * cw.astype(np.float64)) * 7 + rng.normal(0, 2.0, cw.shape)
    llr = jnp.asarray(np.clip(np.round(noisy), -20, 20).astype(np.int8))

    fn = build_sharded_ldpc_decode(mesh, bg, z, nof_iterations=4)
    with mesh:
        llr_s = shard_leading(llr, mesh, axis="cb")
        hard_s, soft_s = fn(llr_s)
        hard_s = np.asarray(jax.block_until_ready(hard_s))
    hard_l, _ = ldpc_decode(llr, bg, z, nof_iterations=4)
    np.testing.assert_array_equal(hard_s, np.asarray(hard_l))


def test_overlap_save_fir_matches_lfilter():
    """Sample-axis-sharded FIR with halo exchange == scipy lfilter."""
    from srsran_projectvtlmo_tpu.parallel.sample_shard import (
        fir_filter_overlap_save, shard_samples)

    mesh = cell_mesh(8, axis="sp")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1024, 2)).astype(np.float32)
    taps = rng.normal(size=7).astype(np.float32)
    with mesh:
        xs = shard_samples(jnp.asarray(x), mesh)
        y = np.asarray(fir_filter_overlap_save(xs, taps, mesh))
    xc = x[..., 0] + 1j * x[..., 1]
    ref = np.stack([np.convolve(xc[b], taps)[:1024] for b in range(2)])
    np.testing.assert_allclose(y[..., 0] + 1j * y[..., 1], ref, rtol=1e-5, atol=1e-5)


def test_overlap_save_complex_taps():
    from srsran_projectvtlmo_tpu.parallel.sample_shard import (
        fir_filter_overlap_save, shard_samples)

    mesh = cell_mesh(8, axis="sp")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(512, 2)).astype(np.float32)
    taps_c = (rng.normal(size=5) + 1j * rng.normal(size=5)).astype(np.complex64)
    taps = np.stack([taps_c.real, taps_c.imag], -1).astype(np.float32)
    with mesh:
        xs = shard_samples(jnp.asarray(x), mesh)
        y = np.asarray(fir_filter_overlap_save(xs, taps, mesh))
    xc = x[..., 0] + 1j * x[..., 1]
    ref = np.convolve(xc, taps_c)[:512]
    np.testing.assert_allclose(y[..., 0] + 1j * y[..., 1], ref, rtol=1e-4, atol=1e-4)


def test_sharded_ofdm_demodulate_matches_local():
    """Sample-sharded overlap-save OFDM demod == single-device demod."""
    from srsran_projectvtlmo_tpu.ops import ofdm
    from srsran_projectvtlmo_tpu.parallel.sample_shard import sharded_ofdm_demodulate

    mesh = cell_mesh(8, axis="sp")
    dft, mu, nsubc = 256, 1, 96
    rng = np.random.default_rng(2)
    grid = rng.normal(size=(14, nsubc, 2)).astype(np.float32)
    samples = np.asarray(ofdm.ofdm_modulate(jnp.asarray(grid), dft, mu, 0))
    want = np.asarray(ofdm.ofdm_demodulate(jnp.asarray(samples), nsubc, dft, mu, 0))
    with mesh:
        got = np.asarray(sharded_ofdm_demodulate(samples, nsubc, dft, mu, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_cb_sharded_es_decode_bit_exact():
    """The PRODUCTION early-stop decoder inside shard_map over the CB axis
    matches the unsharded decode exactly (hard/soft/ok/iterations)."""
    import jax
    from srsran_projectvtlmo_tpu.parallel.cb_shard import (
        build_sharded_ldpc_decode_es)
    from srsran_projectvtlmo_tpu.parallel.mesh import cell_mesh, shard_leading
    from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
    from srsran_projectvtlmo_tpu.ops.ldpc.decode import ldpc_decode_es
    from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph

    mesh = cell_mesh(8, axis="cb")
    bg, z = BaseGraph.BG1, 64
    rng = np.random.default_rng(3)
    kp = 22 * z
    from srsran_projectvtlmo_tpu.ops.crc import crc_host

    payload = rng.integers(0, 2, (16, kp - 24)).astype(np.uint8)
    info = np.concatenate(
        [payload, np.stack([crc_host(p, "CRC24B") for p in payload])], -1)
    cw = np.asarray(ldpc_encode(jnp.asarray(info), bg, z))
    base = ((1 - 2 * cw[:, 2 * z:].astype(np.int32)) * 8).astype(np.int8)
    noisy = np.where(rng.random(base.shape) < 0.05, -base // 2,
                     base).astype(np.int8)
    llr = jnp.asarray(noisy)

    fn = build_sharded_ldpc_decode_es(mesh, bg, z, "CRC24B", kp, 6, axis="cb")
    with mesh:
        llr_s = shard_leading(llr, mesh, axis="cb")
        res_s = [np.asarray(jax.block_until_ready(x)) for x in fn(llr_s)]
    res_l = [np.asarray(x) for x in ldpc_decode_es(llr, bg, z, "CRC24B", kp,
                                                   nof_iterations=6)]
    for a, b in zip(res_s, res_l):
        np.testing.assert_array_equal(a, b)
    assert res_l[2].all() and (res_s[0] == info).all()
