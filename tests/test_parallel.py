"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from srsran_projectvtlmo_tpu.parallel import cell_mesh, shard_leading
from srsran_projectvtlmo_tpu.parallel.multi_cell import (
    build_multi_cell_pusch_rx, build_multi_cell_ulsch_tx,
)
from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
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
    got = np.asarray(out["tb_bits"])
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
