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
