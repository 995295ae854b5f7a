"""PRACH buffer/pool abstraction + end-to-end occasion capture -> detection.

reference: lib/phy/support/prach_buffer_impl.h,
lib/phy/support/prach_buffer_pool_impl.cpp (per-occasion freq-domain buffer
+ pool), prach_processor_worker.h:48-102 (window collection).
"""

import numpy as np
import pytest

from srsran_projectvtlmo_tpu.phy.prach_buffer import (
    PrachBuffer, PrachBufferFormat, PrachBufferPool)


def test_pool_reserve_release_cycle():
    fmt = PrachBufferFormat(sequence_length=139, nof_symbols=2, nof_ports=2)
    pool = PrachBufferPool(fmt, nof_buffers=2)
    a = pool.reserve(slot=10)
    b = pool.reserve(slot=11)
    assert a is not None and b is not None and a.index != b.index
    assert pool.reserve(slot=12) is None  # exhausted -> dropped occasion
    pool.release(a)
    assert pool.nof_free == 1
    c = pool.reserve(slot=13)
    assert c is not None and c.slot == 13 and not c.full
    with pytest.raises(ValueError):
        pool.release(b) or pool.release(b)


def test_buffer_fill_tracking_and_views():
    fmt = PrachBufferFormat(sequence_length=139, nof_symbols=2, nof_ports=2)
    buf = PrachBuffer(fmt, 0)
    rng = np.random.default_rng(0)
    s0 = rng.normal(size=(2, 139, 2)).astype(np.float32)
    buf.set_symbol(0, 0, s0)
    assert not buf.full
    buf.set_symbol(0, 1, s0 * 2)
    assert buf.full
    occ = buf.occasion(0)
    assert occ.shape == (2, 2, 139, 2)
    np.testing.assert_array_equal(occ[0], s0)
    buf.reset()
    assert not buf.full and not occ.any()


def test_collector_to_buffer_to_detector():
    """Lower-PHY symbol stream -> PrachBuffer -> multi-port detection through
    UpperPhy-equivalent detect call."""
    import jax.numpy as jnp

    from srsran_projectvtlmo_tpu.ops import prach as prach_mod
    from srsran_projectvtlmo_tpu.phy.realtime import PrachOccasionCollector

    cfg = prach_mod.PrachDetectorConfig(
        sequence_length=prach_mod.SHORT, root_sequence_index=1,
        zero_correlation_zone=1, ncs_table="short")
    pre = prach_mod.prach_generate(cfg, preamble_index=7)
    tx = np.stack([pre.real, pre.imag], -1).astype(np.float32)

    nof_ports, nof_symbols = 2, 2
    fmt = PrachBufferFormat(sequence_length=139, nof_symbols=nof_symbols,
                            nof_ports=nof_ports)
    pool = PrachBufferPool(fmt)
    buf = pool.reserve(slot=4)

    rng = np.random.default_rng(1)
    collectors = [PrachOccasionCollector() for _ in range(nof_ports)]
    for col in collectors:
        col.configure(slot=4, start_symbol=0, nof_symbols=nof_symbols)
    # Per-port constant random phase + small noise; symbols repeat coherently.
    phases = np.exp(1j * rng.uniform(0, 2 * np.pi, nof_ports))
    for p, col in enumerate(collectors):
        for s in range(nof_symbols):
            c = (pre * phases[p]
                 + 0.05 * (rng.normal(size=139) + 1j * rng.normal(size=139)))
            win = col.on_symbol(4, s, np.stack([c.real, c.imag], -1))
        assert win is not None  # completed after the last symbol
        for s in range(nof_symbols):
            buf.set_symbol(0, s, win[s].astype(np.float32), port=p)
    assert buf.full

    occ = np.transpose(buf.occasion(0), (1, 0, 2, 3))[None]  # (1, P, S, L, 2)
    dets = prach_mod.prach_detect(jnp.asarray(occ), cfg)[0]
    assert any(d[0] == 7 for d in dets), dets
    pool.release(buf)
