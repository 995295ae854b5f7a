"""Native C++ host kernel tests (skipped when no toolchain is available)."""

import numpy as np
import pytest

from srsran_projectvtlmo_tpu import native
from srsran_projectvtlmo_tpu.ops.crc import crc_host, POLYS
from srsran_projectvtlmo_tpu.utils.bits import pack_bits as py_pack

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_pack_unpack_matches_python():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 1001).astype(np.uint8)
    words = native.pack_bits(bits)
    np.testing.assert_array_equal(words, py_pack(bits))
    np.testing.assert_array_equal(native.unpack_bits(words, 1001), bits)


@pytest.mark.parametrize("name", list(POLYS))
def test_crc_matches_python(name):
    rng = np.random.default_rng(1)
    for n in (8, 100, 1000):
        bits = rng.integers(0, 2, n).astype(np.uint8)
        rem_bits = crc_host(bits, name)
        expect = int("".join(map(str, rem_bits.tolist())), 2)
        assert native.crc_bits(bits, name) == expect, f"{name} n={n}"


def test_spsc_ring():
    ring = native.SpscRing(1024)
    data = np.random.default_rng(2).normal(size=(100, 2)).astype(np.float32)
    assert ring.write(data) == 100
    out = ring.read(60)
    np.testing.assert_array_equal(out, data[:60])
    out2 = ring.read(60)
    np.testing.assert_array_equal(out2[:40], data[60:])
    assert (out2[40:] == 0).all()


def test_crc_speed_large():
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, 300_000).astype(np.uint8)
    import time
    t0 = time.perf_counter()
    native.crc_bits(bits, "CRC24A")
    dt = time.perf_counter() - t0
    assert dt < 0.1, f"native CRC too slow: {dt:.3f}s for 300k bits"
