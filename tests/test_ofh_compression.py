"""O-RAN fronthaul BFP IQ compression tests.

Validates the batched device programs against an independent scalar golden
model of O-RAN.WG4.CUS Annex A.1.2 (the algorithm the reference implements in
lib/ofh/compression/iq_compression_bfp_impl.cpp) and checks wire-format
pack/unpack roundtrips plus reconstruction SNR.
"""

import numpy as np
import pytest

from srsran_projectvtlmo_tpu.ops import ofh_compression as ofh


def _rand_iq(rng, n_prb, scale=0.7):
    return (rng.normal(size=(n_prb, 12, 2)) * scale / 3).clip(-1, 1).astype(np.float32)


@pytest.mark.parametrize("width", [8, 9, 12, 14, 16])
def test_bfp_compress_matches_golden(width):
    rng = np.random.default_rng(width)
    iq = _rand_iq(rng, 24)
    mant, exp = ofh.bfp_compress(iq, width)
    mant, exp = np.asarray(mant), np.asarray(exp)

    q = np.clip(np.round(iq * 32767.0), -32768, 32767).astype(np.int64)
    for p in range(iq.shape[0]):
        g_m, g_e = ofh.golden_bfp_compress_prb(q[p].reshape(24), width)
        assert exp[p] == g_e, f"prb {p}: exponent {exp[p]} != {g_e}"
        np.testing.assert_array_equal(mant[p], g_m)


@pytest.mark.parametrize("width", [9, 14])
def test_bfp_mantissa_range(width):
    rng = np.random.default_rng(1)
    iq = _rand_iq(rng, 50, scale=3.0)  # drive into clipping
    mant, exp = ofh.bfp_compress(iq, width)
    mant = np.asarray(mant)
    assert mant.max() <= (1 << (width - 1)) - 1
    assert mant.min() >= -(1 << (width - 1))
    assert np.asarray(exp).min() >= 0


@pytest.mark.parametrize("width", [8, 9, 12, 16])
def test_pack_unpack_roundtrip(width):
    rng = np.random.default_rng(width + 100)
    iq = _rand_iq(rng, 16)
    mant, exp = ofh.bfp_compress(iq, width)
    wire = ofh.pack_prbs(mant, width, exp)
    assert wire.shape == (16, 1 + (24 * width + 7) // 8)
    m2, e2 = ofh.unpack_prbs(np.asarray(wire), width, True)
    np.testing.assert_array_equal(np.asarray(m2), np.asarray(mant))
    np.testing.assert_array_equal(np.asarray(e2), np.asarray(exp))


@pytest.mark.parametrize("kind,width,min_snr_db", [
    ("bfp", 9, 40.0), ("bfp", 14, 70.0), ("none", 16, 80.0)])
def test_roundtrip_snr(kind, width, min_snr_db):
    rng = np.random.default_rng(7)
    iq = _rand_iq(rng, 64)
    wire = ofh.compress_symbol(iq, kind, width)
    out = np.asarray(ofh.decompress_symbol(np.asarray(wire), kind, width))
    err = out - iq
    snr = 10 * np.log10(np.sum(iq**2) / max(np.sum(err**2), 1e-30))
    assert snr > min_snr_db, f"{kind}/{width}: snr {snr:.1f} dB"


def test_batched_axes():
    rng = np.random.default_rng(3)
    iq = rng.normal(size=(2, 14, 10, 12, 2)).astype(np.float32) / 4
    mant, exp = ofh.bfp_compress(iq, 9)
    assert mant.shape == (2, 14, 10, 24) and exp.shape == (2, 14, 10)
    rec = np.asarray(ofh.bfp_decompress(mant, 9, exponents=exp))
    assert rec.shape == iq.shape
