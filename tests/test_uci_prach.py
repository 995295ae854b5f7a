"""Tests for short-block UCI codes, the UCI decoder, and PRACH generate/detect."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops import short_block, uci, prach


class TestShortBlock:
    @pytest.mark.parametrize("k", list(range(1, 12)))
    def test_noiseless_detection(self, k):
        rng = np.random.default_rng(k)
        msgs = rng.integers(0, 2, (8, k)).astype(np.uint8)
        e = 32 if k > 2 else (6 if k == 2 else 2)
        llrs = np.stack([
            (1 - 2 * short_block.encode_host(m, e, 2).astype(np.int32)) * 50 for m in msgs
        ]).astype(np.int8)
        bits, metric = short_block.detect(jnp.asarray(llrs), k, 2)
        np.testing.assert_array_equal(np.asarray(bits), msgs)
        assert (np.asarray(metric) > 0.9).all()

    def test_noisy_detection_k4(self):
        rng = np.random.default_rng(99)
        msgs = rng.integers(0, 2, (50, 4)).astype(np.uint8)
        clean = np.stack([
            (1 - 2 * short_block.encode_host(m, 32, 2).astype(np.float64)) for m in msgs
        ])
        noisy = clean + rng.normal(0, 0.7, clean.shape)
        llrs = np.clip(np.round(20 * noisy), -120, 120).astype(np.int8)
        bits, _ = short_block.detect(jnp.asarray(llrs), 4, 2)
        word_ok = (np.asarray(bits) == msgs).all(axis=1)
        assert word_ok.mean() > 0.9


class TestUci:
    @pytest.mark.parametrize("k,e", [(12, 96), (19, 128), (20, 160), (60, 432), (400, 2304)])
    def test_polar_uci_roundtrip(self, k, e):
        rng = np.random.default_rng(k)
        msg = rng.integers(0, 2, k).astype(np.uint8)
        tx = uci.uci_encode(msg, e)
        assert tx.shape == (e,)
        llr = ((1 - 2 * tx.astype(np.int32)) * 20).astype(np.int8)
        bits, ok = uci.uci_decode(jnp.asarray(llr[None]), k)
        assert bool(np.asarray(ok)[0]), f"UCI CRC failed K={k} E={e}"
        np.testing.assert_array_equal(np.asarray(bits)[0], msg)

    def test_short_uci_roundtrip(self):
        msg = np.array([1, 0, 1], dtype=np.uint8)
        tx = uci.uci_encode(msg, 32)
        llr = ((1 - 2 * tx.astype(np.int32)) * 30).astype(np.int8)
        bits, ok = uci.uci_decode(jnp.asarray(llr[None]), 3)
        np.testing.assert_array_equal(np.asarray(bits)[0], msg)
        assert bool(np.asarray(ok)[0])


class TestPrach:
    @pytest.mark.parametrize("fmt_len,ncs_table,zcz", [(839, "1.25kHz", 1), (839, "1.25kHz", 11), (139, "short", 11)])
    def test_generate_detect_roundtrip(self, fmt_len, ncs_table, zcz):
        cfg = prach.PrachDetectorConfig(
            sequence_length=fmt_len, root_sequence_index=39, zero_correlation_zone=zcz,
            ncs_table=ncs_table,
        )
        rng = np.random.default_rng(zcz)
        for pidx in (0, 5, 17, 63):
            freq = prach.prach_generate(cfg, pidx)
            # Apply a small delay within the zone and mild noise.
            max_ta = max(cfg.ncs - 2, 0)
            ta = min(3, max_ta)
            k = np.arange(fmt_len)
            rx = freq * np.exp(-2j * np.pi * k * ta / fmt_len)
            rx = rx + (rng.normal(size=fmt_len) + 1j * rng.normal(size=fmt_len)) * 0.02
            pair = np.stack([rx.real, rx.imag], -1).astype(np.float32)
            dets = prach.prach_detect(jnp.asarray(pair[None]), cfg)[0]
            assert dets, f"no detection for preamble {pidx}"
            best = max(dets, key=lambda d: d[2])
            assert best[0] == pidx, f"wrong preamble: {best} expected {pidx}"
            assert abs(best[1] - ta) <= 1.5, f"TA {best[1]} vs {ta}"

    def test_no_false_alarm_on_noise(self):
        cfg = prach.PrachDetectorConfig(
            sequence_length=839, root_sequence_index=0, zero_correlation_zone=5,
            threshold=10.0,
        )
        rng = np.random.default_rng(1)
        rx = (rng.normal(size=839) + 1j * rng.normal(size=839)) * 0.5
        pair = np.stack([rx.real, rx.imag], -1).astype(np.float32)
        dets = prach.prach_detect(jnp.asarray(pair[None]), cfg)[0]
        assert dets == []


class TestPrachOfdm:
    def test_time_domain_roundtrip_and_detect(self):
        """UE modulates preamble to time samples; gNB demodulates + detects."""
        from srsran_projectvtlmo_tpu.ops import ofdm
        cfg = prach.PrachDetectorConfig(sequence_length=839, root_sequence_index=5,
                                        zero_correlation_zone=11)
        freq = prach.prach_generate(cfg, 23)
        pair = np.stack([freq.real, freq.imag], -1).astype(np.float32)
        fs = 1024 * 30e3  # small carrier sample rate, multiple of 1.25 kHz
        t = np.asarray(ofdm.prach_modulate(jnp.asarray(pair), 839, 12, 1.25e3, fs))
        assert t.shape == (int(fs / 1.25e3), 2)
        # Add a 2-sample delay (cyclic within the window) and mild noise.
        delay = 24  # time-domain samples at fs; = 24 * 839 / nwin seq samples
        t_delayed = np.roll(t, delay, axis=0)
        rng = np.random.default_rng(0)
        t_delayed += 0.001 * rng.normal(size=t_delayed.shape).astype(np.float32)
        back = ofdm.prach_demodulate(jnp.asarray(t_delayed), 839, 12, 1.25e3, fs)
        dets = prach.prach_detect(jnp.asarray(np.asarray(back))[None], cfg)[0]
        assert dets, "no detection after time-domain roundtrip"
        best = max(dets, key=lambda d: d[2])
        assert best[0] == 23
        expect_ta = delay * 839 / (fs / 1.25e3)
        assert abs(best[1] - expect_ta) <= 1.5, f"TA {best[1]} vs {expect_ta}"


def test_prach_configuration_tables():
    from srsran_projectvtlmo_tpu.ran.prach_config import prach_configuration
    # TS 38.211 Table 6.3.3.2-2 index 0: format 0, x=16, y=1, subframe 1.
    c = prach_configuration("fr1_paired", 0)
    assert c.format == "zero" and c.x == 16 and c.y == 1 and c.subframes == (1,)
    assert c.is_long
    assert c.occasion_in_sfn(17) and not c.occasion_in_sfn(16)
    # Unpaired table exists and has 256 entries worth of indices.
    c2 = prach_configuration("fr1_unpaired", 87)
    assert c2.format != "" and isinstance(c2.subframes, tuple)


class TestPrachCyclicShiftTables:
    """TS 38.211 Tables 6.3.3.1-5/6/7 accessor
    (reference: tests/unittests/ran/prach/prach_cyclic_shifts_test.cpp)."""

    def test_spot_values(self):
        from srsran_projectvtlmo_tpu.ran.prach_cyclic_shifts import (
            PRACH_CYCLIC_SHIFTS_RESERVED, RestrictedSetConfig,
            prach_cyclic_shifts_get)

        U, A, B = (RestrictedSetConfig.UNRESTRICTED, RestrictedSetConfig.TYPE_A,
                   RestrictedSetConfig.TYPE_B)
        assert prach_cyclic_shifts_get("1.25kHz", U, 0) == 0
        assert prach_cyclic_shifts_get("1.25kHz", U, 15) == 419
        assert prach_cyclic_shifts_get("1.25kHz", A, 0) == 15
        assert prach_cyclic_shifts_get("1.25kHz", A, 14) == 237
        assert prach_cyclic_shifts_get("1.25kHz", A, 15) == PRACH_CYCLIC_SHIFTS_RESERVED
        assert prach_cyclic_shifts_get("1.25kHz", B, 12) == 137
        assert prach_cyclic_shifts_get("1.25kHz", B, 13) == PRACH_CYCLIC_SHIFTS_RESERVED
        assert prach_cyclic_shifts_get("5kHz", U, 12) == 139
        assert prach_cyclic_shifts_get("5kHz", A, 15) == 237
        assert prach_cyclic_shifts_get("5kHz", B, 13) == 137
        assert prach_cyclic_shifts_get("5kHz", B, 14) == PRACH_CYCLIC_SHIFTS_RESERVED
        assert prach_cyclic_shifts_get("15kHz", U, 15) == 69
        assert prach_cyclic_shifts_get("15kHz", A, 0) == PRACH_CYCLIC_SHIFTS_RESERVED
        assert prach_cyclic_shifts_get("30kHz", B, 0) == PRACH_CYCLIC_SHIFTS_RESERVED
        assert prach_cyclic_shifts_get("5kHz", U, 16) == PRACH_CYCLIC_SHIFTS_RESERVED

    def test_unrestricted_matches_detector_tables(self):
        from srsran_projectvtlmo_tpu.ran.prach_cyclic_shifts import (
            RestrictedSetConfig, prach_cyclic_shifts_get)
        from srsran_projectvtlmo_tpu.ops.prach import NCS_UNRESTRICTED

        for zcz in range(16):
            assert (prach_cyclic_shifts_get("1.25kHz", RestrictedSetConfig.UNRESTRICTED, zcz)
                    == NCS_UNRESTRICTED["1.25kHz"][zcz])
            assert (prach_cyclic_shifts_get("15kHz", RestrictedSetConfig.UNRESTRICTED, zcz)
                    == NCS_UNRESTRICTED["short"][zcz])
