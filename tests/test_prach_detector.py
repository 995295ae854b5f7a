"""PRACH detection quality: table-driven thresholds, multi-port combining,
multi-symbol occasions, false-alarm/miss behavior at calibrated SNR."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops import prach as prach_mod


def _occasion(cfg, preamble, nof_ports, nof_symbols, snr_db, seed,
              delay_samples=0.0):
    """Synthesize (1, P, S, L, 2) received occasion spectra."""
    rng = np.random.default_rng(seed)
    l = cfg.sequence_length
    freq = prach_mod.prach_generate(cfg, preamble)  # (L,)
    if delay_samples:
        n = np.arange(l)
        freq = freq * np.exp(-2j * np.pi * n * delay_samples / l)
    amp = 10.0 ** (snr_db / 20.0)
    rx = np.zeros((1, nof_ports, nof_symbols, l), np.complex64)
    for p in range(nof_ports):
        h = (rng.normal() + 1j * rng.normal()) / np.sqrt(2)
        rx[0, p, :, :] = amp * h * freq
    rx += (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape)) / np.sqrt(2)
    return np.stack([rx.real, rx.imag], -1).astype(np.float32)


class TestThresholdTable:
    def test_table_lookup_validated_combos(self):
        thr, margin, flag = prach_mod.threshold_and_margin(
            1, 1.25e3, "0", 0, True)
        assert thr == pytest.approx(0.147, abs=1e-4)
        assert margin == 5
        assert flag in ("orange", "green")
        # Different port counts give different calibration points.
        thr2, _, _ = prach_mod.threshold_and_margin(2, 1.25e3, "0", 0, True)
        thr4, _, _ = prach_mod.threshold_and_margin(4, 1.25e3, "0", 0, True)
        assert len({thr, thr2, thr4}) >= 2

    def test_uncovered_combo_falls_back(self):
        thr, margin, flag = prach_mod.threshold_and_margin(
            64, 1.25e3, "0", 0, True)
        assert (thr, margin, flag) == (2.0, 5, "red")


class TestDetection:
    @pytest.mark.parametrize("nof_ports", [1, 2, 4])
    def test_ports_sweep_format0(self, nof_ports):
        """Format 0, ZCZ=1: detect the right preamble at 0 dB per port."""
        cfg = prach_mod.PrachDetectorConfig(
            sequence_length=prach_mod.LONG, root_sequence_index=0,
            zero_correlation_zone=1, format="0")
        hits = 0
        for s in range(4):
            rx = _occasion(cfg, preamble=7, nof_ports=nof_ports,
                           nof_symbols=1, snr_db=0.0, seed=100 + s)
            dets = prach_mod.prach_detect(jnp.asarray(rx), cfg)[0]
            if dets and max(dets, key=lambda d: d[2])[0] == 7:
                hits += 1
        assert hits >= 3, f"{nof_ports} ports: detected only {hits}/4"

    def test_multi_symbol_combining_gain(self):
        """Format 1 (2 symbols): combining detects where one symbol is weak."""
        cfg = prach_mod.PrachDetectorConfig(
            sequence_length=prach_mod.LONG, root_sequence_index=4,
            zero_correlation_zone=5, format="1", combine_symbols=True)
        rx = _occasion(cfg, preamble=3, nof_ports=1, nof_symbols=2,
                       snr_db=-3.0, seed=7)
        dets = prach_mod.prach_detect(jnp.asarray(rx), cfg)[0]
        assert dets and max(dets, key=lambda d: d[2])[0] == 3

    def test_false_alarm_on_noise(self):
        """Pure noise occasions produce (almost) no detections across the
        64-preamble bank — the table threshold controls the false-alarm rate."""
        cfg = prach_mod.PrachDetectorConfig(
            sequence_length=prach_mod.LONG, root_sequence_index=0,
            zero_correlation_zone=1, format="0")
        rng = np.random.default_rng(5)
        false_alarms = 0
        trials = 8
        for s in range(trials):
            noise = (rng.normal(size=(1, 1, 1, prach_mod.LONG))
                     + 1j * rng.normal(size=(1, 1, 1, prach_mod.LONG)))
            rx = np.stack([noise.real, noise.imag], -1).astype(np.float32)
            dets = prach_mod.prach_detect(jnp.asarray(rx), cfg)[0]
            false_alarms += len(dets)
        assert false_alarms <= 1, f"{false_alarms} false alarms in {trials} occasions"

    def test_timing_advance_estimate(self):
        """A delayed preamble reports its delay in sequence samples."""
        cfg = prach_mod.PrachDetectorConfig(
            sequence_length=prach_mod.LONG, root_sequence_index=0,
            zero_correlation_zone=1, format="0")
        delay = 6.0
        rx = _occasion(cfg, preamble=2, nof_ports=2, nof_symbols=1,
                       snr_db=10.0, seed=3, delay_samples=delay)
        dets = prach_mod.prach_detect(jnp.asarray(rx), cfg)[0]
        assert dets
        best = max(dets, key=lambda d: d[2])
        assert best[0] == 2
        assert best[1] == pytest.approx(delay, abs=1.0)

    def test_short_format_b4(self):
        cfg = prach_mod.PrachDetectorConfig(
            sequence_length=prach_mod.SHORT, root_sequence_index=1,
            zero_correlation_zone=11, ncs_table="short", format="B4",
            numerology=1)
        rx = _occasion(cfg, preamble=5, nof_ports=2, nof_symbols=12,
                       snr_db=-6.0, seed=11)
        dets = prach_mod.prach_detect(jnp.asarray(rx), cfg)[0]
        assert dets and max(dets, key=lambda d: d[2])[0] == 5
