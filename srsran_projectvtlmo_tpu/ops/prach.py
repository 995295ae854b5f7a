"""PRACH preamble generation and detection (TS 38.211 Section 6.3.3).

Generation: Zadoff-Chu roots x_u(n) = exp(-j pi u n(n+1) / L) with the standard
logical->physical root mapping (data/prach_tables.npz) and cyclic shifts
C_v = v * N_cs (unrestricted set).

Detection mirrors the reference's frequency-domain correlator
(reference: lib/phy/upper/channel_processors/prach_detector_generic_impl.cpp:89-339):
per root sequence, conj-multiply the received occasion spectrum, zero-padded
IDFT to the time domain, accumulate power per N_cs-shift window, compare the
window peak against the occasion noise floor.  All roots/windows batch into one
jitted program.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.cplx import to_cplx

LONG = 839
SHORT = 139

_DATA = Path(__file__).resolve().parent.parent / "data" / "prach_tables.npz"

#: TS 38.211 Tables 6.3.3.1-5/6/7, unrestricted set: zeroCorrelationZone -> N_cs.
NCS_UNRESTRICTED = {
    "1.25kHz": (0, 13, 15, 18, 22, 26, 32, 38, 46, 59, 76, 93, 119, 167, 279, 419),
    "5kHz": (0, 13, 26, 33, 38, 41, 49, 55, 64, 76, 93, 119, 139, 209, 279, 419),
    "short": (0, 2, 4, 6, 8, 10, 12, 13, 15, 17, 19, 23, 27, 34, 46, 69),
}


@functools.lru_cache(maxsize=1)
def _root_luts():
    with np.load(_DATA) as z:
        return z["long_root_lut"].astype(int), z["short_root_lut"].astype(int)


def physical_root(logical_index: int, long_format: bool) -> int:
    long_lut, short_lut = _root_luts()
    lut = long_lut if long_format else short_lut
    return int(lut[logical_index % len(lut)])


def zc_sequence(u: int, length: int, cyclic_shift: int = 0) -> np.ndarray:
    """Time-domain ZC root sequence with cyclic shift, complex64 (host)."""
    n = (np.arange(length) + cyclic_shift) % length
    phase = -np.pi * u * n * (n + 1) / length
    return np.exp(1j * phase).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def zc_freq(u: int, length: int) -> np.ndarray:
    """DFT of the unshifted root sequence (host, cached)."""
    return np.fft.fft(zc_sequence(u, length)).astype(np.complex64)


@dataclass(frozen=True)
class PrachDetectorConfig:
    """Static detection configuration for one occasion format."""

    sequence_length: int          # 839 or 139
    root_sequence_index: int      # logical start index
    zero_correlation_zone: int    # index into the N_cs table
    ncs_table: str = "1.25kHz"
    nof_preambles: int = 64
    #: Detection threshold relative to the noise floor (reference keeps a
    #: per-configuration table, prach_detector_generic_thresholds.h).
    threshold: float = 2.0

    @property
    def ncs(self) -> int:
        return NCS_UNRESTRICTED[self.ncs_table][self.zero_correlation_zone]

    @functools.cached_property
    def plan(self) -> tuple[np.ndarray, np.ndarray, int]:
        """(roots (R,), preamble index of first shift per root (R,), shifts/root)."""
        l = self.sequence_length
        shifts_per_root = l // self.ncs if self.ncs else 1
        roots = []
        first = []
        count = 0
        logical = self.root_sequence_index
        while count < self.nof_preambles:
            roots.append(physical_root(logical, l == LONG))
            first.append(count)
            count += shifts_per_root
            logical += 1
        return np.asarray(roots), np.asarray(first), shifts_per_root


def prach_generate(cfg: PrachDetectorConfig, preamble_index: int) -> np.ndarray:
    """Frequency-domain preamble (host): DFT of the cyclically shifted root."""
    roots, first, spr = cfg.plan
    i_root = preamble_index // spr
    v = preamble_index % spr
    seq = zc_sequence(roots[i_root], cfg.sequence_length, v * cfg.ncs)
    return np.fft.fft(seq).astype(np.complex64) / np.sqrt(cfg.sequence_length)


def _detector_tables(cfg: PrachDetectorConfig, nfft: int):
    """(conj root spectra (R, L), window gather indices (nwin, win_len))."""
    roots, first, spr = cfg.plan
    l = cfg.sequence_length
    conj_freq = np.stack([np.conj(zc_freq(int(u), cfg.sequence_length)) for u in roots])
    # A preamble with shift C_v = v*Ncs and delay tau peaks at correlation lag
    # d = (tau - C_v) mod L (scaled by nfft/L): window v starts at (L - C_v) mod L.
    if cfg.ncs:
        win_len = max(int(round(cfg.ncs * nfft / l)), 1)
        starts = [((l - v * cfg.ncs) % l) * nfft // l for v in range(spr)]
    else:
        win_len = nfft
        starts = [0]
    win_idx = (np.asarray(starts)[:, None] + np.arange(win_len)[None, :]) % nfft
    return conj_freq.astype(np.complex64), win_idx.astype(np.int32), win_len


@functools.partial(jax.jit, static_argnums=(1, 2))
def _detect_jit(rx_freq_pair, cfg: PrachDetectorConfig, nfft: int):
    conj_freq, win_idx, win_len = _detector_tables(cfg, nfft)
    rx = to_cplx(rx_freq_pair)  # (B, L)
    prod = rx[:, None, :] * jnp.asarray(conj_freq)[None, :, :]  # (B, R, L)
    # Zero-padded IDFT -> delay-domain correlation at nfft/L oversampling.
    corr = jnp.fft.ifft(prod, n=nfft, axis=-1)
    power = jnp.abs(corr) ** 2  # (B, R, nfft)

    total_power = jnp.sum(power, axis=-1, keepdims=True)
    w = jnp.take(power, jnp.asarray(win_idx.reshape(-1)), axis=-1)
    w = w.reshape(power.shape[:-1] + win_idx.shape)  # (B, R, nwin, win_len)
    win_power = jnp.sum(w, axis=-1)  # (B, R, nwin)
    win_peak = jnp.max(w, axis=-1)
    win_argpeak = jnp.argmax(w, axis=-1)

    # Noise floor: occasion power minus the window's own contribution.
    noise = (total_power - win_power) / (nfft - win_len)
    metric = win_peak / jnp.maximum(noise, 1e-12)
    return metric, win_argpeak, win_peak


def prach_detect(rx_freq_pair, cfg: PrachDetectorConfig, oversampling: int = 2):
    """Detect preambles in received occasion spectra.

    Args:
      rx_freq_pair: (B, L, 2) received frequency-domain occasion.
      cfg: detector configuration.

    Returns dict with (numpy) detections per batch: list of
      (preamble_index, time_advance_samples, metric).
    """
    l = cfg.sequence_length
    nfft = 1
    while nfft < l * oversampling:
        nfft <<= 1
    metric, argpeak, peak = _detect_jit(rx_freq_pair, cfg, nfft)
    from ..utils.xfer import to_host
    metric = to_host(metric)
    argpeak = to_host(argpeak)
    roots, first, spr = cfg.plan

    results = []
    for b in range(metric.shape[0]):
        dets = []
        for r in range(metric.shape[1]):
            for v in range(metric.shape[2]):
                idx = first[r] + v
                if idx >= cfg.nof_preambles:
                    continue
                if metric[b, r, v] > cfg.threshold:
                    # Window offset is the delay: TA in sequence samples.
                    ta_samples = argpeak[b, r, v] * l / nfft
                    dets.append((int(idx), float(ta_samples), float(metric[b, r, v])))
        results.append(dets)
    return results
