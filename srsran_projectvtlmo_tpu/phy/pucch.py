"""PUCCH processors: formats 0, 1 and 2 (TS 38.211 Section 6.3.2).

Format 0: sequence-selection detection -- correlate the received PRB against
the candidate cyclic shifts of the base sequence (one matmul over shifts).
Format 1: OCC-despread coherent detection with DM-RS channel estimation.
Format 2: QPSK demodulation + descrambling + UCI decode (short block / polar),
with DM-RS on subcarriers {1, 4, 7, 10} of each RB.
reference: lib/phy/upper/channel_processors/pucch_processor_impl.cpp:30-186,
pucch_detector_impl.cpp, pucch_demodulator_impl.cpp.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import prg as prg_mod
from ..ops.low_papr import low_papr_sequence, pucch_group_sequence
from ..ops import uci as uci_mod
from ..ops.demodulation import soft_demap
from ..ran.modulation import Modulation
from ..utils.cplx import to_cplx

NRE = 12

#: Detection thresholds: the detectors' normalized metrics target ~1%
#: false-alarm probability, like the reference's constant THRESHOLD = 4.0
#: on its unit-variance statistics (reference: pucch_detector_impl.cpp:279-286,
#: pucch_detector_format0.h:50). Calibrated for these metrics by the
#: false-alarm sweep in tests/test_pucch_calibration.py.
F0_DETECTION_THRESHOLD = 4.0
F1_DETECTION_THRESHOLD = 4.0


def _with_ports(rx):
    """Accept (B, S, N, 2) single-port or (B, P, S, N, 2) multi-port REs.

    All three processors combine every rx port like the reference
    (non-coherent metric accumulation for detection, MRC for demodulation;
    reference: pucch_detector_format0.cpp sum over ports,
    pucch_detector_impl.cpp:225-241 equalize over config.ports).
    """
    if rx.ndim == 4:
        return rx[:, None]
    if rx.ndim != 5:
        raise ValueError(f"expected 4-D or 5-D PUCCH REs, got shape {rx.shape}")
    return rx


def _cyclic_shift_hopping(n_id: int, slot: int, symbol: int) -> int:
    """n_cs(n_s, l) from the Gold sequence with c_init = n_id (Section 6.3.2.2.2)."""
    offset = 8 * (14 * slot + symbol)
    bits = prg_mod.gold_sequence_bits(n_id, offset + 8)[offset:offset + 8]
    return int((bits * (1 << np.arange(8))).sum())


@functools.lru_cache(maxsize=None)
def _f0_candidates(n_id: int, slot: int, start_symbol: int, nof_symbols: int, m0: int):
    """(12, nof_symbols, 12) complex: candidate sequences per cyclic shift."""
    u, v = pucch_group_sequence(n_id)
    cands = np.empty((12, nof_symbols, NRE), np.complex64)
    for mcs in range(12):
        for s in range(nof_symbols):
            ncs = _cyclic_shift_hopping(n_id, slot, start_symbol + s)
            alpha = 2 * np.pi * ((m0 + mcs + ncs) % NRE) / NRE
            cands[mcs, s] = low_papr_sequence(u, v, alpha, NRE)
    return cands


@dataclass(frozen=True)
class PucchFormat0Config:
    n_id: int
    slot: int
    start_symbol: int
    nof_symbols: int  # 1 or 2
    initial_cyclic_shift: int  # m0
    nof_harq_bits: int  # 0, 1 or 2
    sr_opportunity: bool = False


@functools.partial(jax.jit, static_argnums=(1,))
def detect_pucch_format0(rx_prb_pair, cfg: PucchFormat0Config):
    """Detect format 0 on (B, [P,] nof_symbols, 12, 2) received REs.

    Returns (harq_bits (B, nof_harq) uint8, detection_metric (B,), sr (B,) bool).
    """
    cands = _f0_candidates(cfg.n_id, cfg.slot, cfg.start_symbol, cfg.nof_symbols,
                           cfg.initial_cyclic_shift)
    y = to_cplx(_with_ports(rx_prb_pair))  # (B, P, S, 12)
    c = jnp.asarray(cands)  # (12, S, 12)
    # Reference detection metric (pucch_detector_format0.cpp:130-190): per
    # (candidate, symbol, port) corr = |mean(y conj(c))|^2, noise = avg LSE
    # power minus corr, accumulated over symbols AND rx ports; metric =
    # sum_corr^2 / sum(noise*corr), threshold 4.0 for a ~1% false-alarm
    # probability (the reference keeps the same constant for every port
    # count; the H0 statistic stays far below it — see
    # tests/test_pucch_calibration.py multi-port sweeps).
    lse_mean = jnp.einsum("bpsn,msn->bmps", y, jnp.conj(c)) / NRE  # (B, 12, P, S)
    corr_s = jnp.abs(lse_mean) ** 2  # (B, 12, P, S)
    avg_pwr = jnp.mean(jnp.abs(y) ** 2, axis=-1)  # (B, P, S); |c| = 1
    noise_s = jnp.maximum(avg_pwr[:, None] - corr_s, 0.0)
    sum_corr = jnp.sum(corr_s, axis=(-1, -2))  # (B, 12)
    sum_nv = jnp.sum(noise_s * corr_s, axis=(-1, -2))
    metric = jnp.where(sum_nv > 1e-30, sum_corr * sum_corr / sum_nv,
                       jnp.where(sum_corr > 1e-12, 1e9, 0.0))
    metric = metric / F0_DETECTION_THRESHOLD  # normalized: > 1 = detection

    if cfg.nof_harq_bits == 1:
        mcs_map = [0, 6]
    elif cfg.nof_harq_bits == 2:
        mcs_map = [0, 3, 6, 9]
    else:
        mcs_map = [0]
    sel = jnp.asarray(mcs_map)
    cand_metric = metric[:, sel]
    best = jnp.argmax(cand_metric, axis=-1)
    det = jnp.take_along_axis(cand_metric, best[:, None], axis=-1)[:, 0]
    if cfg.nof_harq_bits == 2:
        # Gray: index -> (b0, b1): 0->00, 1->01, 2->11, 3->10
        b0 = ((best == 2) | (best == 3)).astype(jnp.uint8)
        b1 = ((best == 1) | (best == 2)).astype(jnp.uint8)
        bits = jnp.stack([b0, b1], -1)
    elif cfg.nof_harq_bits == 1:
        bits = best[:, None].astype(jnp.uint8)
    else:
        bits = jnp.zeros(y.shape[:1] + (0,), jnp.uint8)
    sr = det > 1.0
    return bits, det, sr


@dataclass(frozen=True)
class PucchFormat1Config:
    n_id: int
    slot: int
    start_symbol: int
    nof_symbols: int  # 4..14
    initial_cyclic_shift: int
    time_domain_occ: int
    nof_harq_bits: int  # 1 or 2
    #: Intra-slot frequency hopping: the slot's symbols split into two hops
    #: (first hop = floor(N/2) symbols), each despread with its own
    #: (shorter) OCC and its own channel estimate; the detection statistic
    #: averages across hops.  The CALLER gathers each symbol's 12 REs from
    #: that symbol's hop PRB (like the PUSCH hopping contract)
    #: (reference: pucch_detector_impl.cpp:172-176).
    intra_slot_hopping: bool = False


def _f1_hop_ranges(cfg: PucchFormat1Config) -> list[tuple[int, int]]:
    if not cfg.intra_slot_hopping:
        return [(0, cfg.nof_symbols)]
    half = cfg.nof_symbols // 2
    return [(0, half), (half, cfg.nof_symbols)]


#: TS 38.211 Table 6.3.2.4.1-2 phi rows for spreading factor 4: the table is
#: Walsh-Hadamard ordered, NOT the DFT rows (found by the reference-detector
#: oracle: occ index 1/2 waveforms with 4 data symbols failed cross-detection;
#: every other spreading factor's table equals phi(i, m) = i*m mod N).
_F1_OCC_PHI_N4 = ((0, 0, 0, 0), (0, 2, 0, 2), (0, 0, 2, 2), (0, 2, 2, 0))


def _f1_occ_weights(i: int, n: int) -> np.ndarray:
    """w_i(m) = exp(2 pi j phi_i(m) / N), TS 38.211 Table 6.3.2.4.1-2."""
    if n == 4:
        phi = np.asarray(_F1_OCC_PHI_N4[i % 4])
    else:
        phi = (i * np.arange(max(n, 1))) % max(n, 1)
    return np.exp(2j * np.pi * phi / max(n, 1)).astype(np.complex64)


@functools.lru_cache(maxsize=None)
def _f1_tables(cfg: PucchFormat1Config):
    u, v = pucch_group_sequence(cfg.n_id)
    # DM-RS on even relative symbols, data on odd (Section 6.3.2.4.2/6.4.1.3.1).
    seqs = []
    for s in range(cfg.nof_symbols):
        ncs = _cyclic_shift_hopping(cfg.n_id, cfg.slot, cfg.start_symbol + s)
        alpha = 2 * np.pi * ((cfg.initial_cyclic_shift + ncs) % NRE) / NRE
        seqs.append(low_papr_sequence(u, v, alpha, NRE))
    seqs = np.stack(seqs)  # (S, 12)
    # OCC per hop: the spreading factor is each hop's own data/DM-RS symbol
    # count, weights from the Table 6.3.2.4.1-2 phi rows.
    i = cfg.time_domain_occ
    w_data, w_dmrs = [], []
    for a, b in _f1_hop_ranges(cfg):
        n_dmrs = sum(1 for s in range(a, b) if s % 2 == 0)
        n_data = (b - a) - n_dmrs
        w_data.append(_f1_occ_weights(i, n_data))
        w_dmrs.append(_f1_occ_weights(i, n_dmrs))
    return seqs, tuple(w_data), tuple(w_dmrs)


@functools.partial(jax.jit, static_argnums=(1,))
def detect_pucch_format1(rx_prb_pair, cfg: PucchFormat1Config):
    """Detect format 1 on (B, [P,] nof_symbols, 12, 2) received REs.

    Returns (harq_bits (B, nof_harq) uint8, metric (B,)).
    """
    seqs, w_data_h, w_dmrs_h = _f1_tables(cfg)
    y = to_cplx(_with_ports(rx_prb_pair))  # (B, P, S, 12)
    r = jnp.asarray(seqs)
    # Despread the base sequence from every symbol, per rx port.
    z = jnp.sum(y * jnp.conj(r)[None, None], axis=-1) / NRE  # (B, P, S)

    # Per hop and per rx port: OCC despread with the hop's own spreading
    # factor and a per-(hop, port) channel estimate; the decision variable
    # maximum-ratio-combines over hops AND ports (x = sum d conj(h)), and
    # the detection statistic accumulates corr/noise over both — the
    # reference equalizes across all config.ports before marginalizing
    # (pucch_detector_impl.cpp:225-241).
    x = 0.0
    sum_corr = 0.0
    sum_nv = 0.0
    for k, (a, b) in enumerate(_f1_hop_ranges(cfg)):
        dmrs_idx = [s for s in range(a, b) if s % 2 == 0]
        data_idx = [s for s in range(a, b) if s % 2 == 1]
        dmrs = z[:, :, jnp.asarray(dmrs_idx)]  # (B, P, Nd)
        data = z[:, :, jnp.asarray(data_idx)]
        w_dmrs = jnp.asarray(w_dmrs_h[k])
        w_data = jnp.asarray(w_data_h[k])
        h = jnp.sum(dmrs * jnp.conj(w_dmrs)[None, None], axis=-1) / len(w_dmrs)
        d = jnp.sum(data * jnp.conj(w_data)[None, None], axis=-1) / len(w_data)
        x = x + jnp.sum(d * jnp.conj(h), axis=1)  # (B,)
        corr_d = jnp.abs(h) ** 2  # (B, P)
        corr_x = jnp.abs(d) ** 2
        nv_dmrs = jnp.maximum(
            jnp.mean(jnp.abs(dmrs - h[..., None] * w_dmrs[None, None]) ** 2, -1), 0.0)
        nv_data = jnp.maximum(
            jnp.mean(jnp.abs(data - d[..., None] * w_data[None, None]) ** 2, -1), 0.0)
        sum_corr = sum_corr + jnp.sum(corr_d + corr_x, axis=1)
        sum_nv = sum_nv + jnp.sum(nv_dmrs * corr_d + nv_data * corr_x, axis=1)

    if cfg.nof_harq_bits == 1:
        bits = (jnp.real(x) <= 0).astype(jnp.uint8)[:, None]
    else:
        bits = jnp.stack([
            (jnp.real(x) <= 0).astype(jnp.uint8),
            (jnp.imag(x) <= 0).astype(jnp.uint8),
        ], -1)
    # Detection metric in the reference's style (pucch_detector_impl.cpp:
    # 277-286): matched-filter energy over the noise estimate, with the
    # noise variance taken from the despreading residuals; normalized by the
    # threshold (4.0: ~1% false alarm for the unit-variance statistic).
    # With intra-slot hopping corr and nv each sum over the hops, which
    # roughly doubles corr^2/nv versus the single-hop statistic the
    # threshold was calibrated for — dividing by the hop count restores the
    # same operating point for hopping and non-hopping configurations.  The
    # port sum scales the H0 statistic the same way (its mean grows
    # linearly in the number of accumulated terms), so the metric is also
    # normalized by the rx port count: the per-port-averaged statistic
    # keeps the calibrated ~1% false-alarm point at every port count while
    # retaining the diversity gain of combining (4-port >= 1-port detection
    # at fixed false alarm, tests/test_pucch_calibration.py).
    nof_hops = len(_f1_hop_ranges(cfg))
    nof_ports = y.shape[1]
    metric = jnp.where(sum_nv > 1e-30,
                       sum_corr * sum_corr / (sum_nv * nof_hops * nof_ports),
                       jnp.where(sum_corr > 1e-12, 1e9, 0.0))
    return bits, metric / F1_DETECTION_THRESHOLD


@dataclass(frozen=True)
class PucchFormat2Config:
    n_id: int         # scrambling (data)
    n_id0: int        # DM-RS scrambling
    rnti: int
    slot: int
    start_symbol: int
    nof_symbols: int  # 1 or 2
    nof_prb: int
    nof_uci_bits: int


def _f2_data_subc(nof_prb: int) -> np.ndarray:
    base = np.asarray([0, 2, 3, 5, 6, 8, 9, 11])
    return (np.arange(nof_prb)[:, None] * 12 + base[None, :]).reshape(-1)


def _f2_dmrs_subc(nof_prb: int) -> np.ndarray:
    base = np.asarray([1, 4, 7, 10])
    return (np.arange(nof_prb)[:, None] * 12 + base[None, :]).reshape(-1)


@functools.lru_cache(maxsize=None)
def _f2_dmrs_ref(cfg: PucchFormat2Config) -> np.ndarray:
    """(S, 4*nof_prb) complex64 DM-RS pilots (Section 6.4.1.3.2)."""
    out = []
    for s in range(cfg.nof_symbols):
        sym = cfg.start_symbol + s
        cinit = ((1 << 17) * (14 * cfg.slot + sym + 1) * (2 * cfg.n_id0 + 1) + 2 * cfg.n_id0) % (1 << 31)
        npil = 4 * cfg.nof_prb
        bits = prg_mod.gold_sequence_bits(cinit, 2 * npil).astype(np.float32)
        vals = (1 - 2 * bits) / np.sqrt(2)
        out.append(vals[0::2] + 1j * vals[1::2])
    return np.stack(out).astype(np.complex64)


@functools.partial(jax.jit, static_argnums=(1,))
def process_pucch_format2(rx_prbs_pair, cfg: PucchFormat2Config):
    """Demodulate+decode format 2 on (B, [P,] nof_symbols, 12*nof_prb, 2) REs.

    Rx ports are maximum-ratio combined with per-port noise weighting (the
    reference demodulates through the channel equalizer over all configured
    ports, pucch_demodulator_impl.cpp + channel_equalizer 1xN closed form).

    Returns (uci_bits (B, K) uint8, valid (B,)).
    """
    y = to_cplx(_with_ports(rx_prbs_pair))  # (B, P, S, 12*PRB)
    data_idx = jnp.asarray(_f2_data_subc(cfg.nof_prb))
    dmrs_idx = jnp.asarray(_f2_dmrs_subc(cfg.nof_prb))
    ref = jnp.asarray(_f2_dmrs_ref(cfg))  # (S, 4*PRB)

    pilots = y[..., dmrs_idx]
    lse = pilots * jnp.conj(ref)[None, None] / (jnp.abs(ref) ** 2)[None, None]
    # Channel estimate per RB (average its 4 pilots), broadcast to the 8 data REs.
    lse_rb = lse.reshape(lse.shape[:-1] + (cfg.nof_prb, 4)).mean(-1)  # (B, P, S, PRB)
    h_data = jnp.repeat(lse_rb, 8, axis=-1)  # matches data_idx ordering

    noise = jnp.mean(
        jnp.abs(pilots - jnp.repeat(lse_rb, 4, -1) * ref[None, None]) ** 2,
        axis=(-1, -2))  # (B, P)
    inv_nv = 1.0 / jnp.maximum(noise, 1e-9)[:, :, None, None]
    d = y[..., data_idx]
    # MRC over the port axis: eq = sum_p d conj(h)/nv / sum_p |h|^2/nv,
    # post-equalization noise variance 1 / sum_p |h|^2/nv (matched-filter
    # SNR addition; reference equalize_mmse_1xn.h:44-96 semantics with
    # per-port noise).
    num = jnp.sum(d * jnp.conj(h_data) * inv_nv, axis=1)  # (B, S, 8*PRB)
    den = jnp.maximum(jnp.sum(jnp.abs(h_data) ** 2 * inv_nv, axis=1), 1e-12)
    eq = num / den
    eq_nvar = 1.0 / den  # (B, S, 8*PRB)

    eq_flat = eq.reshape(eq.shape[0], -1)
    pair = jnp.stack([jnp.real(eq_flat), jnp.imag(eq_flat)], -1)
    nv = eq_nvar.reshape(eq.shape[0], -1)
    llr = soft_demap(pair, nv, Modulation.QPSK)  # (B, E)

    cinit = ((cfg.rnti << 15) + cfg.n_id) & 0x7FFFFFFF
    e = llr.shape[-1]
    signs = 1 - 2 * prg_mod.gold_sequence_bits(cinit, e).astype(np.int32)
    llr = jnp.clip(llr.astype(jnp.int32) * jnp.asarray(signs)[None], -127, 127).astype(jnp.int8)

    return uci_mod.uci_decode(llr, cfg.nof_uci_bits, bits_per_symbol=2)
