"""Golden numpy layered scaled min-sum LDPC decoder.

Straight transcription of the reference algorithm semantics
(lib/phy/upper/channel_coding/ldpc/ldpc_decoder_generic.cpp) with plain loops:
the framework's batched JAX decoder must match this bit for bit.
"""

from __future__ import annotations

import numpy as np

from srsran_projectvtlmo_tpu.ops.ldpc.graphs import get_graph
from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph

LLR_MAX = 120
LLR_INFTY = 127


def _sat_sub(a: int, b: int) -> int:
    if a == b:
        return 0
    if abs(a) == LLR_INFTY:
        return a
    if abs(b) == LLR_INFTY:
        return -b
    t = a - b
    return max(-LLR_MAX, min(LLR_MAX, t))


def _promotion_sum(a: int, b: int) -> int:
    if a == -b:
        return 0
    if abs(a) == LLR_INFTY:
        return a
    if abs(b) == LLR_INFTY:
        return b
    t = a + b
    if abs(t) > LLR_MAX:
        return LLR_INFTY if t > 0 else -LLR_INFTY
    return t


def golden_decode(llr: np.ndarray, bg: BaseGraph, z: int, nof_iterations: int, scaling: float):
    """Decode one codeblock: llr (N,) int8 without the 2Z punctured bits.

    Returns (hard_info (K,) uint8, soft_info (K,) int8).
    """
    g = get_graph(bg, z)
    nv, m = g.n_full, g.m
    soft = np.zeros(nv * z, dtype=np.int64)
    soft[2 * z:] = llr.astype(np.int64)
    # c2v per (row, edge, check-index j): stored in check domain.
    c2v = {}

    for _ in range(nof_iterations):
        for r in range(m):
            edges = [(c, g.shifts[r, c]) for c in range(nv) if g.shifts[r, c] >= 0]
            v2c = np.zeros((len(edges), z), dtype=np.int64)
            for e, (c, s) in enumerate(edges):
                old = c2v.get((r, e), np.zeros(z, dtype=np.int64))
                for j in range(z):
                    soft_chk = soft[c * z + (j + s) % z]
                    v2c[e, j] = _sat_sub(soft_chk, old[j])
            # min1/min2/argmin/signprod per check index j.
            absv = np.abs(v2c)
            sign = (v2c < 0).astype(np.int64)
            for j in range(z):
                order = absv[:, j]
                amin = int(np.argmin(order))
                # Running min/second-min start at LLR_MAX in the reference, so
                # magnitudes are capped at 120 (ldpc_decoder_impl.cpp:256-258).
                m1 = min(order[amin], LLR_MAX)
                rest = np.delete(order, amin)
                m2 = min(rest.min(), LLR_MAX) if len(rest) else m1
                sp = sign[:, j].sum() % 2
                for e, (c, s) in enumerate(edges):
                    mag = m2 if e == amin else m1
                    mag = int(np.floor(mag * scaling + 0.5))
                    fs = sp ^ sign[e, j]
                    new = -mag if fs else mag
                    c2v.setdefault((r, e), np.zeros(z, dtype=np.int64))[j] = new
                    s_new = _promotion_sum(new, v2c[e, j])
                    soft[c * z + (j + s) % z] = s_new

    info = soft[: g.k]
    hard = (info <= 0).astype(np.uint8)
    return hard, np.clip(info, -LLR_INFTY, LLR_INFTY).astype(np.int8)
