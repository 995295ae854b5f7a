"""Polar rate matching / dematching, TS 38.212 Sections 5.4.1.1-5.4.1.3.

Sub-block interleaver, bit selection (puncture / shorten / repeat), and the
triangular channel interleaver (uplink, ibil) are pure index maps precomputed
per PolarCode; Tx is one gather, Rx is a scatter with repetition combining.
reference: lib/phy/upper/channel_coding/polar/polar_rate_matcher_impl.cpp:27-106,
polar_rate_dematcher_impl.cpp:40-118.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ...utils.llr import LLR_INFTY
from .code import PolarCode, blk_interleaver


def _triangular_perm(e: int) -> np.ndarray:
    """perm[i_out] = i_in for the uplink triangular channel interleaver."""
    t = 1
    s = 1
    while s < e:
        t += 1
        s += t
    out = []
    for r in range(t):
        i_in = r
        for c in range(t - r):
            if i_in < e:
                out.append(i_in)
                i_in += t - c
            else:
                break
    return np.asarray(out, dtype=np.int64)


@functools.lru_cache(maxsize=None)
def tx_plan(code: PolarCode) -> np.ndarray:
    """(E,) gather indices from the N-bit codeword to the rate-matched bits."""
    nn, e, k = code.N, code.E, code.K
    blk = blk_interleaver(code.n)  # y[j] = x[blk[j]]
    if e >= nn:
        sel = np.concatenate([blk, blk[np.arange(nn, e) % nn]])
    elif 16 * k <= 7 * e:  # puncture the first N-E interleaved bits
        sel = blk[nn - e:]
    else:  # shorten the last N-E interleaved bits
        sel = blk[:e]
    if code.ibil:
        sel = sel[_triangular_perm(e)]
    return sel.astype(np.int64)


def rate_match(codeword, code: PolarCode):
    """(B, N) bits -> (B, E)."""
    return jnp.take(codeword, jnp.asarray(tx_plan(code)), axis=-1)


@functools.lru_cache(maxsize=None)
def _rx_tables(code: PolarCode):
    nn, e, k = code.N, code.E, code.K
    blk = blk_interleaver(code.n)
    if code.ibil:
        perm = _triangular_perm(e)
        deint = np.empty(e, dtype=np.int64)
        deint[perm] = np.arange(e)  # e_buf[perm[i_out]] = f[i_out]
    else:
        deint = np.arange(e)
    # Scatter target in interleaved-domain y (length N) for each of the E inputs;
    # -1 marks punctured-away positions (none -- inputs always land somewhere).
    if e >= nn:
        y_target = np.arange(e) % nn
    elif 16 * k <= 7 * e:
        y_target = (nn - e) + np.arange(e)
    else:
        y_target = np.arange(e)
    # Initial y fill value per position: 0 normally; punctured -> 0; shortened -> +inf.
    init = np.zeros(nn, dtype=np.int8)
    if e < nn and not (16 * k <= 7 * e):
        init[e:] = LLR_INFTY
    return deint, y_target.astype(np.int64), init, blk


def rate_dematch(llrs, code: PolarCode):
    """(B, E) int8 LLRs -> (B, N) int8 with puncture=0, shorten=+INFTY, repeats combined."""
    deint, y_target, init, blk = _rx_tables(code)
    b = llrs.shape[:-1]
    e_buf = jnp.take(llrs, jnp.asarray(deint), axis=-1).astype(jnp.int32)
    y = jnp.broadcast_to(jnp.asarray(init, jnp.int32), b + (code.N,))
    y = y.at[..., jnp.asarray(y_target)].add(e_buf)
    # Repetition combining follows promotion_sum: overflow beyond LLR_MAX
    # promotes to +/-LLR_INFTY (the shortened fill receives no additions).
    from ...utils.llr import LLR_MAX

    y = jnp.where(jnp.abs(y) > LLR_MAX, jnp.sign(y) * LLR_INFTY, y)
    # Deinterleave: output[blk[j]] = y[j].
    out = jnp.zeros_like(y)
    out = out.at[..., jnp.asarray(blk)].set(y)
    return out.astype(jnp.int8)
