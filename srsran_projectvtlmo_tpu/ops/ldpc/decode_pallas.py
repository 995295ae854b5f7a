"""Pallas TPU kernel for the layered scaled min-sum LDPC decoder.

Same arithmetic as ops/ldpc/decode.py (bit-exact: LLR saturation at +/-120,
+/-127 fixed-bit promotion, running-min init at LLR_MAX, 0.8 scaling with
round-half-away), but engineered for the TPU memory hierarchy:

 * the whole codeblock state lives in VMEM across all iterations: soft bits
   (NV, B_tile, Z) and a *compressed* check-to-variable state per layer
   (scaled min1/min2, argmin edge, per-edge sign bitmask, sign product) --
   the reference's AVX512 decoder stores raw c2v messages per edge
   (reference: lib/phy/upper/channel_coding/ldpc/ldpc_decoder_avx512.cpp:72-78);
   the compressed form is ~6x smaller and reconstructs c2v in registers;
 * the graph is static per (BG, Z): the layer/edge structure is fully unrolled
   at trace time and every cyclic rotation is a static-lane pltpu.roll --
   no gathers, no scatters, no dynamic indexing anywhere;
 * codeblocks batch on the sublane axis; the grid walks batch tiles.

Lifting size Z rides the lane axis (Z <= 384 = 3 vregs of 128 lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ran.ldpc_params import BaseGraph
from ...utils.llr import LLR_MAX, LLR_INFTY
from .graphs import get_graph

DEFAULT_B_TILE = 8

#: Trace-time invocation counters (per kernel family): incremented when a jit
#: trace actually embeds the Pallas kernel, so tests can assert the
#: production orchestration selected the Pallas path (not the XLA fallback).
TRACE_STATS = {"es_bm": 0, "packed": 0}



def _tpu_roll_safe(z: int) -> bool:
    """Mosaic lane rotations are only correct when the lane count is a whole
    number of 128-lane vregs: at z in {40, 64, 96, 104, 208, ...} the
    COMPILED kernels silently corrupt the rotation (verified against the XLA
    decoder on hardware; interpreter mode is fine).  Wrappers route other
    lifting sizes to the PACKED-LANE kernel (`_es_bm_packed` /
    `_decode_packed`), which pads the lane axis to a multiple of 128 and
    rotates via the two-static-rolls + lane-select block roller
    (`_make_block_roller`) — bit-exact on hardware for all 51 Z
    (tools/ldpc_tpu_parity.py is the hardware parity harness)."""
    return z % 128 == 0


def _sat_sub(a, b):
    """LLR saturated difference (int32 in/out), reference semantics."""
    plain = jnp.clip(a - b, -LLR_MAX, LLR_MAX)
    out = jnp.where(jnp.abs(a) == LLR_INFTY, a, jnp.where(jnp.abs(b) == LLR_INFTY, -b, plain))
    return jnp.where(a == b, 0, out)


def _promotion_sum(a, b):
    s = a + b
    plain = jnp.where(jnp.abs(s) > LLR_MAX, jnp.sign(s) * LLR_INFTY, s)
    out = jnp.where(jnp.abs(a) == LLR_INFTY, a, jnp.where(jnp.abs(b) == LLR_INFTY, b, plain))
    return jnp.where(a == -b, 0, out)


def _scale(mag, scaling_factor: float):
    """round-half-away(mag * sf) for nonnegative mags (reference scale_llr)."""
    return jnp.floor(mag.astype(jnp.float32) * jnp.float32(scaling_factor) + 0.5).astype(jnp.int32)


def _transpose01_int8(x, to_front: bool):
    """Transpose axes (0, 1) of an int8 (a, b, z) array cheaply.

    int8 transposes lower to pathological layout churn on TPU; when z % 4 == 0
    the same byte permutation runs 4x denser as an int32 transpose (the last
    axis keeps its packing, only leading axes permute)."""
    a, b, z = x.shape
    if z % 4 == 0:
        x32 = jax.lax.bitcast_convert_type(
            x.reshape(a, b, z // 4, 4), jnp.int32)
        t = jnp.transpose(x32, (1, 0, 2))
        back = jax.lax.bitcast_convert_type(t, jnp.int8)
        return back.reshape(b, a, z)
    return jnp.transpose(x, (1, 0, 2))


@functools.lru_cache(maxsize=None)
def _row_edges(bg: BaseGraph, z: int):
    g = get_graph(bg, z)
    rows = []
    for r in range(g.m):
        cols = np.flatnonzero(g.shifts[r] >= 0)
        rows.append([(int(c), int(g.shifts[r, c])) for c in cols])
    return g, rows


def _make_kernel(bg: BaseGraph, z: int, nof_iterations: int, scaling_factor: float,
                 b_tile: int):
    g, rows = _row_edges(bg, z)
    nv, m = g.n_full, g.m

    def kernel(llr_ref, out_ref, soft, min1, min2, amin, signs, sprod):
        # Initialize: soft = [0, 0, llr blocks...]; c2v state zeroed.
        soft[0] = jnp.zeros((b_tile, z), jnp.int32)
        soft[1] = jnp.zeros((b_tile, z), jnp.int32)
        for c in range(2, nv):
            soft[c] = llr_ref[c - 2].astype(jnp.int32)
        min1[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        min2[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        amin[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        signs[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        sprod[...] = jnp.zeros((m, b_tile, z), jnp.int32)

        def iteration(_, carry):
            for r, edges in enumerate(rows):
                old_m1 = min1[r]
                old_m2 = min2[r]
                old_am = amin[r]
                old_sb = signs[r]
                old_sp = sprod[r]

                # Pass 1: v2c per edge + running min/second-min/argmin/signs.
                v2cs = []
                new_m1 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_m2 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_am = jnp.zeros((b_tile, z), jnp.int32)
                new_sp = jnp.zeros((b_tile, z), jnp.int32)
                new_sb = jnp.zeros((b_tile, z), jnp.int32)
                for e, (c, s) in enumerate(edges):
                    soft_chk = pltpu.roll(soft[c], (z - s) % z, axis=1)
                    old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                    old_mag = jnp.where(old_am == e, old_m2, old_m1)
                    c2v_old = jnp.where((old_sp ^ old_sign_e) == 1, -old_mag, old_mag)
                    v2c = _sat_sub(soft_chk, c2v_old)
                    v2cs.append(v2c)

                    absv = jnp.abs(v2c)
                    sign = (v2c < 0).astype(jnp.int32)
                    is_min = absv < new_m1
                    new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                    new_am = jnp.where(is_min, e, new_am)
                    new_m1 = jnp.where(is_min, absv, new_m1)
                    new_sp = new_sp ^ sign
                    new_sb = new_sb | (sign << e)

                s_m1 = _scale(new_m1, scaling_factor)
                s_m2 = _scale(new_m2, scaling_factor)

                # Pass 2: c2v update + soft-bit update (rotate back to var domain).
                for e, (c, s) in enumerate(edges):
                    v2c = v2cs[e]
                    sign_e = jnp.bitwise_and(new_sb >> e, 1)
                    mag = jnp.where(new_am == e, s_m2, s_m1)
                    c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                    soft_new = _promotion_sum(c2v, v2c)
                    soft[c] = pltpu.roll(soft_new, s, axis=1)

                min1[r] = s_m1
                min2[r] = s_m2
                amin[r] = new_am
                signs[r] = new_sb
                sprod[r] = new_sp
            return carry

        jax.lax.fori_loop(0, nof_iterations, iteration, 0)

        for c in range(g.kb):
            out_ref[c] = jnp.clip(soft[c], -LLR_INFTY, LLR_INFTY).astype(jnp.int8)

    return kernel, g


def _make_kernel_delta(bg: BaseGraph, z: int, nof_iterations: int,
                       scaling_factor: float, b_tile: int):
    """v1 kernel with delta-roll domain tracking: each column's soft bits stay
    stored in the check-domain of the LAST row that touched them, so every
    edge needs ONE rotation (the delta to this row's domain) instead of a
    roll-in + roll-back pair. Bit-exact: rotations are exact permutations and
    the arithmetic is untouched.

    To keep the fori_loop body identical across iterations, the init rolls
    each column into its schedule-final domain (the shift of the last row in
    the layer order touching it), and the epilogue rolls back to domain 0.
    """
    g, rows = _row_edges(bg, z)
    nv, m = g.n_full, g.m

    # Schedule-final domain per column = shift of the last row touching it.
    final_dom = [0] * nv
    for edges in rows:
        for c, s in edges:
            final_dom[c] = s

    def kernel(llr_ref, out_ref, soft, min1, min2, amin, signs, sprod):
        soft[0] = jnp.zeros((b_tile, z), jnp.int32)
        soft[1] = jnp.zeros((b_tile, z), jnp.int32)
        for c in range(2, nv):
            x = llr_ref[c - 2].astype(jnp.int32)
            soft[c] = pltpu.roll(x, (z - final_dom[c]) % z, axis=1)
        min1[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        min2[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        amin[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        signs[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        sprod[...] = jnp.zeros((m, b_tile, z), jnp.int32)

        def iteration(_, carry):
            # Trace-time rotation-domain bookkeeping; starts each iteration
            # at the schedule-final domains (loop-invariant by construction).
            cur = list(final_dom)
            for r, edges in enumerate(rows):
                old_m1 = min1[r]
                old_m2 = min2[r]
                old_am = amin[r]
                old_sb = signs[r]
                old_sp = sprod[r]

                v2cs = []
                new_m1 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_m2 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_am = jnp.zeros((b_tile, z), jnp.int32)
                new_sp = jnp.zeros((b_tile, z), jnp.int32)
                new_sb = jnp.zeros((b_tile, z), jnp.int32)
                for e, (c, s) in enumerate(edges):
                    delta = (cur[c] - s) % z
                    soft_chk = pltpu.roll(soft[c], delta, axis=1) if delta else soft[c]
                    old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                    old_mag = jnp.where(old_am == e, old_m2, old_m1)
                    c2v_old = jnp.where((old_sp ^ old_sign_e) == 1, -old_mag, old_mag)
                    v2c = _sat_sub(soft_chk, c2v_old)
                    v2cs.append(v2c)

                    absv = jnp.abs(v2c)
                    sign = (v2c < 0).astype(jnp.int32)
                    is_min = absv < new_m1
                    new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                    new_am = jnp.where(is_min, e, new_am)
                    new_m1 = jnp.where(is_min, absv, new_m1)
                    new_sp = new_sp ^ sign
                    new_sb = new_sb | (sign << e)

                s_m1 = _scale(new_m1, scaling_factor)
                s_m2 = _scale(new_m2, scaling_factor)

                for e, (c, s) in enumerate(edges):
                    v2c = v2cs[e]
                    sign_e = jnp.bitwise_and(new_sb >> e, 1)
                    mag = jnp.where(new_am == e, s_m2, s_m1)
                    c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                    soft[c] = _promotion_sum(c2v, v2c)  # stays in row domain
                    cur[c] = s

                min1[r] = s_m1
                min2[r] = s_m2
                amin[r] = new_am
                signs[r] = new_sb
                sprod[r] = new_sp
            # By schedule construction cur == final_dom here.
            return carry

        jax.lax.fori_loop(0, nof_iterations, iteration, 0)

        for c in range(g.kb):
            back = pltpu.roll(soft[c], final_dom[c] % z, axis=1) if final_dom[c] % z else soft[c]
            out_ref[c] = jnp.clip(back, -LLR_INFTY, LLR_INFTY).astype(jnp.int8)

    return kernel, g


@functools.lru_cache(maxsize=None)
def _packed_crc_mask(crc_name: str, kp: int, kb: int, z: int,
                     final_dom: tuple[int, ...]) -> np.ndarray:
    """(kb, 1, z) int32: bit j of [c, 0, i] = zero-basis CRC row j coefficient
    for codeblock bit c*z+i, pre-rotated into each column's stored domain."""
    from ..crc import crc_zero_basis, POLYS

    order, _ = POLYS[crc_name]
    basis = crc_zero_basis(crc_name, kp)  # (kp, order)
    packed = np.zeros(kb * z, np.int32)
    packed[:kp] = (basis.astype(np.int64) << np.arange(order, dtype=np.int64)).sum(-1).astype(np.int32)
    packed = packed.reshape(kb, z)
    for c in range(kb):
        packed[c] = np.roll(packed[c], -final_dom[c])
    return packed[:, None, :].copy()


def _make_kernel_delta_es(bg: BaseGraph, z: int, max_iterations: int,
                          scaling_factor: float, b_tile: int, crc_order: int):
    """Delta-roll kernel with per-codeblock CRC-gated early stop.

    Matches the reference's per-iteration CRC check + stop
    (reference: lib/phy/upper/channel_coding/ldpc/ldpc_decoder_impl.cpp:116-135):
    after every full layer sweep the CB CRC is evaluated on the systematic
    hard decisions; a passing codeblock's output is snapshotted (bit-exact with
    stopping it) and the whole batch tile exits once every CB has converged.
    The CRC is a packed-int32 GF(2) dot: 24 parity bits ride the int32 lanes,
    XOR-accumulated per systematic column, so the per-iteration check costs
    ~kb fused ops.
    """
    g, rows = _row_edges(bg, z)
    nv, m = g.n_full, g.m

    final_dom = [0] * nv
    for edges in rows:
        for c, s in edges:
            final_dom[c] = s

    def kernel(llr_ref, mask_ref, out_ref, ok_ref, it_ref,
               soft, min1, min2, amin, signs, sprod, out_soft, done, itcnt):
        soft[0] = jnp.zeros((b_tile, z), jnp.int32)
        soft[1] = jnp.zeros((b_tile, z), jnp.int32)
        for c in range(2, nv):
            x = llr_ref[c - 2].astype(jnp.int32)
            soft[c] = pltpu.roll(x, (z - final_dom[c]) % z, axis=1)
        min1[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        min2[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        amin[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        signs[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        sprod[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        out_soft[...] = jnp.zeros((g.kb, b_tile, z), jnp.int32)
        done[...] = jnp.zeros((b_tile, z), jnp.int32)
        itcnt[...] = jnp.full((b_tile, z), max_iterations, jnp.int32)

        def cond(carry):
            it, alldone = carry
            return jnp.logical_and(it < max_iterations, alldone == 0)

        def body(carry):
            it, _ = carry
            cur = list(final_dom)
            for r, edges in enumerate(rows):
                old_m1 = min1[r]
                old_m2 = min2[r]
                old_am = amin[r]
                old_sb = signs[r]
                old_sp = sprod[r]

                v2cs = []
                new_m1 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_m2 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_am = jnp.zeros((b_tile, z), jnp.int32)
                new_sp = jnp.zeros((b_tile, z), jnp.int32)
                new_sb = jnp.zeros((b_tile, z), jnp.int32)
                for e, (c, s) in enumerate(edges):
                    delta = (cur[c] - s) % z
                    soft_chk = pltpu.roll(soft[c], delta, axis=1) if delta else soft[c]
                    old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                    old_mag = jnp.where(old_am == e, old_m2, old_m1)
                    c2v_old = jnp.where((old_sp ^ old_sign_e) == 1, -old_mag, old_mag)
                    v2c = _sat_sub(soft_chk, c2v_old)
                    v2cs.append(v2c)

                    absv = jnp.abs(v2c)
                    sign = (v2c < 0).astype(jnp.int32)
                    is_min = absv < new_m1
                    new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                    new_am = jnp.where(is_min, e, new_am)
                    new_m1 = jnp.where(is_min, absv, new_m1)
                    new_sp = new_sp ^ sign
                    new_sb = new_sb | (sign << e)

                s_m1 = _scale(new_m1, scaling_factor)
                s_m2 = _scale(new_m2, scaling_factor)

                for e, (c, s) in enumerate(edges):
                    v2c = v2cs[e]
                    sign_e = jnp.bitwise_and(new_sb >> e, 1)
                    mag = jnp.where(new_am == e, s_m2, s_m1)
                    c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                    soft[c] = _promotion_sum(c2v, v2c)
                    cur[c] = s

                min1[r] = s_m1
                min2[r] = s_m2
                amin[r] = new_am
                signs[r] = new_sb
                sprod[r] = new_sp

            # CRC over the systematic hard decisions (cur == final_dom here,
            # the mask is pre-rotated to the stored domains): 24 GF(2) parity
            # bits packed into int32 lanes, XOR-accumulated per column.
            acc = jnp.zeros((b_tile, z), jnp.int32)
            for c in range(g.kb):
                hard = (soft[c] <= 0).astype(jnp.int32)
                acc = acc ^ (hard * mask_ref[c])
            bad = jnp.zeros((b_tile, 1), jnp.int32)
            for j in range(crc_order):
                bad = bad | (jnp.sum((acc >> j) & 1, axis=1, keepdims=True) % 2)
            ok = (bad == 0).astype(jnp.int32)  # (b, 1)

            was_done = done[:, 0:1]
            newly = ok * (1 - was_done)  # (b, 1)
            for c in range(g.kb):
                out_soft[c] = jnp.where(newly > 0, soft[c], out_soft[c])
            itcnt[...] = jnp.where(newly > 0, it + 1, itcnt[...])
            done_new = jnp.where(was_done + newly > 0,
                                 jnp.ones((b_tile, 1), jnp.int32),
                                 jnp.zeros((b_tile, 1), jnp.int32))
            done[...] = jnp.broadcast_to(done_new, (b_tile, z))
            alldone = jnp.min(done_new).astype(jnp.int32)
            return it + 1, alldone

        jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.int32(0)))

        dmask = done[...]
        for c in range(g.kb):
            final = jnp.where(dmask > 0, out_soft[c], soft[c])
            back = pltpu.roll(final, final_dom[c] % z, axis=1) if final_dom[c] % z else final
            out_ref[c] = jnp.clip(back, -LLR_INFTY, LLR_INFTY).astype(jnp.int8)
        ok_ref[...] = dmask.astype(jnp.int8)
        it_ref[...] = itcnt[...]

    return kernel, g, tuple(final_dom)


def _make_kernel_delta_es_bm(bg: BaseGraph, z: int, max_iterations: int,
                             scaling_factor: float, b_tile: int,
                             crc_order: int):
    """Batch-major early-stop kernel: same arithmetic as
    `_make_kernel_delta_es` (bit-exact) with (b_tile, nv, z) batch-major I/O
    so the caller needs NO whole-buffer int8 transpose — the transpose was
    37% of device time as "data formatting" in the round-2 op profile.
    Internal state is int32: Mosaic's `tpu.dynamic_rotate` is unimplemented
    for non-32-bit vectors on this toolchain, so the int16 double-density
    variant (kept below as `_make_kernel_delta_es16`) cannot compile; the
    layout win is what mattered."""
    g, rows = _row_edges(bg, z)
    nv, m = g.n_full, g.m

    final_dom = [0] * nv
    for edges in rows:
        for c, s in edges:
            final_dom[c] = s

    def kernel(llr_ref, mask_ref, out_ref, ok_ref, it_ref,
               soft, min1, min2, amin, signs, sprod, out_soft, done, itcnt):
        for c in range(nv):
            if c < 2:
                soft[c] = jnp.zeros((b_tile, z), jnp.int32)
            else:
                x = llr_ref[:, c - 2, :].astype(jnp.int32)
                soft[c] = pltpu.roll(x, (z - final_dom[c]) % z, axis=1)
        out_soft[...] = jnp.zeros((g.kb, b_tile, z), jnp.int32)
        done[...] = jnp.zeros((b_tile, z), jnp.int32)
        itcnt[...] = jnp.full((b_tile, z), max_iterations, jnp.int32)

        def sweep(first: bool):
            """One full layer sweep; `first` (trace-time) skips the
            reconstruction of the previous c2v messages, which are all zero
            on iteration 0 (v2c = soft directly — the saturated difference
            with 0 is the identity on the valid LLR domain)."""
            cur = list(final_dom)
            for r, edges in enumerate(rows):
                if not first:
                    old_m1 = min1[r]
                    old_m2 = min2[r]
                    old_am = amin[r]
                    old_sb = signs[r]
                    old_sp = sprod[r]

                v2cs = []
                new_m1 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_m2 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
                new_am = jnp.zeros((b_tile, z), jnp.int32)
                new_sp = jnp.zeros((b_tile, z), jnp.int32)
                new_sb = jnp.zeros((b_tile, z), jnp.int32)
                for e, (c, s) in enumerate(edges):
                    delta = (cur[c] - s) % z
                    soft_chk = pltpu.roll(soft[c], delta, axis=1) if delta else soft[c]
                    if first:
                        v2c = soft_chk
                    else:
                        old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                        old_mag = jnp.where(old_am == e, old_m2, old_m1)
                        c2v_old = jnp.where((old_sp ^ old_sign_e) == 1,
                                            -old_mag, old_mag)
                        v2c = _sat_sub(soft_chk, c2v_old)
                    v2cs.append(v2c)

                    absv = jnp.abs(v2c)
                    sign = (v2c < 0).astype(jnp.int32)
                    is_min = absv < new_m1
                    new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                    new_am = jnp.where(is_min, e, new_am)
                    new_m1 = jnp.where(is_min, absv, new_m1)
                    new_sp = new_sp ^ sign
                    new_sb = new_sb | (sign << e)

                s_m1 = _scale(new_m1, scaling_factor)
                s_m2 = _scale(new_m2, scaling_factor)

                for e, (c, s) in enumerate(edges):
                    v2c = v2cs[e]
                    sign_e = jnp.bitwise_and(new_sb >> e, 1)
                    mag = jnp.where(new_am == e, s_m2, s_m1)
                    c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                    soft[c] = _promotion_sum(c2v, v2c)
                    cur[c] = s

                min1[r] = s_m1
                min2[r] = s_m2
                amin[r] = new_am
                signs[r] = new_sb
                sprod[r] = new_sp

        def crc_and_snapshot(it):
            # Packed-int32 CRC over the systematic hard decisions.
            acc = jnp.zeros((b_tile, z), jnp.int32)
            for c in range(g.kb):
                hard = (soft[c] <= 0).astype(jnp.int32)
                acc = acc ^ (hard * mask_ref[c])
            bad = jnp.zeros((b_tile, 1), jnp.int32)
            for j in range(crc_order):
                bad = bad | (jnp.sum((acc >> j) & 1, axis=1, keepdims=True) % 2)
            ok = (bad == 0).astype(jnp.int32)  # (b, 1)

            was_done = done[:, 0:1]
            newly = ok * (1 - was_done)
            for c in range(g.kb):
                out_soft[c] = jnp.where(newly > 0, soft[c], out_soft[c])
            itcnt[...] = jnp.where(newly > 0, it + 1, itcnt[...])
            done_new = jnp.where(was_done + newly > 0,
                                 jnp.ones((b_tile, 1), jnp.int32),
                                 jnp.zeros((b_tile, 1), jnp.int32))
            done[...] = jnp.broadcast_to(done_new, (b_tile, z))
            return jnp.min(done_new).astype(jnp.int32)

        # Peeled iteration 0 (no c2v reconstruction, no state zero-init —
        # the first sweep writes every state slot before reading it).
        sweep(True)
        alldone0 = crc_and_snapshot(jnp.int32(0))

        def cond(carry):
            it, alldone = carry
            return jnp.logical_and(it < max_iterations, alldone == 0)

        def body(carry):
            it, _ = carry
            sweep(False)
            return it + 1, crc_and_snapshot(it)

        jax.lax.while_loop(cond, body, (jnp.int32(1), alldone0))

        dmask = done[...]
        for c in range(g.kb):
            final = jnp.where(dmask > 0, out_soft[c], soft[c])
            back = pltpu.roll(final, final_dom[c] % z, axis=1) if final_dom[c] % z else final
            out_ref[:, c, :] = jnp.clip(back, -LLR_INFTY, LLR_INFTY).astype(jnp.int8)
        ok_ref[...] = dmask.astype(jnp.int8)
        it_ref[...] = itcnt[...]

    return kernel, g, tuple(final_dom)


@functools.lru_cache(maxsize=None)
def _pack_plan(z: int) -> tuple[int, int]:
    """(zp, kpack) physical lane layout for lifting size z.

    Mosaic lane rotations are only correct on whole numbers of 128-lane
    vregs, so the kernel state always spans zp % 128 == 0 lanes.  For
    z % 128 != 0 the lane row packs `kpack` codeblocks (contiguous z-wide
    blocks at offsets k*z) and every cyclic rotation becomes two static
    rolls + a lane select (`_make_block_roller`) — the TPU analog of the
    reference AVX512 decoder's node padding to 64-byte lanes
    (reference: lib/phy/upper/channel_coding/ldpc/ldpc_decoder_avx512.cpp:72-78).
    kpack maximizes lane utilization K*z/zp over zp in {128, 256, 384},
    capped at 8 (per-block CRC reductions scale with K)."""
    if z % 128 == 0:
        return z, 1
    best = None
    for zp in (128, 256, 384):
        k = min(zp // z, 8)
        if k == 0:
            continue
        util = k * z / zp
        if best is None or util > best[0] + 1e-9:
            best = (util, zp, k)
    _, zp, k = best
    return zp, k


def _make_block_roller(z: int, zp: int, lane_mod_ref):
    """Block-cyclic lane rotation: rotate each contiguous z-wide block of a
    (b, zp) int32 array by a static shift d, independently per block.

    out[k*z + j] = x[k*z + (j - d) mod z].  Two global static rolls + a
    select: roll(x, d) is correct for j >= d; roll(x, zp - z + d) reads
    x[i + z - d], correct for j < d.  Lanes >= K*z are don't-care."""

    def roll(x, d):
        d = d % z
        if d == 0:
            return x
        a = pltpu.roll(x, d, axis=1)
        b = pltpu.roll(x, (zp - z + d) % zp, axis=1)
        return jnp.where(lane_mod_ref < d, b, a)

    return roll


def _make_kernel_packed_es_bm(bg: BaseGraph, z: int, zp: int, kpack: int,
                              max_iterations: int, scaling_factor: float,
                              b_tile: int, crc_order: int):
    """Batch-major early-stop kernel for z % 128 != 0: identical arithmetic
    to `_make_kernel_delta_es_bm` (bit-exact) on a (b_tile, zp) lane layout
    that packs `kpack` codeblocks per lane row (see `_pack_plan`).  The
    CRC verdict, early-stop bookkeeping and output snapshots are per block
    (lane-disjoint selects)."""
    g, rows = _row_edges(bg, z)
    nv, m = g.n_full, g.m

    final_dom = [0] * nv
    for edges in rows:
        for c, s in edges:
            final_dom[c] = s

    def kernel(llr_ref, mask_ref, lane_ref, out_ref, ok_ref, it_ref,
               soft, min1, min2, amin, signs, sprod, out_soft, done, itcnt):
        # Keep the lane tables 2D ((1, zp), broadcasting over sublanes):
        # 1D vectors force Mosaic relayouts at every use.
        lane_mod = lane_ref[0:1]   # (1, zp) lane % z
        lane_blk = lane_ref[1:2]   # (1, zp) lane // z  (>= kpack in pad lanes)
        rollb = _make_block_roller(z, zp, lane_mod)

        for c in range(nv):
            if c < 2:
                soft[c] = jnp.zeros((b_tile, zp), jnp.int32)
            else:
                # Pack kpack codeblocks onto the lane row: block k's data
                # arrives in lanes [0, z) of sub-batch k and moves to
                # [k*z, (k+1)*z) via a global roll.
                acc = None
                for k in range(kpack):
                    xk = llr_ref[:, k, c - 2, :].astype(jnp.int32)
                    rk = pltpu.roll(xk, (k * z) % zp, axis=1) if k else xk
                    acc = rk if acc is None else jnp.where(lane_blk == k, rk, acc)
                soft[c] = rollb(acc, (z - final_dom[c]) % z)
        out_soft[...] = jnp.zeros((g.kb, b_tile, zp), jnp.int32)
        # Pad lanes (>= kpack*z) start done so they never gate the stop.
        done[...] = jnp.broadcast_to(
            (lane_blk >= kpack).astype(jnp.int32), (b_tile, zp))
        itcnt[...] = jnp.full((b_tile, zp), max_iterations, jnp.int32)

        def sweep(first: bool):
            cur = list(final_dom)
            for r, edges in enumerate(rows):
                if not first:
                    old_m1 = min1[r]
                    old_m2 = min2[r]
                    old_am = amin[r]
                    old_sb = signs[r]
                    old_sp = sprod[r]

                v2cs = []
                new_m1 = jnp.full((b_tile, zp), LLR_MAX, jnp.int32)
                new_m2 = jnp.full((b_tile, zp), LLR_MAX, jnp.int32)
                new_am = jnp.zeros((b_tile, zp), jnp.int32)
                new_sp = jnp.zeros((b_tile, zp), jnp.int32)
                new_sb = jnp.zeros((b_tile, zp), jnp.int32)
                for e, (c, s) in enumerate(edges):
                    delta = (cur[c] - s) % z
                    soft_chk = rollb(soft[c], delta)
                    if first:
                        v2c = soft_chk
                    else:
                        old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                        old_mag = jnp.where(old_am == e, old_m2, old_m1)
                        c2v_old = jnp.where((old_sp ^ old_sign_e) == 1,
                                            -old_mag, old_mag)
                        v2c = _sat_sub(soft_chk, c2v_old)
                    v2cs.append(v2c)

                    absv = jnp.abs(v2c)
                    sign = (v2c < 0).astype(jnp.int32)
                    is_min = absv < new_m1
                    new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                    new_am = jnp.where(is_min, e, new_am)
                    new_m1 = jnp.where(is_min, absv, new_m1)
                    new_sp = new_sp ^ sign
                    new_sb = new_sb | (sign << e)

                s_m1 = _scale(new_m1, scaling_factor)
                s_m2 = _scale(new_m2, scaling_factor)

                for e, (c, s) in enumerate(edges):
                    v2c = v2cs[e]
                    sign_e = jnp.bitwise_and(new_sb >> e, 1)
                    mag = jnp.where(new_am == e, s_m2, s_m1)
                    c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                    soft[c] = _promotion_sum(c2v, v2c)
                    cur[c] = s

                min1[r] = s_m1
                min2[r] = s_m2
                amin[r] = new_am
                signs[r] = new_sb
                sprod[r] = new_sp

        def crc_and_snapshot(it):
            # Packed-int32 CRC per lane; parity reduced per z-wide block.
            acc = jnp.zeros((b_tile, zp), jnp.int32)
            for c in range(g.kb):
                hard = (soft[c] <= 0).astype(jnp.int32)
                acc = acc ^ (hard * mask_ref[c])
            ok_lane = jnp.zeros((b_tile, zp), jnp.int32)
            for k in range(kpack):
                blk = lane_blk == k
                bad = jnp.zeros((b_tile, 1), jnp.int32)
                for j in range(crc_order):
                    bad = bad | (jnp.sum(
                        jnp.where(blk, (acc >> j) & 1, 0),
                        axis=1, keepdims=True) % 2)
                ok_lane = jnp.where(blk, (bad == 0).astype(jnp.int32), ok_lane)

            newly = ok_lane * (1 - done[...])
            for c in range(g.kb):
                out_soft[c] = jnp.where(newly > 0, soft[c], out_soft[c])
            itcnt[...] = jnp.where(newly > 0, it + 1, itcnt[...])
            done[...] = done[...] + newly
            return jnp.min(done[...]).astype(jnp.int32)

        sweep(True)
        alldone0 = crc_and_snapshot(jnp.int32(0))

        def cond(carry):
            it, alldone = carry
            return jnp.logical_and(it < max_iterations, alldone == 0)

        def body(carry):
            it, _ = carry
            sweep(False)
            return it + 1, crc_and_snapshot(it)

        jax.lax.while_loop(cond, body, (jnp.int32(1), alldone0))

        dmask = done[...]
        rollb_out = _make_block_roller(z, zp, lane_mod)
        for c in range(g.kb):
            final = jnp.where(dmask > 0, out_soft[c], soft[c])
            back = rollb_out(final, final_dom[c] % z)
            clipped = jnp.clip(back, -LLR_INFTY, LLR_INFTY)
            for k in range(kpack):
                # Unpack rolls stay int32: Mosaic rotates are 32-bit only.
                unk = (pltpu.roll(clipped, (zp - k * z) % zp, axis=1)
                       if (k * z) % zp else clipped)
                out_ref[:, k, c, :] = unk.astype(jnp.int8)
        ok_ref[...] = dmask.astype(jnp.int8)
        it_ref[...] = itcnt[...]

    return kernel, g, tuple(final_dom)


@functools.lru_cache(maxsize=None)
def _packed_crc_mask_lanes(crc_name: str, kp: int, kb: int, z: int, zp: int,
                           kpack: int, final_dom: tuple[int, ...]) -> np.ndarray:
    """(kb, 1, zp) int32 CRC mask for the packed lane layout: the per-column
    z-length mask of `_packed_crc_mask`, block-rotated into the stored
    domain, replicated at each of the kpack block offsets; pad lanes zero."""
    base = _packed_crc_mask(crc_name, kp, kb, z, final_dom)[:, 0, :]  # (kb, z)
    out = np.zeros((kb, zp), np.int32)
    for k in range(kpack):
        out[:, k * z:(k + 1) * z] = base
    return out[:, None, :].copy()


def _ldpc_decode_pallas_es_packed(llrs, bg, z, crc_name, nof_crc_covered_bits,
                                  max_iterations, scaling_factor, b_tile):
    """Packed-lane early-stop decode path for z % 128 != 0 (see _pack_plan)."""
    from ..crc import POLYS

    TRACE_STATS["packed"] += 1
    order, _ = POLYS[crc_name]
    zp, kpack = _pack_plan(z)
    kernel, g, final_dom = _make_kernel_packed_es_bm(
        bg, z, zp, kpack, max_iterations, float(scaling_factor), b_tile, order)
    mask = _packed_crc_mask_lanes(crc_name, nof_crc_covered_bits, g.kb, z, zp,
                                  kpack, final_dom)
    lane = np.arange(zp, dtype=np.int32)
    lane_tab = np.stack([lane % z, lane // z])  # (2, zp)

    b = llrs.shape[0]
    pad = (-b) % (b_tile * kpack)
    if pad:
        llrs = jnp.concatenate(
            [llrs, jnp.full((pad, llrs.shape[1]), LLR_INFTY, llrs.dtype)], 0)
    bp = llrs.shape[0]
    nrows = bp // kpack
    x = llrs.reshape(bp, g.n_full - 2, z)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, zp - z)))
    x = x.reshape(nrows, kpack, g.n_full - 2, zp)

    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    out, ok, iters = pl.pallas_call(
        kernel,
        grid=(nrows // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, kpack, g.n_full - 2, zp),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g.kb, 1, zp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, zp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, kpack, g.kb, zp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, zp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, zp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, kpack, g.kb, zp), jnp.int8),
            jax.ShapeDtypeStruct((nrows, zp), jnp.int8),
            jax.ShapeDtypeStruct((nrows, zp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g.n_full, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.m, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.m, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.m, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.m, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.m, b_tile, zp), jnp.int32),
            pltpu.VMEM((g.kb, b_tile, zp), jnp.int32),
            pltpu.VMEM((b_tile, zp), jnp.int32),
            pltpu.VMEM((b_tile, zp), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            # Small-z totals fit whole operands in VMEM, blowing the default
            # 16 MB scoped budget once scratch is added; state the real need.
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(mask), jnp.asarray(lane_tab))
    soft_info = out[:, :, :, :z].reshape(bp, g.kb * z)[:b]
    # Per-block verdicts sit at each block's first lane.
    ok_b = ok[:, 0:kpack * z:z].reshape(bp)[:b].astype(bool)
    it_b = iters[:, 0:kpack * z:z].reshape(bp)[:b]
    hard = (((soft_info.astype(jnp.int32) - 1) >> 7) & 1).astype(jnp.uint8)
    return hard, soft_info, ok_b, it_b


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def ldpc_decode_pallas_es_bm(
    llrs,
    bg: BaseGraph,
    z: int,
    crc_name: str,
    nof_crc_covered_bits: int,
    max_iterations: int = 6,
    scaling_factor: float = 0.8,
    b_tile: int = 16,
):
    """Batch-major early-stop decoder (production path).

    Same contract as `ldpc_decode_pallas_es` — bit-exact results — but the
    input stays (B, N) reshaped to (B, nv-2, z) with NO cross-batch int8
    transpose (the round-2 profile's dominant "data formatting" cost) and
    outputs come back batch-major.  Kernel state is int32: Mosaic's
    dynamic_rotate is 32-bit-only on this toolchain, so the int16
    double-density variant does not compile.
    """
    from ..crc import POLYS

    if z % 128 != 0:
        # Non-vreg-aligned lifting sizes run the packed-lane kernel: state
        # padded to zp % 128 == 0 lanes (Mosaic rolls corrupt otherwise),
        # block-cyclic rotation as two rolls + select, kpack codeblocks per
        # lane row (see _pack_plan).  Bit-exact vs the XLA program.
        return _ldpc_decode_pallas_es_packed(
            llrs, bg, z, crc_name, nof_crc_covered_bits, max_iterations,
            scaling_factor, b_tile)

    TRACE_STATS["es_bm"] += 1
    order, _ = POLYS[crc_name]
    kernel, g, final_dom = _make_kernel_delta_es_bm(
        bg, z, max_iterations, float(scaling_factor), b_tile, order)
    mask = _packed_crc_mask(crc_name, nof_crc_covered_bits, g.kb, z, final_dom)
    b = llrs.shape[0]
    pad = (-b) % b_tile
    if pad:
        llrs = jnp.concatenate(
            [llrs, jnp.full((pad, llrs.shape[1]), LLR_INFTY, llrs.dtype)], 0)
    bp = llrs.shape[0]
    x = llrs.reshape(bp, g.n_full - 2, z)

    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    out, ok, iters = pl.pallas_call(
        kernel,
        grid=(bp // b_tile,),
        in_specs=[
            pl.BlockSpec((b_tile, g.n_full - 2, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.kb, 1, z), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b_tile, g.kb, z), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, z), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, z), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bp, g.kb, z), jnp.int8),
            jax.ShapeDtypeStruct((bp, z), jnp.int8),
            jax.ShapeDtypeStruct((bp, z), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g.n_full, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.kb, b_tile, z), jnp.int32),
            pltpu.VMEM((b_tile, z), jnp.int32),
            pltpu.VMEM((b_tile, z), jnp.int32),
        ],
        interpret=interpret,
    )(x, jnp.asarray(mask))
    soft_info = out.reshape(bp, g.kb * z)[:b]
    # Arithmetic hard decision (sign bit of soft-1): identical to
    # soft <= 0 but never creates a pred intermediate, whose 4-bit
    # packed tiling makes downstream relayout copies loop-ized.
    hard = (((soft_info.astype(jnp.int32) - 1) >> 7) & 1).astype(jnp.uint8)
    return hard, soft_info, ok[:b, 0].astype(bool), iters[:b, 0]


#: Back-compat alias: the int16 variant's I/O contract lives on in the
#: batch-major int32 kernel (see `_make_kernel_delta_es_bm` docstring).
ldpc_decode_pallas_es16 = ldpc_decode_pallas_es_bm


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6, 7))
def ldpc_decode_pallas_es(
    llrs,
    bg: BaseGraph,
    z: int,
    crc_name: str,
    nof_crc_covered_bits: int,
    max_iterations: int = 6,
    scaling_factor: float = 0.8,
    b_tile: int = DEFAULT_B_TILE,
):
    """Early-stopping delta-roll Pallas decoder.

    llrs (B, N) int8 as in ldpc_decode_pallas.  `crc_name`/`nof_crc_covered_bits`
    describe the CB CRC: the first `nof_crc_covered_bits` systematic bits
    (payload + attached CRC, filler excluded) must form a codeword of the CRC
    polynomial.  Iteration stops per batch tile once every codeblock's CRC
    passes; converged codeblocks' outputs are snapshotted at their convergence
    iteration (bit-exact with the reference's per-CB stop,
    lib/phy/upper/channel_coding/ldpc/ldpc_decoder_impl.cpp:126-134).

    Returns (hard (B, K) uint8, soft_info (B, K) int8, crc_ok (B,) bool,
    nof_iterations_used (B,) int32).
    """
    from ..crc import POLYS

    order, _ = POLYS[crc_name]
    dev0 = jax.devices()[0]
    if (dev0.platform == "tpu" or "TPU" in str(dev0)) and not _tpu_roll_safe(z):
        # Same packed-lane kernel the batch-major entry point uses.
        return _ldpc_decode_pallas_es_packed(
            llrs, bg, z, crc_name, nof_crc_covered_bits, max_iterations,
            scaling_factor, b_tile)
    kernel, g, final_dom = _make_kernel_delta_es(
        bg, z, max_iterations, float(scaling_factor), b_tile, order)
    mask = _packed_crc_mask(crc_name, nof_crc_covered_bits, g.kb, z, final_dom)
    b = llrs.shape[0]
    pad = (-b) % b_tile
    if pad:
        # Pad with +INFTY (strong zero bits): the pad rows' all-zero hard
        # decision passes any CRC, so they never hold the while loop open.
        llrs = jnp.concatenate(
            [llrs, jnp.full((pad, llrs.shape[1]), LLR_INFTY, llrs.dtype)], 0)
    bp = llrs.shape[0]
    x = _transpose01_int8(llrs.reshape(bp, g.n_full - 2, z), True)

    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    out, ok, iters = pl.pallas_call(
        kernel,
        grid=(bp // b_tile,),
        in_specs=[
            pl.BlockSpec((g.n_full - 2, b_tile, z), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g.kb, 1, z), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g.kb, b_tile, z), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, z), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_tile, z), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((g.kb, bp, z), jnp.int8),
            jax.ShapeDtypeStruct((bp, z), jnp.int8),
            jax.ShapeDtypeStruct((bp, z), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((g.n_full, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.kb, b_tile, z), jnp.int32),
            pltpu.VMEM((b_tile, z), jnp.int32),
            pltpu.VMEM((b_tile, z), jnp.int32),
        ],
        interpret=interpret,
    )(x, jnp.asarray(mask))
    soft_info = _transpose01_int8(out, False).reshape(bp, g.kb * z)[:b]
    # Arithmetic hard decision (sign bit of soft-1): identical to
    # soft <= 0 but never creates a pred intermediate, whose 4-bit
    # packed tiling makes downstream relayout copies loop-ized.
    hard = (((soft_info.astype(jnp.int32) - 1) >> 7) & 1).astype(jnp.uint8)
    return hard, soft_info, ok[:b, 0].astype(bool), iters[:b, 0]


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def ldpc_decode_pallas(
    llrs,
    bg: BaseGraph,
    z: int,
    nof_iterations: int = 6,
    scaling_factor: float = 0.8,
    b_tile: int = DEFAULT_B_TILE,
):
    """Pallas decoder. llrs (B, N) int8, N = (n_full-2)*z; filler bits = +127.

    Returns (hard (B, K) uint8, soft_info (B, K) int8), identical to
    ops.ldpc.decode.ldpc_decode.
    """
    dev0 = jax.devices()[0]
    if (dev0.platform == "tpu" or "TPU" in str(dev0)) and not _tpu_roll_safe(z):
        from .decode import ldpc_decode as _xla_decode

        return _xla_decode(llrs, bg, z, nof_iterations=nof_iterations,
                           scaling_factor=scaling_factor)
    kernel, g = _make_kernel(bg, z, nof_iterations, float(scaling_factor), b_tile)
    b = llrs.shape[0]
    pad = (-b) % b_tile
    if pad:
        llrs = jnp.concatenate([llrs, jnp.zeros((pad, llrs.shape[1]), llrs.dtype)], 0)
    bp = llrs.shape[0]
    # (B, N) -> (NV-2, B, Z)
    x = jnp.transpose(llrs.reshape(bp, g.n_full - 2, z), (1, 0, 2))

    # Interpreter mode off-TPU (CPU tests); compiled Mosaic on real hardware.
    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    out = pl.pallas_call(
        kernel,
        grid=(bp // b_tile,),
        in_specs=[pl.BlockSpec((g.n_full - 2, b_tile, z), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g.kb, b_tile, z), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g.kb, bp, z), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((g.n_full, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    # (KB, B, Z) -> (B, K)
    soft_info = jnp.transpose(out, (1, 0, 2)).reshape(bp, g.kb * z)[:b]
    # Arithmetic hard decision (sign bit of soft-1): identical to
    # soft <= 0 but never creates a pred intermediate, whose 4-bit
    # packed tiling makes downstream relayout copies loop-ized.
    hard = (((soft_info.astype(jnp.int32) - 1) >> 7) & 1).astype(jnp.uint8)
    return hard, soft_info


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def ldpc_decode_pallas_v3(
    llrs,
    bg: BaseGraph,
    z: int,
    nof_iterations: int = 6,
    scaling_factor: float = 0.8,
    b_tile: int = DEFAULT_B_TILE,
):
    """Delta-roll variant of the unrolled kernel (half the lane rotations);
    bit-exact vs ldpc_decode_pallas / ops.ldpc.decode.ldpc_decode."""
    dev0 = jax.devices()[0]
    if (dev0.platform == "tpu" or "TPU" in str(dev0)) and not _tpu_roll_safe(z):
        from .decode import ldpc_decode as _xla_decode

        return _xla_decode(llrs, bg, z, nof_iterations=nof_iterations,
                           scaling_factor=scaling_factor)
    kernel, g = _make_kernel_delta(bg, z, nof_iterations, float(scaling_factor),
                                   b_tile)
    b = llrs.shape[0]
    pad = (-b) % b_tile
    if pad:
        llrs = jnp.concatenate([llrs, jnp.zeros((pad, llrs.shape[1]), llrs.dtype)], 0)
    bp = llrs.shape[0]
    x = jnp.transpose(llrs.reshape(bp, g.n_full - 2, z), (1, 0, 2))

    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    out = pl.pallas_call(
        kernel,
        grid=(bp // b_tile,),
        in_specs=[pl.BlockSpec((g.n_full - 2, b_tile, z), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g.kb, b_tile, z), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g.kb, bp, z), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((g.n_full, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
        ],
        interpret=interpret,
    )(x)
    soft_info = jnp.transpose(out, (1, 0, 2)).reshape(bp, g.kb * z)[:b]
    # Arithmetic hard decision (sign bit of soft-1): identical to
    # soft <= 0 but never creates a pred intermediate, whose 4-bit
    # packed tiling makes downstream relayout copies loop-ized.
    hard = (((soft_info.astype(jnp.int32) - 1) >> 7) & 1).astype(jnp.uint8)
    return hard, soft_info
