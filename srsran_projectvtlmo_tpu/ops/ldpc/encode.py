"""LDPC systematic encoder (TS 38.212 Section 5.3.2) as a batched XLA program.

The reference encodes with sparse XOR accumulations and four hand-picked
high-rate-region strategies per (BG, lifting index)
(reference: lib/phy/upper/channel_coding/ldpc/ldpc_encoder_generic.cpp:33-121).
Here the strategy is derived structurally from the tables (graphs.EncodePlan)
and the whole encode is one fused batched program:

  1. lambda_r = XOR over info edges of row r of rotated info blocks (gather +
     one-hot matmul reduction over GF(2), exact in int32);
  2. core parity p0 from the telescoped XOR of the four core lambdas;
  3. p1..p3 by verified back-substitution;
  4. extension parities directly from their rows.

Layout: bits live as (batch, node, Z) uint8; rotation by s is a gather at
index (z + s) mod Z, matching H[(r,i),(c,j)] = 1 iff j = (i + s) mod Z.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ran.ldpc_params import BaseGraph
from .graphs import LdpcGraph, get_graph


@functools.lru_cache(maxsize=None)
def _encode_tables(bg: BaseGraph, z: int):
    """Precomputed numpy gather/scatter tables for the jitted encoder."""
    g = get_graph(bg, z)
    kb, m = g.kb, g.m
    shifts = g.shifts

    info_edges = [(r, c, shifts[r, c]) for r in range(m) for c in range(kb) if shifts[r, c] >= 0]
    rows = np.array([e[0] for e in info_edges], dtype=np.int32)
    cols = np.array([e[1] for e in info_edges], dtype=np.int32)
    ss = np.array([e[2] for e in info_edges], dtype=np.int32)
    zz = np.arange(z, dtype=np.int32)
    rot_idx = (zz[None, :] + ss[:, None]) % z  # (E, Z)
    # One-hot row scatter matrix for the XOR reduction (E, M), used as matmul.
    row_onehot = np.zeros((len(rows), m), dtype=np.float32)
    row_onehot[np.arange(len(rows)), rows] = 1.0

    # Per core row, (parity_local, shift) pairs for back-substitution terms.
    core_parity = [[(p, shifts[r, kb + p]) for p in range(4) if shifts[r, kb + p] >= 0] for r in range(m)]
    return g, rot_idx, cols, row_onehot, core_parity


def _rot(v, s: int, z: int):
    """rot_s(v)[..., i] = v[..., (i+s) mod z] -- roll left by s (static shift)."""
    if s % z == 0:
        return v
    return jnp.roll(v, -s, axis=-1)


def ldpc_encode(info_bits, bg: BaseGraph, z: int):
    """Encode (B, K) uint8 info bits (filler bits must be 0) -> (B, N_full * Z).

    Output contains all variable nodes including the two punctured systematic
    blocks; slice [2Z:] for the rate-matching buffer.
    """
    return _encode_jit(info_bits, bg, z)


def _encode_core(info, b, z: int, g, bg: BaseGraph, zero_fn):
    """Shared XOR/roll structure over (b, kb, z) blocks of any integer dtype
    (uint8 bits, or int32 words carrying 32 bit-packed codeblocks)."""
    kb, m = g.kb, g.m

    # lambda_r = XOR over the row's info edges of statically-rolled blocks.
    # Every shift is a trace-time constant, so each term is a cheap
    # slice-pair roll and the whole pass is one elementwise XOR fusion — the
    # previous take_along_axis formulation materialized a (B, E, Z) general
    # gather that dominated the DL slot program's device time.
    shifts = g.shifts
    lam_list = []
    for r in range(m):
        acc = None
        for c in range(kb):
            s = int(shifts[r, c])
            if s >= 0:
                t = _rot(info[:, c], s, z)
                acc = t if acc is None else acc ^ t
        lam_list.append(acc if acc is not None else zero_fn())
    lam = jnp.stack(lam_list, axis=1)  # (B, M, Z)

    # Core parity solve.
    plan = g.encode_plan
    core_l = lam[:, 0] ^ lam[:, 1] ^ lam[:, 2] ^ lam[:, 3]
    p = [None] * 4
    # rot_a(p0) = L  =>  p0 = rot_{-a}(L).
    p[0] = _rot(core_l, (z - plan.p0_shift % z) % z, z)
    for local, r in plan.solve_order:
        acc = lam[:, r]
        for q, s in _core_parity_terms(bg, z, r):
            if q != local:
                acc = acc ^ _rot(p[q], s, z)
        p[local] = acc

    # Extension parities: rows 4..M-1, one new parity each with identity diagonal.
    ext = []
    for r in range(4, m):
        acc = lam[:, r]
        for q, s in _core_parity_terms(bg, z, r):
            acc = acc ^ _rot(p[q], s, z)
        ext.append(acc)

    parity = jnp.stack(p + ext, axis=1)  # (B, M, Z)
    return jnp.concatenate([info, parity], axis=1)  # (B, N_full, Z)


#: Batch size from which the bit-packed encode pays for its pack/unpack.
_PACK_THRESHOLD = 8


@functools.partial(jax.jit, static_argnums=(1, 2))
def _encode_jit(info_bits, bg: BaseGraph, z: int):
    g, rot_idx, cols, row_onehot, core_parity = _encode_tables(bg, z)
    kb = g.kb
    b = info_bits.shape[0]

    if b >= _PACK_THRESHOLD:
        # Bit-pack the codeblock batch onto int32 lanes: 32 codeblocks per
        # word, so the ~|E| XOR+roll passes touch 32x less data — the analog
        # of the reference encoder processing Z-node SIMD lanes
        # (reference: ldpc_encoder_avx2.cpp), with the vector axis here being
        # the CB batch.  Bit-exact: XOR and cyclic rolls act per bit lane.
        words = -(-b // 32)
        pad = words * 32 - b
        bits = info_bits
        if pad:
            bits = jnp.concatenate(
                [bits, jnp.zeros((pad, bits.shape[1]), bits.dtype)], 0)
        iw = bits.reshape(words, 32, kb, z).astype(jnp.int32)
        weights = jnp.asarray(np.left_shift(
            np.uint32(1), np.arange(32, dtype=np.uint32)).view(np.int32))
        packed = jnp.sum(iw * weights[None, :, None, None], axis=1,
                         dtype=jnp.int32)
        out_w = _encode_core(packed, words, z, g, bg,
                             lambda: jnp.zeros((words, z), jnp.int32))
        # Unpack: (words, NV, Z) int32 -> (words*32, NV*Z) uint8 bits.
        shifts32 = jnp.arange(32, dtype=jnp.int32)
        bits_out = ((out_w[:, None] >> shifts32[None, :, None, None]) & 1
                    ).astype(jnp.uint8)
        return bits_out.reshape(words * 32, -1)[:b]

    info = info_bits.reshape(b, kb, z)
    out = _encode_core(info, b, z, g, bg,
                       lambda: jnp.zeros((b, z), jnp.uint8))
    return out.reshape(b, -1)


def _core_parity_terms(bg: BaseGraph, z: int, row: int):
    return _encode_tables(bg, z)[4][row]
