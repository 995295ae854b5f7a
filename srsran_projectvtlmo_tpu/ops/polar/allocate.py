"""Polar sub-channel allocation / deallocation (TS 38.212 Section 5.3.1.2).

Message bits map to the information set positions; when parity-check bits are
present (K <= 25, nPC = 3), their values come from a length-5 cyclic shift
register driven by the preceding message bits
(reference: lib/phy/upper/channel_coding/polar/polar_allocator_impl.cpp:27-69).

The register is linear over GF(2), so its effect is precomputed per code as a
(K, nPC) bit matrix: on device, PC bits are one small matmul mod 2, and the
allocation itself is a static scatter -- no sequential scan.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from .code import PolarCode


@functools.lru_cache(maxsize=None)
def pc_matrix(code: PolarCode) -> np.ndarray:
    """(K, nPC) uint8: pc_bits = message @ pc_matrix mod 2."""
    if code.n_pc == 0:
        return np.zeros((code.K, 0), dtype=np.uint8)
    k_set = set(code.k_set.tolist())
    pc_set = set(code.pc_set.tolist())
    # Symbolically run the shift register with message-bit indicator vectors.
    y = [np.zeros(code.K, dtype=np.uint8) for _ in range(5)]
    cols = []
    i_k = 0
    pc_rows = []
    for i in range(code.N):
        y = [y[1], y[2], y[3], y[4], y[0]]
        if i in k_set:
            if i in pc_set:
                pc_rows.append((i, y[0].copy()))
            else:
                y[0] = y[0].copy()
                y[0][i_k] ^= 1
                i_k += 1
    assert i_k == code.K and len(pc_rows) == code.n_pc
    # Order PC rows by position (pc_set is sorted; iteration order already is).
    mat = np.stack([row for _, row in pc_rows], axis=1)
    return mat.astype(np.uint8)


@functools.lru_cache(maxsize=None)
def _alloc_tables(code: PolarCode):
    k_set = code.k_set
    pc_set = set(code.pc_set.tolist())
    msg_positions = np.asarray([p for p in k_set if p not in pc_set], dtype=np.int64)
    pc_positions = code.pc_set
    return msg_positions, pc_positions


def polar_allocate(message, code: PolarCode):
    """(B, K) uint8 message -> (B, N) uint8 encoder input u."""
    msg_pos, pc_pos = _alloc_tables(code)
    b = message.shape[0]
    u = jnp.zeros((b, code.N), jnp.uint8)
    u = u.at[:, jnp.asarray(msg_pos)].set(message)
    if code.n_pc:
        mat = jnp.asarray(pc_matrix(code), dtype=jnp.float32)
        pc = jnp.mod(jnp.matmul(message.astype(jnp.float32), mat).astype(jnp.int32), 2)
        u = u.at[:, jnp.asarray(pc_pos)].set(pc.astype(jnp.uint8))
    return u


def polar_deallocate(u, code: PolarCode):
    """(B, N) decoded u -> (B, K) message bits (PC positions dropped)."""
    msg_pos, _ = _alloc_tables(code)
    return jnp.take(u, jnp.asarray(msg_pos), axis=-1)
