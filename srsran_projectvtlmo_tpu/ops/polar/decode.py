"""Batched successive-cancellation polar decoder.

Min-sum f/g recursion over the code tree, unrolled at trace time for the static
(N, frozen set, PC set) of a PolarCode; the batch axis carries PDCCH candidates
/ UCI words.  Parity-check bits reuse the allocator's 5-stage cyclic register,
threaded through the (inherently sequential) leaf order.

The reference implements SSC with rate-0/rate-1 node pruning over int8 LLRs
(reference: lib/phy/upper/channel_coding/polar/polar_decoder_impl.cpp:209-374);
this version keeps plain SC over float32 internals -- identical hard decisions
at the operating SNRs, with node pruning left to XLA's simplifications.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .code import PolarCode


@functools.lru_cache(maxsize=None)
def _decode_fn(code: PolarCode):
    frozen = code.frozen_mask
    pc_set = set(code.pc_set.tolist())

    def leaf(i: int, llr, reg):
        # Rotate the PC register (always, for every leaf index).
        reg = (reg[1], reg[2], reg[3], reg[4], reg[0])
        if frozen[i]:
            bit = jnp.zeros(llr.shape, jnp.uint8)
        elif i in pc_set:
            bit = reg[0]
        else:
            bit = (llr <= 0).astype(jnp.uint8)
            reg = (reg[0] ^ bit, reg[1], reg[2], reg[3], reg[4])
        return bit, reg

    def rec(llr, base: int, reg):
        m = llr.shape[-1]
        if m == 1:
            bit, reg = leaf(base, llr[..., 0], reg)
            return bit[..., None], bit[..., None], reg
        half = m // 2
        a, b = llr[..., :half], llr[..., half:]
        f = jnp.sign(a) * jnp.sign(b) * jnp.minimum(jnp.abs(a), jnp.abs(b))
        xl, ul, reg = rec(f, base, reg)
        g = b + (1.0 - 2.0 * xl.astype(llr.dtype)) * a
        xr, ur, reg = rec(g, base + half, reg)
        return jnp.concatenate([xl ^ xr, xr], -1), jnp.concatenate([ul, ur], -1), reg

    @jax.jit
    def decode(llrs):
        x = llrs.astype(jnp.float32)
        b = x.shape[:-1]
        reg = tuple(jnp.zeros(b, jnp.uint8) for _ in range(5))
        _, u, _ = rec(x, 0, reg)
        return u

    return decode


def polar_decode(llrs, code: PolarCode):
    """(B, N) LLRs (int8 or float; positive = bit 0) -> (B, N) decoded u."""
    return _decode_fn(code)(llrs)
