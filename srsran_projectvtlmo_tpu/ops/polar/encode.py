"""Polar encoder: log2(N) butterfly XOR stages, batched.

u -> x = u G_N with G_N = F^{xor n}, F = [[1,0],[1,1]]: at stage s, pairs at
distance N/2^{s+1} combine as (a, b) -> (a xor b, b).
reference: lib/phy/upper/channel_coding/polar/polar_encoder_impl.cpp:31-55
(recursive halves then XOR of the first half with the second).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(1,))
def polar_encode(u, code_size_log: int):
    """(B, N) uint8 -> (B, N) uint8 codeword."""
    n = code_size_log
    b = u.shape[0]
    x = u
    # Recursive structure flattened: for block size 2^(s+1), first half ^= second.
    for s in range(n):
        half = 1 << s
        x = x.reshape(b, -1, 2, half)
        first = x[:, :, 0, :] ^ x[:, :, 1, :]
        x = jnp.stack([first, x[:, :, 1, :]], axis=2).reshape(b, -1)
    return x
