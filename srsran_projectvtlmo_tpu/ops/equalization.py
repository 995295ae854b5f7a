"""Channel equalization: MMSE/ZF for SIMO and MIMO resource elements.

The 1xN SIMO closed form follows the reference exactly, including its
unit-combined-gain normalization and degenerate-input handling
(reference: lib/phy/upper/equalization/equalize_mmse_1xn.h:44-96).  The general
L-layer case runs as batched small hermitian solves per RE (the reference
dispatches on port count, lib/phy/upper/equalization/
channel_equalizer_generic_impl.cpp:99-119).

All I/O uses real-pair arrays; per-RE small-matrix math is jit-internal complex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.cplx import to_cplx, from_cplx


def equalize_mmse_1xn(y_pair, h_pair, noise_var_port, tx_scaling: float = 1.0):
    """MMSE equalization of a single-layer transmission over N rx ports.

    Args:
      y_pair: (..., nre, nports, 2) received REs.
      h_pair: (..., nre, nports, 2) channel estimates.
      noise_var_port: (..., nports) per-port noise variance estimates.
      tx_scaling: transmit amplitude scaling applied to the channel.

    Returns:
      (symbols (..., nre, 2), noise_vars (..., nre)): equalized symbols and
      post-equalization noise variances (infinity where degenerate).
    """
    y = to_cplx(y_pair)
    h = to_cplx(h_pair) * tx_scaling
    nvar = jnp.broadcast_to(noise_var_port[..., None, :], y.shape)  # (..., nre, nports)

    ch_norm = jnp.abs(h) ** 2
    ok = jnp.isfinite(ch_norm) & (ch_norm > 0) & jnp.isfinite(nvar) & (nvar > 0)
    ch_norm = jnp.where(ok, ch_norm, 0.0)
    c = jnp.sum(ch_norm, axis=-1)  # sum |h|^2
    nvar_acc = jnp.sum(ch_norm * jnp.where(ok, nvar, 0.0), axis=-1)
    mf = jnp.sum(jnp.where(ok, y * jnp.conj(h), 0.0), axis=-1)

    denom = c * c + nvar_acc
    good = jnp.isfinite(c) & (c > 0) & jnp.isfinite(nvar_acc) & (nvar_acc > 0)
    out = jnp.where(good, mf * c / jnp.where(good, denom, 1.0), 0.0)
    nvars = jnp.where(good, nvar_acc / jnp.where(good, denom, 1.0), jnp.inf)
    return from_cplx(out), nvars


def equalize_mmse_general(y_pair, h_pair, noise_var_port, tx_scaling: float = 1.0):
    """MMSE for L layers over N ports via batched per-RE hermitian solves.

    Args:
      y_pair: (..., nre, nports, 2).
      h_pair: (..., nre, nports, nlayers, 2).
      noise_var_port: (..., nports).

    Returns:
      (symbols (..., nre, nlayers, 2), noise_vars (..., nre, nlayers)).
    """
    y = to_cplx(y_pair)  # (..., R, P)
    h = to_cplx(h_pair) * tx_scaling  # (..., R, P, L)
    nvar = jnp.broadcast_to(noise_var_port[..., None, :], y.shape)  # (..., R, P)

    # Whiten by per-port noise: scale rows by 1/sqrt(nvar).
    w = jax.lax.rsqrt(jnp.maximum(nvar, 1e-38))
    hw = h * w[..., None]
    yw = y * w

    # A = Hw^H Hw + I, rhs = Hw^H yw.
    ah = jnp.conj(jnp.swapaxes(hw, -1, -2))  # (..., R, L, P)
    a = jnp.einsum("...lp,...pk->...lk", ah, hw) + jnp.eye(h.shape[-1], dtype=hw.dtype)
    rhs = jnp.einsum("...lp,...p->...l", ah, yw)
    sol = jnp.linalg.solve(a, rhs[..., None])[..., 0]  # (..., R, L)

    # Per-layer effective gain g_l = [A^{-1} Hw^H Hw]_{ll} = 1 - [A^{-1}]_{ll}.
    a_inv = jnp.linalg.inv(a)
    g = 1.0 - jnp.real(jnp.diagonal(a_inv, axis1=-2, axis2=-1))
    g = jnp.clip(g, 1e-9, 1.0 - 1e-9)
    out = sol / g
    nvars = (1.0 - g) / g
    return from_cplx(out), nvars
