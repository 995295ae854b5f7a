"""Standalone time-alignment estimator (IDFT of pilot products -> peak search).

reference: lib/phy/support/time_alignment_estimator/
time_alignment_estimator_dft_impl.cpp:45-76.  The PUSCH/SRS estimators use the
same logic fused inside ops/channel_estimate.py; this standalone version serves
callers that already hold per-pilot LSE products.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..utils.cplx import to_cplx


@functools.partial(jax.jit, static_argnums=(1, 2))
def estimate_time_alignment(lse_pair, stride_re: int = 1, scs_hz: float = 30e3):
    """(..., npilots, 2) pilot LSE products -> TA seconds (...,).

    The pilot spacing is stride_re * scs_hz in frequency; the estimate is the
    (signed, wrapped) argmax of the zero-padded IDFT power.
    """
    lse = to_cplx(lse_pair)
    npil = lse.shape[-1]
    nfft = 1
    while nfft < 4 * npil:
        nfft <<= 1
    imp = jnp.fft.ifft(lse, n=nfft, axis=-1)
    power = jnp.abs(imp) ** 2
    peak = jnp.argmax(power, axis=-1)
    delay_idx = jnp.where(peak > nfft // 2, peak - nfft, peak)
    return delay_idx.astype(jnp.float32) / (nfft * stride_re * scs_hz)
