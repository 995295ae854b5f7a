"""Soft demodulation (max-log LLRs) for BPSK ... 256QAM.

The reference implements exact max-log LLRs as per-modulation piecewise-linear
interval tables (reference: lib/phy/upper/channel_modulation/
demodulation_mapper_qam16.cpp:36-90, *_qam256.cpp:48-84).  Here the same
max-log values are computed from true constellation distances, which is exact
for Gray-mapped square QAM and maps the hot loop onto the MXU:

    metric(y, c) = |c|^2 - 2 Re(y c*)          (the |y|^2 term cancels)
    llr_b = (min over c: b=1 - min over c: b=0) / noise_var

followed by the reference's quantization: clip at RANGE_LIMIT=20, scale to
int8 LLR_MAX=120 (lib/phy/upper/channel_modulation/*: RANGE_LIMIT_FLOAT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.modulation import Modulation, bits_per_symbol
from ..utils.llr import llr_quantize
from .modulation import constellation

#: Quantization range: float LLR of +/-20 maps to int8 +/-120.
RANGE_LIMIT = 20.0


@functools.lru_cache(maxsize=None)
def _demap_tables(mod: Modulation):
    pts = constellation(mod)  # (M,)
    qm = bits_per_symbol(mod)
    m = len(pts)
    idx = np.arange(m)
    bits = ((idx[:, None] >> np.arange(qm - 1, -1, -1)[None, :]) & 1).astype(bool)  # (M, Qm)
    c_pair = np.stack([pts.real, pts.imag], axis=-1).astype(np.float32)  # (M, 2)
    c_norm = (np.abs(pts) ** 2).astype(np.float32)
    return c_pair, c_norm, bits


def soft_demap(symbols_pair, noise_var, mod: Modulation):
    """Max-log soft demapping.

    Args:
      symbols_pair: (..., nsym, 2) float32 equalized symbols.
      noise_var: (..., nsym) post-equalization noise variance per symbol.
      mod: modulation scheme.

    Returns:
      (..., nsym * Qm) int8 LLRs (positive = bit 0), quantized at range 20.
    """
    c_pair, c_norm, bits = _demap_tables(mod)
    qm = bits_per_symbol(mod)
    if mod == Modulation.PI_2_BPSK:
        # Derotate odd symbols by -pi/2: (re, im) -> (im, -re).
        n = symbols_pair.shape[-2]
        odd = (jnp.arange(n) % 2 == 1)[..., None]
        rot = jnp.stack([symbols_pair[..., 1], -symbols_pair[..., 0]], -1)
        symbols_pair = jnp.where(odd, rot, symbols_pair)
    # (..., nsym, M) distance metrics via one matmul.
    cross = jnp.matmul(symbols_pair.astype(jnp.float32), jnp.asarray(c_pair).T,
                       preferred_element_type=jnp.float32)
    metric = jnp.asarray(c_norm) - 2.0 * cross
    inf = jnp.float32(np.inf)
    llrs = []
    for b in range(qm):
        mask1 = jnp.asarray(bits[:, b])
        min1 = jnp.min(jnp.where(mask1, metric, inf), axis=-1)
        min0 = jnp.min(jnp.where(mask1, inf, metric), axis=-1)
        llrs.append(min1 - min0)
    llr = jnp.stack(llrs, axis=-1)  # (..., nsym, Qm)
    # Scale by 1/noise_var; zero/neg variance yields LLR 0 (reference safe_div).
    nv = noise_var[..., None]
    llr = jnp.where(nv > 0, llr / jnp.maximum(nv, 1e-38), 0.0)
    llr = llr_quantize(llr, RANGE_LIMIT)
    return llr.reshape(llr.shape[:-2] + (llr.shape[-2] * qm,))


def hard_demap(llrs):
    """LLR <= 0 -> bit 1."""
    return (llrs <= 0).astype(jnp.uint8)
