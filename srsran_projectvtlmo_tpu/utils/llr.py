"""int8 log-likelihood-ratio semantics.

LLRs are int8 in [-LLR_MAX, LLR_MAX] with the reserved values +/-LLR_INFTY = +/-127
marking *fixed* bits (bit surely 0 -> +127, surely 1 -> -127).  Positive LLR means
bit 0.  Semantics mirror the reference LLR type (reference:
include/srsran/phy/upper/log_likelihood_ratio.h:43-45,150-156 and
lib/phy/upper/log_likelihood_ratio.cpp:39-87):

 * saturating add clips at +/-LLR_MAX, with special rules when a summand is
   infinite: a + (-a) = 0 (covers INF + -INF), otherwise INF dominates;
 * promotion sum: like the saturating add but overflow promotes to +/-LLR_INFTY
   (used by the HARQ soft-combiner);
 * quantize: clip a float to +/-range_limit then round-half-away to int8 scale
   LLR_MAX (std::round semantics);
 * hard bit: value <= 0 -> 1.

All functions work on jnp or numpy arrays and are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

LLR_MAX = 120
LLR_INFTY = 127


def _is_inf(x):
    return jnp.abs(x.astype(jnp.int32)) == LLR_INFTY


def llr_saturating_add(a, b):
    """Element-wise saturated LLR sum with infinity handling. int8 in, int8 out."""
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    plain = jnp.clip(a32 + b32, -LLR_MAX, LLR_MAX)
    # Special cases: a == -b -> 0 (also resolves INF + -INF); else any INF dominates.
    out = jnp.where(_is_inf(a), a32, jnp.where(_is_inf(b), b32, plain))
    out = jnp.where(a32 == -b32, 0, out)
    return out.astype(jnp.int8)


def llr_promotion_sum(a, b):
    """Saturated sum that promotes overflow to +/-LLR_INFTY (HARQ combining)."""
    a32 = a.astype(jnp.int32)
    b32 = b.astype(jnp.int32)
    s = a32 + b32
    plain = jnp.where(jnp.abs(s) > LLR_MAX, jnp.sign(s) * LLR_INFTY, s)
    out = jnp.where(_is_inf(a), a32, jnp.where(_is_inf(b), b32, plain))
    out = jnp.where(a32 == -b32, 0, out)
    return out.astype(jnp.int8)


def llr_quantize(value, range_limit: float):
    """Clip float LLRs to +/-range_limit and quantize to int8 with scale LLR_MAX.

    Rounding is round-half-away-from-zero to match C++ std::round
    (reference: lib/phy/upper/log_likelihood_ratio.cpp:88-97).
    """
    clipped = jnp.clip(value, -range_limit, range_limit)
    scaled = clipped / range_limit * LLR_MAX
    return _round_half_away(scaled).astype(jnp.int8)


def _round_half_away(x):
    return jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5)


def llr_to_hard_bit(llr):
    """value <= 0 -> bit 1 (null LLR resolves to 1 by convention)."""
    return (llr <= 0).astype(jnp.uint8)
