"""Error-vector-magnitude calculator.

EVM per symbol block: RMS distance between equalized symbols and their nearest
(hard-decision) constellation points, normalized by the constellation's RMS
power (= 1 for the unit-energy tables).
reference: lib/phy/upper/channel_modulation/evm_calculator_generic_impl.cpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ran.modulation import Modulation
from .modulation import constellation
from .demodulation import _demap_tables


def evm(symbols_pair, mod: Modulation):
    """(..., nsym, 2) equalized symbols -> scalar EVM per leading batch (...).

    Square Gray QAM uses the separable per-axis nearest-level closed form
    (hot-path cheap: no M-point metric); other constellations fall back to
    the full nearest-point search.
    """
    from .demodulation import _demap_axis_tables

    axis_tabs = _demap_axis_tables(mod)
    x = symbols_pair.astype(jnp.float32)
    if axis_tabs is not None:
        pam, _, _ = axis_tabs
        a = float(pam[1] - pam[0]) / 2.0 if len(pam) > 1 else 1.0
        lo, hi = float(pam[0]), float(pam[-1])
        # Nearest PAM level: odd multiples of a, clamped to the band edges.
        level = jnp.clip((2.0 * jnp.round((x / a - 1.0) / 2.0) + 1.0) * a, lo, hi)
        err = jnp.sum((x - level) ** 2, axis=-1)
        return jnp.sqrt(jnp.mean(err, axis=-1))
    c_pair, c_norm, _ = _demap_tables(mod)
    cross = jnp.matmul(x, jnp.asarray(c_pair).T,
                       preferred_element_type=jnp.float32)
    metric = jnp.asarray(c_norm)[None, :] - 2.0 * cross  # |c|^2 - 2 Re(y c*)
    best = jnp.argmin(metric, axis=-1)
    nearest = jnp.take(jnp.asarray(c_pair), best, axis=0)  # (..., nsym, 2)
    err = jnp.sum((symbols_pair - nearest) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err, axis=-1))
