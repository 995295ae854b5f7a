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
    """(..., nsym, 2) equalized symbols -> scalar EVM per leading batch (...)."""
    c_pair, c_norm, _ = _demap_tables(mod)
    cross = jnp.matmul(symbols_pair.astype(jnp.float32), jnp.asarray(c_pair).T,
                       preferred_element_type=jnp.float32)
    metric = jnp.asarray(c_norm)[None, :] - 2.0 * cross  # |c|^2 - 2 Re(y c*)
    best = jnp.argmin(metric, axis=-1)
    nearest = jnp.take(jnp.asarray(c_pair), best, axis=0)  # (..., nsym, 2)
    err = jnp.sum((symbols_pair - nearest) ** 2, axis=-1)
    return jnp.sqrt(jnp.mean(err, axis=-1))
