"""Program warmup: precompile slot-program variants ahead of real-time use.

Sequences (DM-RS, scrambling) depend on the slot index within the frame, so a
steady-state cell needs one compiled program per slot variant.  The reference
pre-instantiates processor pools per slot (reference: lib/phy/upper/
upper_phy_factories.cpp downlink/uplink_processor_pool, processor_pool_helpers.h);
here the pool is the jit cache, filled by running each variant once on dummy
inputs.  Combine with a persistent JAX compilation cache to amortize across
process restarts.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

import jax
import jax.numpy as jnp


def slots_per_frame(numerology: int) -> int:
    return 10 * (1 << numerology)


def precompile_pusch(cfg, nof_slots: int | None = None, *, progress=None):
    """Compile the PUSCH rx (and matching tx) for every slot variant.

    Args:
      cfg: a PuschRxConfig (slot field is overridden per variant).
      nof_slots: variants to compile (default: one frame).
      progress: optional callback(slot, seconds).

    Returns dict slot -> (tx_fn, rx_fn).
    """
    from ..models.pusch_rx import cached_pusch_rx
    from ..models.ulsch_tx import cached_ulsch_tx
    from ..ops.ofdm import slot_sample_count

    n = nof_slots if nof_slots is not None else slots_per_frame(cfg.numerology)
    out = {}
    rng = np.random.default_rng(0)
    for slot in range(n):
        t0 = time.perf_counter()
        c = dataclasses.replace(cfg, slot=slot)
        tx = cached_ulsch_tx(c)
        rx = cached_pusch_rx(c)
        tb = jnp.asarray(rng.integers(0, 2, (1, c.tbs)).astype(np.uint8))
        _, samples = tx(tb)
        result = rx(jax.block_until_ready(samples)[:, None]
                    if c.nof_layers == 1 else jax.block_until_ready(samples))
        jax.block_until_ready(result["tb_crc_ok"])
        out[slot] = (tx, rx)
        if progress:
            progress(slot, time.perf_counter() - t0)
    return out
