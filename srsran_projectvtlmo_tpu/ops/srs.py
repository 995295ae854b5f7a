"""Sounding Reference Signal (SRS) generation and channel estimation.

TS 38.211 Section 6.4.1.4: SRS sequences are cyclic shifts of low-PAPR base
sequences on a comb (K_TC = 2 or 4); estimation is a batched correlator per
(rx port, antenna port) followed by the same smoothing/noise machinery as the
DM-RS estimator.
reference: lib/phy/upper/signal_processors/srs/srs_estimator_generic_impl.cpp.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .low_papr import low_papr_sequence
from .channel_estimate import estimate_channel_hop
from ..utils.cplx import to_cplx


@dataclass(frozen=True)
class SrsConfig:
    nof_rb: int
    comb_size: int = 2          # K_TC
    comb_offset: int = 0
    start_symbol: int = 13
    nof_symbols: int = 1
    sequence_id: int = 0        # n_SRS_ID
    cyclic_shift: int = 0
    nof_antenna_ports: int = 1

    @property
    def sequence_length(self) -> int:
        return self.nof_rb * 12 // self.comb_size

    def alpha(self, port: int = 0) -> float:
        n_max = 8 if self.comb_size == 2 else 12
        n_cs = (self.cyclic_shift + n_max * port // self.nof_antenna_ports) % n_max
        return 2 * np.pi * n_cs / n_max


@functools.lru_cache(maxsize=None)
def srs_sequence(cfg: SrsConfig, port: int = 0) -> np.ndarray:
    """(M,) complex64 SRS sequence for one antenna port."""
    u = cfg.sequence_id % 30
    return low_papr_sequence(u, 0, cfg.alpha(port), cfg.sequence_length)


def srs_subcarriers(cfg: SrsConfig) -> np.ndarray:
    return (cfg.comb_offset + cfg.comb_size * np.arange(cfg.sequence_length)).astype(np.int32)


@functools.partial(jax.jit, static_argnums=(1,))
def srs_estimate(rx_symbols_pair, cfg: SrsConfig):
    """Estimate the SRS channel.

    Args:
      rx_symbols_pair: (B, nof_rx_ports, nof_symbols, nof_rb*12, 2) received REs
        of the SRS symbols over the sounded bandwidth.

    Returns dict: ce_pair (B, P, nsubc, 2) wideband estimate per rx port,
      noise_var (B, P), epre (B, P), ta_s (B, P).
    """
    sub = jnp.asarray(srs_subcarriers(cfg))
    ref = srs_sequence(cfg)
    ref_pair = jnp.asarray(np.stack([ref.real, ref.imag], -1).astype(np.float32))
    pilots = rx_symbols_pair[..., sub, :]  # (B, P, S, M, 2)

    def per_port(g):
        return estimate_channel_hop(g, ref_pair, cfg.nof_rb, cfg.comb_size)

    est = jax.vmap(per_port, in_axes=1, out_axes=0)(pilots)
    return {
        "ce_pair": jnp.moveaxis(est["ce_pair"], 0, 1),
        "noise_var": jnp.moveaxis(est["noise_var"], 0, 1),
        "epre": jnp.moveaxis(est["epre"], 0, 1),
        "ta_s": jnp.moveaxis(est["time_alignment_s"], 0, 1),
    }
