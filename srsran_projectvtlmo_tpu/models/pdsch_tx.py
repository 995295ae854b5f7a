"""PDSCH transmit slot model: the downlink shared-channel end-to-end program.

SCH codeword chain (models.sch_tx) + DM-RS type 1 + OFDM modulation, one fused
jitted program per static configuration.  Replaces the reference's
pdsch_processor_concurrent_impl thread pipeline
(reference: lib/phy/upper/channel_processors/pdsch_processor_concurrent_impl.cpp:31-311);
codeblock parallelism is the LDPC batch axis, cells batch on the leading axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dmrs import dmrs_type1_sequence
from ..ops import ofdm as ofdm_mod
from .sch_config import SchChainConfig
from .sch_tx import build_sch_symbols_tx


@dataclass(frozen=True)
class PdschTxConfig(SchChainConfig):
    dft_size: int = 4096
    numerology: int = 1
    slot: int = 0
    #: Reserved RE patterns (ran.re_pattern.RePattern, ABSOLUTE carrier
    #: PRBs/symbols) the PDSCH rate-matches around — CSI-RS, CORESET
    #: (reference: pdsch_processor_impl.cpp:77-96 compute_nof_data_re).
    #: Patterns shrink nof_data_re (and therefore every rate-match E) and
    #: punch holes in the mapping plan (phy.dl_slot).
    reserved: tuple = ()

    @property
    def nof_data_re(self) -> int:
        base = self.nof_subc * len(self.data_symbols)
        if not self.reserved:
            return base
        from ..ran.re_pattern import inclusion_count

        abs_syms = [self.start_symbol + s for s in self.data_symbols]
        return base - inclusion_count(self.reserved, self.rb_start,
                                      self.nof_rb, abs_syms)


def build_pdsch_tx_slot(cfg: PdschTxConfig):
    """Returns jitted fn: tb_bits (B, TBS) -> (grid_pair (B, 14, nsubc, 2),
    iq samples (B, nsamples, 2))."""
    sch_tx = build_sch_symbols_tx(cfg)
    ref = np.stack([
        dmrs_type1_sequence(cfg.slot, cfg.start_symbol + s, cfg.n_id, cfg.nof_rb,
                            prb_start=cfg.rb_start)
        for s in cfg.dmrs_symbols
    ])
    pil_subc = (2 * np.arange(6 * cfg.nof_rb)).astype(np.int32)
    data_syms = np.asarray(cfg.data_symbols, dtype=np.int32)
    dmrs_syms = np.asarray(cfg.dmrs_symbols, dtype=np.int32)

    @jax.jit
    def tx(tb_bits):
        b = tb_bits.shape[0]
        syms = sch_tx(tb_bits)
        data_grid = syms.reshape(b, len(cfg.data_symbols), cfg.nof_subc)
        grid = jnp.zeros((b, cfg.nof_ofdm_symbols, cfg.nof_subc), jnp.complex64)
        grid = grid.at[:, data_syms, :].set(data_grid)
        pil = jnp.zeros((len(cfg.dmrs_symbols), cfg.nof_subc), jnp.complex64)
        pil = pil.at[:, pil_subc].set(jnp.asarray(ref))
        grid = grid.at[:, dmrs_syms, :].set(jnp.broadcast_to(pil[None], (b,) + pil.shape))
        grid_pair = jnp.stack([jnp.real(grid), jnp.imag(grid)], -1).astype(jnp.float32)
        samples = ofdm_mod.ofdm_modulate(
            grid_pair, cfg.dft_size, cfg.numerology, cfg.slot % (1 << cfg.numerology)
        )
        return grid_pair, samples

    return tx


@functools.lru_cache(maxsize=None)
def _cached_tx(cfg: PdschTxConfig):
    return build_pdsch_tx_slot(cfg)


def pdsch_tx_slot(tb_bits, cfg: PdschTxConfig):
    """Convenience wrapper with per-config program caching."""
    return _cached_tx(cfg)(tb_bits)
