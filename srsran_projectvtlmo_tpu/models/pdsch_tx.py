"""PDSCH transmit slot model: the Phase-1 flagship end-to-end program.

One jitted program per static configuration covering the whole DL shared
channel for a slot: TB CRC -> segmentation -> per-CB CRC24B -> LDPC encode ->
rate match -> Gold scrambling -> QAM mapping -> resource grid -> OFDM modulate.

This replaces the reference's pdsch_processor_concurrent_impl thread pipeline
(reference: lib/phy/upper/channel_processors/pdsch_processor_concurrent_impl.cpp:31-311)
with a single fused device program; codeblock parallelism becomes the batch
axis of the LDPC kernels, cells/slots batch on a leading axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.ldpc_params import BaseGraph
from ..ran.modulation import Modulation, bits_per_symbol
from ..ran.sch import SchSegmentation, sch_segmentation_info, tbs_calculator
from ..ops import prg as prg_mod
from ..ops.crc import crc_device
from ..ops.ldpc.encode import ldpc_encode
from ..ops.ldpc import rate_matching as rm
from ..ops.modulation import modulate
from ..ops import ofdm as ofdm_mod


@dataclass(frozen=True)
class PdschTxConfig:
    """Static per-compile PDSCH parameters (one bucket = one compiled program)."""

    nof_rb: int
    modulation: Modulation
    target_code_rate: float
    nof_layers: int = 1
    nof_ofdm_symbols: int = 14
    nof_dmrs_symbols: int = 1  # symbols fully reserved for DM-RS (simplified v1 mapping)
    dft_size: int = 4096
    numerology: int = 1
    slot_in_subframe: int = 0
    rv: int = 0
    rnti: int = 0x4601
    n_id: int = 1

    @property
    def nof_subc(self) -> int:
        return self.nof_rb * 12

    @property
    def nof_data_re(self) -> int:
        return self.nof_subc * (self.nof_ofdm_symbols - self.nof_dmrs_symbols)

    @functools.cached_property
    def tbs(self) -> int:
        nof_re = min(156, 12 * (self.nof_ofdm_symbols - self.nof_dmrs_symbols)) * self.nof_rb
        return tbs_calculator(
            nof_re=nof_re,
            target_code_rate=self.target_code_rate,
            modulation_bits=bits_per_symbol(self.modulation),
            nof_layers=self.nof_layers,
        )

    @functools.cached_property
    def segmentation(self) -> SchSegmentation:
        return sch_segmentation_info(self.tbs, self.target_code_rate)

    @property
    def nof_codeword_bits(self) -> int:
        qm = bits_per_symbol(self.modulation)
        return self.nof_data_re * qm * self.nof_layers

    def cb_rate_match_sizes(self) -> list[int]:
        """Per-CB rate-matched size E_j (TS 38.212 Section 5.4.2.1)."""
        g = self.nof_codeword_bits
        c = self.segmentation.nof_cb
        nl, qm = self.nof_layers, bits_per_symbol(self.modulation)
        es = []
        for j in range(c):
            if j <= c - (g // (nl * qm) % c) - 1:
                es.append(nl * qm * (g // (nl * qm * c)))
            else:
                es.append(nl * qm * (-(-g // (nl * qm * c))))
        assert sum(es) == g
        return es

    def scrambling_cinit(self) -> int:
        # TS 38.211 Section 7.3.1.1, q=0.
        return ((self.rnti << 15) + self.n_id) & 0x7FFFFFFF


def build_pdsch_tx_slot(cfg: PdschTxConfig):
    """Returns a jitted fn: tb_bits (ncells, TBS) uint8 -> iq (ncells, nsamples, 2).

    Also attaches `.intermediate` output: the scrambled codeword bits, useful
    for loopback tests.
    """
    seg = cfg.segmentation
    es = cfg.cb_rate_match_sizes()
    qm = bits_per_symbol(cfg.modulation)
    # Precompute per-CB rate-match gathers; concatenated codeword layout.
    plans = [
        rm.rate_match_plan(seg.base_graph, seg.lifting_size, seg.nof_filler_bits_per_cb, cfg.rv, e, qm)
        for e in es
    ]
    scramble_bits = prg_mod.gold_sequence_bits(cfg.scrambling_cinit(), cfg.nof_codeword_bits)

    c, kp, k = seg.nof_cb, seg.nof_payload_bits_per_cb, seg.nof_bits_per_cb
    payload = kp - seg.cb_crc_bits
    tb_crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"

    @jax.jit
    def tx(tb_bits):
        b = tb_bits.shape[0]
        tb_crc = crc_device(tb_bits, tb_crc_name)
        full = jnp.concatenate([tb_bits, tb_crc], axis=-1)
        pad = c * payload - full.shape[-1]
        full = jnp.concatenate([full, jnp.zeros((b, pad), jnp.uint8)], axis=-1)
        cbs = full.reshape(b, c, payload)
        if seg.cb_crc_bits:
            cb_crc = crc_device(cbs, "CRC24B")
            cbs = jnp.concatenate([cbs, cb_crc], axis=-1)
        cbs = jnp.concatenate([cbs, jnp.zeros((b, c, k - kp), jnp.uint8)], axis=-1)

        # Encode all CBs of all cells as one batch.
        cw = ldpc_encode(cbs.reshape(b * c, k), seg.base_graph, seg.lifting_size)
        cw = cw.reshape(b, c, -1)[:, :, 2 * seg.lifting_size:]

        # Rate match each CB and concatenate the codeword.
        parts = [jnp.take(cw[:, j], jnp.asarray(plans[j]), axis=-1) for j in range(c)]
        codeword = jnp.concatenate(parts, axis=-1)  # (b, G)

        scrambled = codeword ^ jnp.asarray(scramble_bits)[None, :]
        syms = modulate(scrambled, cfg.modulation)  # (b, nre) complex (jit-internal)

        nsubc = cfg.nof_subc
        ndata_sym = cfg.nof_ofdm_symbols - cfg.nof_dmrs_symbols
        data_grid = syms.reshape(b, ndata_sym, nsubc)
        # v1 grid: DM-RS symbols lead the slot (full-symbol placeholder pilots).
        dmrs = _dmrs_symbols(cfg)  # (ndmrs, nsubc) complex64 constant
        grid = jnp.concatenate(
            [jnp.broadcast_to(dmrs[None], (b,) + dmrs.shape), data_grid], axis=1
        )
        grid_pair = jnp.stack([jnp.real(grid), jnp.imag(grid)], axis=-1).astype(jnp.float32)
        return ofdm_mod.ofdm_modulate(
            grid_pair, cfg.dft_size, cfg.numerology, cfg.slot_in_subframe
        )

    return tx


@functools.lru_cache(maxsize=None)
def _dmrs_symbols(cfg: PdschTxConfig):
    """Placeholder DM-RS: Gold-sequence QPSK pilots on the first symbol(s)."""
    n = cfg.nof_dmrs_symbols * cfg.nof_subc * 2
    bits = prg_mod.gold_sequence_bits((cfg.n_id << 1) | 1, n).astype(np.float32)
    vals = (1 - 2 * bits) / np.sqrt(2)
    z = (vals[0::2] + 1j * vals[1::2]).astype(np.complex64)
    return jnp.asarray(z.reshape(cfg.nof_dmrs_symbols, cfg.nof_subc))


@functools.lru_cache(maxsize=None)
def _cached_tx(cfg: PdschTxConfig):
    return build_pdsch_tx_slot(cfg)


def pdsch_tx_slot(tb_bits, cfg: PdschTxConfig):
    """Convenience wrapper with per-config program caching."""
    return _cached_tx(cfg)(tb_bits)
