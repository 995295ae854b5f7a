"""UL-SCH transmitter matching PuschRxConfig -- the UE-side emulator.

Produces the waveform the PUSCH receiver expects: segmentation + CRCs + LDPC
encode + rate match + scramble + QAM + DM-RS type 1 (full symbol, 2 CDM groups)
+ OFDM modulate.  Used by loopback/BLER tests and benchmarks (the reference
exercises its PUSCH Rx the same way, tests/integrationtests/phy/upper/
channel_processors/pxsch_bler_test.cpp:332-458).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ran.modulation import bits_per_symbol
from ..ops import prg as prg_mod
from ..ops.crc import crc_device
from ..ops.dmrs import dmrs_type1_sequence
from ..ops.ldpc.encode import ldpc_encode
from ..ops.ldpc import rate_matching as rm
from ..ops.modulation import modulate
from ..ops import ofdm as ofdm_mod
from .pusch_rx import PuschRxConfig


def build_ulsch_tx_slot(cfg: PuschRxConfig):
    """Returns a jitted fn: tb_bits (B, TBS) uint8 -> (grid_pair (B, 14, nsubc, 2),
    samples_pair (B, nsamples, 2))."""
    seg = cfg.segmentation
    qm = bits_per_symbol(cfg.modulation)
    es = cfg.cb_rate_match_sizes()
    c, z, k = seg.nof_cb, seg.lifting_size, seg.nof_bits_per_cb
    kp = seg.nof_payload_bits_per_cb
    payload = kp - seg.cb_crc_bits
    plans = [
        rm.rate_match_plan(seg.base_graph, z, seg.nof_filler_bits_per_cb, cfg.rv, e, qm)
        for e in es
    ]
    scramble = prg_mod.gold_sequence_bits(cfg.scrambling_cinit(), cfg.nof_codeword_bits)
    tb_crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"

    ref = np.stack([
        dmrs_type1_sequence(cfg.slot, s, cfg.n_id, cfg.nof_rb) for s in cfg.dmrs_symbols
    ])
    pil_subc = (2 * np.arange(6 * cfg.nof_rb)).astype(np.int32)
    data_syms = np.asarray(cfg.data_symbols, dtype=np.int32)
    dmrs_syms = np.asarray(cfg.dmrs_symbols, dtype=np.int32)

    @jax.jit
    def tx(tb_bits):
        b = tb_bits.shape[0]
        tb_crc = crc_device(tb_bits, tb_crc_name)
        full = jnp.concatenate([tb_bits, tb_crc], axis=-1)
        pad = c * payload - full.shape[-1]
        full = jnp.concatenate([full, jnp.zeros((b, pad), jnp.uint8)], axis=-1)
        cbs = full.reshape(b, c, payload)
        if seg.cb_crc_bits:
            cbs = jnp.concatenate([cbs, crc_device(cbs, "CRC24B")], axis=-1)
        cbs = jnp.concatenate([cbs, jnp.zeros((b, c, k - kp), jnp.uint8)], axis=-1)

        cw = ldpc_encode(cbs.reshape(b * c, k), seg.base_graph, z)
        cw = cw.reshape(b, c, -1)[:, :, 2 * z:]
        parts = [jnp.take(cw[:, j], jnp.asarray(plans[j]), axis=-1) for j in range(c)]
        codeword = jnp.concatenate(parts, axis=-1) ^ jnp.asarray(scramble)[None, :]

        syms = modulate(codeword, cfg.modulation)
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
def cached_ulsch_tx(cfg: PuschRxConfig):
    return build_ulsch_tx_slot(cfg)
