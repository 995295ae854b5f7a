"""UL-SCH transmitter matching PuschRxConfig -- the UE-side emulator.

Produces the waveform the PUSCH receiver expects: SCH codeword chain (via
models.sch_tx) + DM-RS type 1 (full symbol, 2 CDM groups) + OFDM modulate.
Used by loopback/BLER tests and benchmarks (the reference exercises its PUSCH
Rx the same way, tests/integrationtests/phy/upper/channel_processors/
pxsch_bler_test.cpp:332-458).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dmrs import dmrs_type1_sequence
from ..ops import ofdm as ofdm_mod
from .pusch_rx import PuschRxConfig
from .sch_tx import build_sch_symbols_tx


def build_ulsch_tx_slot(cfg: PuschRxConfig):
    """Returns a jitted fn: tb_bits (B, TBS) uint8 -> (grid_pair (B, 14, nsubc, 2),
    samples_pair (B, nsamples, 2))."""
    sch_tx = build_sch_symbols_tx(cfg)
    from ..ran.modulation import bits_per_symbol
    from ..ops.ulsch_demux import harq_ack_re_plan
    from ..ops import short_block
    from ..ops.modulation import modulate
    from ..ops import prg as prg_mod2

    qm = bits_per_symbol(cfg.modulation)
    nof_ack = getattr(cfg, "nof_harq_ack_bits", 0)
    ack_res = harq_ack_re_plan(nof_ack, qm, cfg.nof_subc,
                               cfg.data_symbols, cfg.dmrs_symbols)
    if len(ack_res):
        # Precompute the full ACK codeword table (2^K x G bits), scrambled at
        # the codeword positions, so the traced bits just gather a row.
        scr_bits = prg_mod2.gold_sequence_bits(cfg.scrambling_cinit(),
                                               cfg.nof_codeword_bits)
        bit_idx = (ack_res[:, None] * qm + np.arange(qm)[None, :]).reshape(-1)
        table = np.stack([
            short_block.encode_host(
                np.array([(m >> (nof_ack - 1 - i)) & 1 for i in range(nof_ack)],
                         np.uint8), len(ack_res) * qm, qm) ^ scr_bits[bit_idx]
            for m in range(1 << nof_ack)
        ])
        ack_weights = np.array([1 << (nof_ack - 1 - i) for i in range(nof_ack)],
                               np.int32)

    ref = np.stack([
        dmrs_type1_sequence(cfg.slot, cfg.start_symbol + s, cfg.n_id, cfg.nof_rb,
                            prb_start=cfg.rb_start)
        for s in cfg.dmrs_symbols
    ])
    pil_subc = (2 * np.arange(6 * cfg.nof_rb)).astype(np.int32)
    data_syms = np.asarray(cfg.data_symbols, dtype=np.int32)
    dmrs_syms = np.asarray(cfg.dmrs_symbols, dtype=np.int32)

    nlayers = cfg.nof_layers
    # Type-1 fd-OCC over adjacent pilot pairs: layer 0 = (+1, +1), layer 1 = (+1, -1).
    occ = np.ones((nlayers, ref.shape[-1]), np.float32)
    if nlayers == 2:
        occ[1, 1::2] = -1.0

    @jax.jit
    def tx(tb_bits, ack_bits=None):
        b = tb_bits.shape[0]
        syms = sch_tx(tb_bits)
        if len(ack_res) and ack_bits is not None:
            # Gather the precomputed scrambled ACK codeword and overwrite
            # the punctured REs.
            idx = jnp.sum(ack_bits.astype(jnp.int32) * jnp.asarray(ack_weights), -1)
            coded = jnp.take(jnp.asarray(table), idx, axis=0)
            ack_syms = modulate(coded, cfg.modulation)
            syms = syms.at[:, jnp.asarray(ack_res)].set(ack_syms)
        if nlayers == 1:
            layer_syms = syms[:, None, :]
        else:
            from ..ops.precoding import layer_map

            layer_syms = layer_map(syms, nlayers)  # (B, L, G/L)
        data_grid = layer_syms.reshape(b, nlayers, len(cfg.data_symbols), cfg.nof_subc)

        grid = jnp.zeros((b, nlayers, cfg.nof_ofdm_symbols, cfg.nof_subc), jnp.complex64)
        grid = grid.at[:, :, data_syms, :].set(data_grid)
        pil = jnp.zeros((nlayers, len(cfg.dmrs_symbols), cfg.nof_subc), jnp.complex64)
        pil = pil.at[:, :, pil_subc].set(jnp.asarray(ref)[None] * jnp.asarray(occ)[:, None, :])
        grid = grid.at[:, :, dmrs_syms, :].set(
            jnp.broadcast_to(pil[None], (b,) + pil.shape)
        )

        grid_pair = jnp.stack([jnp.real(grid), jnp.imag(grid)], -1).astype(jnp.float32)
        samples = ofdm_mod.ofdm_modulate(
            grid_pair, cfg.dft_size, cfg.numerology, cfg.slot % (1 << cfg.numerology)
        )
        if nlayers == 1:
            return grid_pair[:, 0], samples[:, 0]
        return grid_pair, samples

    return tx


@functools.lru_cache(maxsize=None)
def cached_ulsch_tx(cfg: PuschRxConfig):
    return build_ulsch_tx_slot(cfg)
