"""Shared SCH transmit codeword chain: segmentation + CRCs + LDPC encode +
rate match + scrambling + modulation, as one jitted program per config.

Used by both the PDSCH transmitter and the UL-SCH (UE emulator) transmitter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ran.modulation import bits_per_symbol
from ..ops import prg as prg_mod
from ..ops.crc import crc_device
from ..ops.ldpc.encode import ldpc_encode
from ..ops.ldpc import rate_matching as rm
from ..ops.modulation import modulate
from .sch_config import SchChainConfig


@functools.lru_cache(maxsize=None)
def build_sch_codeword_tx(cfg: SchChainConfig, g: int | None = None):
    """Returns jitted fn: tb_bits (B, TBS) -> unscrambled codeword bits (B, G).

    `g` defaults to the full codeword size; UL-SCH with UCI rate-matched
    around passes the reduced G.
    """
    seg = cfg.segmentation
    qm = bits_per_symbol(cfg.modulation)
    es = cfg.cb_rate_match_sizes(g)
    c, z, k = seg.nof_cb, seg.lifting_size, seg.nof_bits_per_cb
    kp = seg.nof_payload_bits_per_cb
    payload = kp - seg.cb_crc_bits
    plans = [
        rm.rate_match_plan(seg.base_graph, z, seg.nof_filler_bits_per_cb, cfg.rv, e, qm)
        for e in es
    ]
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
            cbs = jnp.concatenate([cbs, crc_device(cbs, "CRC24B")], axis=-1)
        cbs = jnp.concatenate([cbs, jnp.zeros((b, c, k - kp), jnp.uint8)], axis=-1)

        cw = ldpc_encode(cbs.reshape(b * c, k), seg.base_graph, z)
        cw = cw.reshape(b, c, -1)[:, :, 2 * z:]
        parts = [jnp.take(cw[:, j], jnp.asarray(plans[j]), axis=-1) for j in range(c)]
        return jnp.concatenate(parts, axis=-1)

    return tx


@functools.lru_cache(maxsize=None)
def build_sch_symbols_tx(cfg: SchChainConfig):
    """Returns jitted fn: tb_bits (B, TBS) -> data symbols (B, nof_data_re*L) complex."""
    codeword_tx = build_sch_codeword_tx(cfg)
    scramble = prg_mod.gold_sequence_bits(cfg.scrambling_cinit(), cfg.nof_codeword_bits)

    @jax.jit
    def tx(tb_bits):
        codeword = codeword_tx(tb_bits) ^ jnp.asarray(scramble)[None, :]
        return modulate(codeword, cfg.modulation)

    return tx


def sch_rate_match_groups(cfg: SchChainConfig, g: int | None = None):
    """Equal-E codeblock groups [(e, [cb indices])] for this configuration.

    E sizes depend on the allocation/modulation only (not rv), so the groups
    are part of the compile-time shape while the per-group gather indices can
    be runtime inputs (`sch_rate_match_indices`)."""
    seg = cfg.segmentation
    es = cfg.cb_rate_match_sizes(g)
    groups: dict[int, list[int]] = {}
    for j in range(seg.nof_cb):
        groups.setdefault(int(es[j]), []).append(j)
    return list(groups.items())


def sch_rate_match_indices(cfg: SchChainConfig, rv: int, g: int | None = None):
    """Host-side per-group rate-match gather indices for a redundancy version.

    Passing these as device inputs (instead of baking them into the program)
    makes rv a slot-time VALUE: retransmissions reuse the compiled program
    (reference analog: per-slot PDU churn is the normal case,
    lib/fapi_adaptor/phy/fapi_to_phy_translator.cpp:290-351)."""
    import numpy as np

    seg = cfg.segmentation
    qm = bits_per_symbol(cfg.modulation)
    return tuple(
        jnp.asarray(np.asarray(rm.rate_match_plan(
            seg.base_graph, seg.lifting_size, seg.nof_filler_bits_per_cb,
            rv, e, qm)))
        for e, _ in sch_rate_match_groups(cfg, g)
    )


@functools.lru_cache(maxsize=None)
def build_sch_codeword_tx_dyn(cfg: SchChainConfig, g: int | None = None):
    """Like `build_sch_codeword_tx`, but the rate-match selection indices are
    runtime inputs (one (E,) int32 array per equal-E group), so rv changes
    never recompile.  Callers normalize value-only fields (rnti/n_id/rv) in
    `cfg` before building so one program serves every UE."""
    seg = cfg.segmentation
    c, z, k = seg.nof_cb, seg.lifting_size, seg.nof_bits_per_cb
    kp = seg.nof_payload_bits_per_cb
    payload = kp - seg.cb_crc_bits
    groups = sch_rate_match_groups(cfg, g)
    tb_crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"

    @jax.jit
    def tx(tb_bits, rm_idx):
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
        parts = []
        for gi, (e, js) in enumerate(groups):
            assert js == list(range(js[0], js[-1] + 1)), "E groups not contiguous"
            sel = jnp.take(cw[:, js[0]:js[-1] + 1], rm_idx[gi], axis=-1)
            parts.append(sel.reshape(b, len(js) * e))
        return jnp.concatenate(parts, axis=-1)

    return tx


@functools.lru_cache(maxsize=None)
def build_sch_symbols_tx_dyn(cfg: SchChainConfig):
    """Dynamic-value SCH symbol chain: fn(tb_bits, scramble_bits (G,) uint8,
    rm_idx tuple) -> (B, nof_data_re*L) complex symbols.

    The scrambling sequence (rnti/n_id) and rate-match indices (rv) are
    device inputs; the compiled program depends only on allocation shape."""
    codeword_tx = build_sch_codeword_tx_dyn(cfg)

    @jax.jit
    def tx(tb_bits, scramble_bits, rm_idx):
        codeword = codeword_tx(tb_bits, rm_idx) ^ scramble_bits[None, :]
        return modulate(codeword, cfg.modulation)

    return tx
