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
from ..ops.modulation import modulate, modulate_planes
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


def sch_k0_prime(cfg: SchChainConfig, rv: int) -> int:
    """rv's circular-buffer start mapped into the FILLER-LESS buffer.

    The TS 38.212 bit selection walks the circular buffer from k0 skipping
    filler positions — identical to walking the buffer with filler removed
    from position k0' (k0 is always z-aligned, outside the filler span)."""
    seg = cfg.segmentation
    z = seg.lifting_size
    n = seg.nof_cw_bits_per_cb
    k0 = rm.k0_index(seg.base_graph, rv, n, z)
    filler_start = seg.nof_bits_per_cb - 2 * z - seg.nof_filler_bits_per_cb
    filler_end = seg.nof_bits_per_cb - 2 * z
    assert not (filler_start < k0 < filler_end), "k0 inside filler span"
    return k0 - (seg.nof_filler_bits_per_cb if k0 >= filler_end else 0)


def sch_scramble_planes(cfg: SchChainConfig, rnti: int, n_id: int,
                        g: int | None = None):
    """Host: per-group bit-major scrambling planes (nj, Qm, E/Qm) uint8."""
    import dataclasses

    import numpy as np

    qm = bits_per_symbol(cfg.modulation)
    vcfg = dataclasses.replace(cfg, rnti=rnti, n_id=n_id)
    scr = prg_mod.gold_sequence_bits(vcfg.scrambling_cinit(),
                                     cfg.nof_codeword_bits)
    out = []
    off = 0
    for e, js in sch_rate_match_groups(cfg, g):
        nj = len(js)
        blk = scr[off:off + nj * e].reshape(nj, e // qm, qm)
        out.append(np.ascontiguousarray(blk.transpose(0, 2, 1)))
        off += nj * e
    return tuple(out)


@functools.lru_cache(maxsize=None)
def build_sch_symbols_tx_dyn(cfg: SchChainConfig, g: int | None = None):
    """Dynamic-value SCH symbol chain:
    fn(tb_bits, scr_planes tuple, rv_onehot (4,) uint8) -> (B, G/Qm) complex.

    The scrambling planes (rnti/n_id) and the redundancy version (as a
    one-hot selector over the 4 static circular-buffer starts k0') are
    device inputs, so one compiled program serves every UE and every
    redundancy version.  Rate matching is GATHER-FREE: the bit
    selection is a dynamic slice of the filler-less buffer tiled enough to
    cover wrap/repetition, and the Section 5.4.2.2 interleave disappears
    because each transmitted bit plane is a contiguous e-order slice
    (`ops.modulation.modulate_planes`)."""
    seg = cfg.segmentation
    qm = bits_per_symbol(cfg.modulation)
    c, z, k = seg.nof_cb, seg.lifting_size, seg.nof_bits_per_cb
    kp = seg.nof_payload_bits_per_cb
    payload = kp - seg.cb_crc_bits
    groups = sch_rate_match_groups(cfg, g)
    tb_crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"
    filler_start = k - 2 * z - seg.nof_filler_bits_per_cb
    filler_end = k - 2 * z
    n_prime = seg.nof_cw_bits_per_cb - seg.nof_filler_bits_per_cb
    e_max = max(e for e, _ in groups)
    # Wrap margin: the largest (k0' + E) window over all redundancy versions
    # may run past the buffer end by at most this much — appending just the
    # margin (instead of tiling whole copies) keeps the slice target small.
    max_k0p = max(sch_k0_prime(cfg, rv) for rv in range(4))
    margin = max(0, max_k0p + e_max - n_prime)
    full_wraps = margin // n_prime
    margin_rem = margin % n_prime

    #: k0' has at most 4 distinct values (one per redundancy version), so
    #: the bit selection is 4 STATIC slices + a one-hot select instead of a
    #: dynamic slice: a dynamic offset stays cheap single-slot but turns
    #: into a per-element gather under vmap (the batched multi-cell DL
    #: program), where the static-slice select stays an elementwise pass.
    k0_by_rv = tuple(sch_k0_prime(cfg, rv) for rv in range(4))

    @jax.jit
    def tx(tb_bits, scr_planes, rv_onehot):
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
        # Filler-less circular buffer with just enough wrap margin appended
        # for the largest (k0', E) window — ONE concat, no whole-buffer tile.
        pieces = [cw[:, :, :filler_start], cw[:, :, filler_end:]]
        for _ in range(full_wraps):
            pieces += [cw[:, :, :filler_start], cw[:, :, filler_end:]]
        if margin_rem:
            if margin_rem <= filler_start:
                pieces.append(cw[:, :, :margin_rem])
            else:
                pieces += [cw[:, :, :filler_start],
                           cw[:, :, filler_end:filler_end + margin_rem
                              - filler_start]]
        tiled = jnp.concatenate(pieces, axis=-1)
        parts = []
        for gi, (e, js) in enumerate(groups):
            assert js == list(range(js[0], js[-1] + 1)), "E groups not contiguous"
            sub = tiled[:, js[0]:js[-1] + 1]
            sel = None
            for rv, k0 in enumerate(k0_by_rv):
                cand = sub[:, :, k0:k0 + e] * rv_onehot[rv]
                sel = cand if sel is None else sel + cand
            planes = sel.reshape(b, len(js), qm, e // qm)
            planes = planes ^ scr_planes[gi][None]
            sym = modulate_planes(planes, cfg.modulation)  # (B, nj, e/qm)
            parts.append(sym.reshape(b, len(js) * (e // qm)))
        return jnp.concatenate(parts, axis=-1)

    return tx
