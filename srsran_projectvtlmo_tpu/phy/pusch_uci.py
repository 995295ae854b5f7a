"""PUSCH UCI multiplexing with the CSI part-1 -> part-2 two-phase protocol.

The reference sizes CSI part 2 from the decoded part-1 payload inside the
demultiplexer (reference: lib/phy/upper/channel_processors/pusch/
pusch_processor_impl.cpp:40-92 csi-part1-feedback, ulsch_demultiplex_impl.cpp
set_csi_part2 :241).  Data-dependent sizes cannot live inside one jitted
program, so the protocol runs as two device phases with a host decision point:

  phase A (one program): frontend (estimate, equalize, demap, descramble) ->
      full codeword LLRs; extract + decode HARQ-ACK and CSI part 1.
  host: csi2_size = part2_size_map[int(csi1 bits)]  (the FAPI adaptor's
      uci-part2 correspondence table).
  phase B (one program per csi2-size bucket): zero all UCI positions in the
      LLRs, extract + decode CSI part 2, rate-recover + LDPC-decode the SCH.

All UCI fields use the scoped puncturing placement of ops/ulsch_demux.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.pusch_rx import PuschRxConfig
from ..ops import short_block
from ..ops import uci as uci_mod
from ..ops.ulsch_demux import harq_ack_re_plan
from ..ran.modulation import bits_per_symbol


def csi1_re_plan(cfg: PuschRxConfig, nof_csi1_bits: int) -> np.ndarray:
    """CSI part 1 REs: same strided scheme as ACK, on the next data symbols."""
    qm = bits_per_symbol(cfg.modulation)
    ack = harq_ack_re_plan(cfg.nof_harq_ack_bits, qm, cfg.nof_subc,
                           cfg.data_symbols, cfg.dmrs_symbols)
    taken = set(ack.tolist())
    nof_re = max(int(np.ceil(2.0 * nof_csi1_bits * 4 / qm)), 1)
    out = []
    for i in range(cfg.nof_data_re):
        if i not in taken:
            out.append(i)
            if len(out) == nof_re:
                break
    return np.asarray(out, dtype=np.int64)


def csi2_re_plan(cfg: PuschRxConfig, nof_csi1_bits: int, nof_csi2_bits: int) -> np.ndarray:
    qm = bits_per_symbol(cfg.modulation)
    ack = harq_ack_re_plan(cfg.nof_harq_ack_bits, qm, cfg.nof_subc,
                           cfg.data_symbols, cfg.dmrs_symbols)
    csi1 = csi1_re_plan(cfg, nof_csi1_bits)
    taken = set(ack.tolist()) | set(csi1.tolist())
    nof_re = max(int(np.ceil(2.0 * nof_csi2_bits * 4 / qm)), 1)
    out = []
    for i in range(cfg.nof_data_re):
        if i not in taken:
            out.append(i)
            if len(out) == nof_re:
                break
    return np.asarray(out, dtype=np.int64)


def _bit_idx(res: np.ndarray, qm: int) -> np.ndarray:
    return (res[:, None] * qm + np.arange(qm)[None, :]).reshape(-1)


@dataclass(frozen=True)
class PuschUciConfig:
    rx: PuschRxConfig
    nof_csi1_bits: int
    #: part2_size_map[value(csi1 bits)] -> nof csi2 bits (0 = absent).
    part2_size_map: tuple[int, ...]


class PuschUciProcessor:
    """Two-phase PUSCH processor with HARQ-ACK / CSI1 / CSI2 decoding."""

    def __init__(self, cfg: PuschUciConfig):
        self.cfg = cfg
        qm = bits_per_symbol(cfg.rx.modulation)
        self._qm = qm
        self._csi1_bits_idx = _bit_idx(csi1_re_plan(cfg.rx, cfg.nof_csi1_bits), qm)
        # Phase A: reuse the standard front half by building the no-decode rx
        # (we run the full rx program but only consume its LLRs would be
        # wasteful; instead build a dedicated frontend).
        self._frontend = _build_frontend(cfg.rx)
        self._phase_b = {}

    def process(self, grid_pair):
        cfg = self.cfg
        llr = self._frontend(grid_pair)  # (B, G) int8, descrambled
        csi1_llr = llr[:, jnp.asarray(self._csi1_bits_idx)]
        if cfg.nof_csi1_bits <= 11:
            csi1_bits, csi1_metric = short_block.detect(csi1_llr, cfg.nof_csi1_bits, self._qm)
            csi1_valid = csi1_metric > 0.25
        else:
            csi1_bits, csi1_valid = uci_mod.uci_decode(csi1_llr, cfg.nof_csi1_bits, self._qm)

        # Host decision point: CSI part 2 size from the decoded part 1.
        csi1_np = np.asarray(csi1_bits)
        weights = 1 << np.arange(cfg.nof_csi1_bits - 1, -1, -1)
        values = (csi1_np * weights).sum(-1)
        sizes = [cfg.part2_size_map[int(v)] for v in values]
        assert len(set(sizes)) == 1, "mixed csi2 sizes in one batch not supported yet"
        csi2_size = sizes[0]

        phase_b = self._phase_b.get(csi2_size)
        if phase_b is None:
            phase_b = _build_phase_b(cfg, csi2_size)
            self._phase_b[csi2_size] = phase_b
        out = phase_b(llr)
        out["csi1_bits"] = csi1_np
        out["csi1_valid"] = np.asarray(csi1_valid)
        out["csi2_size"] = csi2_size
        return out


def _build_frontend(cfg: PuschRxConfig):
    """Front half of the PUSCH rx: grid -> descrambled codeword LLRs."""
    from ..ops import prg as prg_mod
    from ..ops.channel_estimate import estimate_channel_hop
    from ..ops.dmrs import dmrs_type1_sequence
    from ..ops.equalization import equalize_mmse_1xn
    from ..ops.demodulation import soft_demap

    ref = np.stack([
        dmrs_type1_sequence(cfg.slot, cfg.start_symbol + s, cfg.n_id, cfg.nof_rb,
                            prb_start=cfg.rb_start)
        for s in cfg.dmrs_symbols
    ])
    ref_pair = np.stack([ref.real, ref.imag], axis=-1).astype(np.float32)
    pil_subc = (2 * np.arange(6 * cfg.nof_rb)).astype(np.int32)
    signs = 1 - 2 * prg_mod.gold_sequence_bits(
        cfg.scrambling_cinit(), cfg.nof_codeword_bits).astype(np.int32)
    data_syms = np.asarray(cfg.data_symbols, dtype=np.int32)
    dmrs_syms = np.asarray(cfg.dmrs_symbols, dtype=np.int32)

    @jax.jit
    def frontend(grid):
        rx_pilots = grid[:, :, dmrs_syms][:, :, :, pil_subc, :]
        est = jax.vmap(
            lambda g: estimate_channel_hop(g, jnp.asarray(ref_pair), cfg.nof_rb, 2),
            in_axes=1, out_axes=0,
        )(rx_pilots)
        ce = est["ce_pair"]
        noise = est["noise_var"]
        b = grid.shape[0]
        nre = cfg.nof_data_re
        data = grid[:, :, data_syms]
        y = jnp.transpose(data, (0, 2, 3, 1, 4)).reshape(b, nre, cfg.nof_rx_ports, 2)
        h = jnp.broadcast_to(
            jnp.transpose(ce, (1, 0, 2, 3))[:, None],
            (b, len(data_syms), cfg.nof_rx_ports, cfg.nof_subc, 2),
        )
        h = jnp.transpose(h, (0, 1, 3, 2, 4)).reshape(b, nre, cfg.nof_rx_ports, 2)
        eq, eq_nvar = equalize_mmse_1xn(y, h, jnp.transpose(noise, (1, 0)))
        llr = soft_demap(eq, eq_nvar, cfg.modulation)
        llr = jnp.clip(llr.astype(jnp.int32) * jnp.asarray(signs)[None], -127, 127)
        return llr.astype(jnp.int8)

    return frontend


def _build_phase_b(cfg: PuschUciConfig, csi2_size: int):
    rx = cfg.rx
    qm = bits_per_symbol(rx.modulation)
    seg = rx.segmentation
    es = rx.cb_rate_match_sizes()
    c, z = seg.nof_cb, seg.lifting_size
    offsets = np.concatenate([[0], np.cumsum(es)]).astype(int)

    ack = harq_ack_re_plan(rx.nof_harq_ack_bits, qm, rx.nof_subc,
                           rx.data_symbols, rx.dmrs_symbols)
    csi1 = csi1_re_plan(rx, cfg.nof_csi1_bits)
    csi2 = csi2_re_plan(rx, cfg.nof_csi1_bits, csi2_size) if csi2_size else np.empty(0, np.int64)
    zero_idx = _bit_idx(np.concatenate([ack, csi1, csi2]).astype(np.int64), qm)
    csi2_idx = _bit_idx(csi2, qm) if csi2_size else np.empty(0, np.int64)

    from ..ops.ldpc import rate_matching as rm
    from ..ops.crc import crc_check_device
    from ..models.decode_select import decode_fn

    @jax.jit
    def phase_b(llr):
        b = llr.shape[0]
        csi2_llr = llr[:, jnp.asarray(csi2_idx)] if csi2_size else None
        llr = llr.at[:, jnp.asarray(zero_idx)].set(0)
        bufs = []
        for j in range(c):
            bufs.append(rm.rate_dematch(llr[:, offsets[j]:offsets[j + 1]],
                                        seg.base_graph, z, seg.nof_filler_bits_per_cb,
                                        rx.rv, es[j], qm))
        soft = jnp.stack(bufs, axis=1)
        hard, _ = decode_fn(rx.use_pallas_decoder)(
            soft.reshape(b * c, -1), seg.base_graph, z, rx.nof_ldpc_iterations)
        hard = hard.reshape(b, c, -1)
        kp = seg.nof_payload_bits_per_cb
        payload_bits = hard[:, :, :kp]
        if seg.cb_crc_bits:
            payload = payload_bits[:, :, : kp - seg.cb_crc_bits].reshape(b, -1)
        else:
            payload = payload_bits.reshape(b, -1)
        tb_and_crc = payload[:, : rx.tbs + seg.tb_crc_bits]
        crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"
        tb_ok = crc_check_device(tb_and_crc, crc_name)
        result = {"tb_crc_ok": tb_ok, "tb_bits": tb_and_crc[:, : rx.tbs]}
        if csi2_size:
            if csi2_size <= 11:
                bits, metric = short_block.detect(csi2_llr, csi2_size, qm)
                result["csi2_bits"] = bits
                result["csi2_valid"] = metric > 0.25
            else:
                bits, ok = uci_mod.uci_decode(csi2_llr, csi2_size, qm)
                result["csi2_bits"] = bits
                result["csi2_valid"] = ok
        return result

    return phase_b
