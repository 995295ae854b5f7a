"""PUSCH UCI multiplexing with the CSI part-1 -> part-2 two-phase protocol.

The reference sizes CSI part 2 from the decoded part-1 payload inside the
demultiplexer (reference: lib/phy/upper/channel_processors/pusch/
pusch_processor_impl.cpp:40-92 csi-part1-feedback, ulsch_demultiplex_impl.cpp
set_csi_part2 :241).  Data-dependent sizes cannot live inside one jitted
program, so the protocol runs as two device phases with a host decision point:

  phase A (one program): frontend (estimate, equalize, demap, descramble) ->
      full codeword LLRs; extract + decode HARQ-ACK and CSI part 1 (their
      TS 38.212 Section 6.2.7 placement is independent of CSI part 2).
  host: csi2_size = part2_size_map[int(csi1 bits)]  (the FAPI adaptor's
      uci-part2 correspondence table).
  phase B (one program per csi2-size bucket): extract + decode CSI part 2,
      gather the SCH positions for that bucket's placement plan, rate-recover
      and LDPC-decode the SCH.

All placement comes from the exact plan in ops.ulsch_demux; encoded-bit
budgets from ran.ulsch_info.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.xfer import to_host

from ..models.pusch_rx import PuschRxConfig, decode_uci_field
from ..ops.ulsch_demux import placeholder_fix_signs
from ..ran.modulation import bits_per_symbol


@dataclass(frozen=True)
class PuschUciConfig:
    #: rx.nof_harq_ack_bits / rx.nof_csi_part1_bits hold the phase-A payloads.
    rx: PuschRxConfig
    #: part2_size_map[value(csi1 bits)] -> nof csi2 bits (0 = absent).
    part2_size_map: tuple[int, ...]


class PuschUciProcessor:
    """Two-phase PUSCH processor with HARQ-ACK / CSI1 / CSI2 decoding."""

    def __init__(self, cfg: PuschUciConfig):
        self.cfg = cfg
        rx = cfg.rx
        qm = bits_per_symbol(rx.modulation)
        self._qm = qm
        # ACK and CSI1 placement is CSI2-independent: plan with csi2 = 0.
        plan, _ = rx.demux_plan(0)
        from ..ops import prg as prg_mod

        scr = prg_mod.gold_sequence_bits(rx.scrambling_cinit(), rx.nof_codeword_bits)
        self._scr = scr
        self._ack_idx = plan.ack_bit_idx
        self._ack_fix = placeholder_fix_signs(plan.ack_bit_idx, rx.nof_harq_ack_bits,
                                              qm, scr)
        self._csi1_idx = plan.csi1_bit_idx
        self._csi1_fix = placeholder_fix_signs(plan.csi1_bit_idx,
                                               rx.nof_csi_part1_bits, qm, scr)
        self._frontend = _build_frontend(rx)
        self._phase_a = self._build_phase_a()
        self._phase_b = {}

    def _build_phase_a(self):
        rx = self.cfg.rx

        @jax.jit
        def phase_a(grid):
            llr = self._frontend(grid)
            out = {"llr": llr}
            if rx.nof_harq_ack_bits:
                ack = llr[:, jnp.asarray(self._ack_idx)].astype(jnp.int32)
                ack = ack * jnp.asarray(self._ack_fix, jnp.int32)
                out["ack_bits"], out["ack_metric"] = decode_uci_field(
                    ack, rx.nof_harq_ack_bits, self._qm)
            csi1 = llr[:, jnp.asarray(self._csi1_idx)].astype(jnp.int32)
            csi1 = csi1 * jnp.asarray(self._csi1_fix, jnp.int32)
            out["csi1_bits"], out["csi1_metric"] = decode_uci_field(
                csi1, rx.nof_csi_part1_bits, self._qm)
            return out

        return phase_a

    def process(self, grid_pair):
        cfg = self.cfg
        a = self._phase_a(grid_pair)
        # Host decision point: CSI part 2 size from the decoded part 1.
        csi1_np = to_host(a["csi1_bits"])
        weights = 1 << np.arange(cfg.rx.nof_csi_part1_bits - 1, -1, -1)
        values = (csi1_np * weights).sum(-1)
        sizes = [cfg.part2_size_map[int(v)] for v in values]
        assert len(set(sizes)) == 1, "mixed csi2 sizes in one batch not supported yet"
        csi2_size = sizes[0]

        phase_b = self._phase_b.get(csi2_size)
        if phase_b is None:
            phase_b = _build_phase_b(cfg.rx, csi2_size, self._scr)
            self._phase_b[csi2_size] = phase_b
        out = phase_b(a["llr"])
        out["csi1_bits"] = csi1_np
        out["csi1_valid"] = to_host(a["csi1_metric"]) > 0.25
        out["csi2_size"] = csi2_size
        if cfg.rx.nof_harq_ack_bits:
            out["harq_ack_bits"] = to_host(a["ack_bits"])
            out["harq_ack_metric"] = to_host(a["ack_metric"])
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


def _build_phase_b(rx: PuschRxConfig, csi2_size: int, scr: np.ndarray):
    qm = bits_per_symbol(rx.modulation)
    seg = rx.segmentation
    plan, info = rx.demux_plan(csi2_size)
    es = rx.cb_rate_match_sizes(info.nof_ul_sch_bits)
    c, z = seg.nof_cb, seg.lifting_size
    offsets = np.concatenate([[0], np.cumsum(es)]).astype(int)
    csi2_fix = placeholder_fix_signs(plan.csi2_bit_idx, csi2_size, qm, scr)

    from ..ops.ldpc import rate_matching as rm
    from ..ops.crc import crc_check_device
    from ..models.decode_select import decode_fn

    @jax.jit
    def phase_b(llr):
        b = llr.shape[0]
        if len(plan.punct_bit_idx):
            llr = llr.at[:, jnp.asarray(plan.punct_bit_idx)].set(0)
        result = {}
        if csi2_size:
            csi2_llr = llr[:, jnp.asarray(plan.csi2_bit_idx)].astype(jnp.int32)
            csi2_llr = csi2_llr * jnp.asarray(csi2_fix, jnp.int32)
            bits, metric = decode_uci_field(csi2_llr, csi2_size, qm)
            result["csi2_bits"] = bits
            result["csi2_valid"] = metric > 0.25
        sch_llr = llr[:, jnp.asarray(plan.sch_bit_idx)]
        bufs = []
        for j in range(c):
            bufs.append(rm.rate_dematch(sch_llr[:, offsets[j]:offsets[j + 1]],
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
        result["tb_crc_ok"] = tb_ok
        result["tb_bits"] = tb_and_crc[:, : rx.tbs]
        return result

    return phase_b
