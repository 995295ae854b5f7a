"""Multi-cell du_low: FAPI PDU sets per cell, sharded over the (cell, sp) mesh.

The reference's du_low owns one independent upper_phy per cell
(reference: lib/du_low/du_low_impl.h:31-48), distributing cells across
executors/machines.  TPU-native: cells with the same slot *structure* batch
into ONE device program on the mesh's cell axis — per-cell parameters
(rnti/n_id/slot sequences) ride as inputs via PuschRxConfig.dynamic_params,
so heterogeneous RNTIs do not recompile.  Each per-cell HARQ pool stays
host-managed; the soft buffers live in the same sharded batch.

Heterogeneous slot structures degrade to per-cell dispatch through the plain
UpperPhy (same behavior, no batching win).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fapi.pdus import UlTtiRequest, CrcIndication, RxDataIndication
from ..models.pusch_rx import (
    PuschRxConfig, cached_pusch_rx_from_grid, flatten_tb_bits)
from ..ops import ofdm as ofdm_mod
from ..ops import prg as prg_mod
from ..ops.dmrs import dmrs_type1_sequence
from ..phy.harq import RxBufferPool
from ..phy.upper_phy import CellConfig, UpperPhy
from ..utils.cplx import np_to_pair
from ..utils.xfer import to_host
from .distributed import RanMesh, make_ran_mesh


def _static_key(pdu) -> tuple:
    """Shape-determining PUSCH PDU fields (params that may vary per cell ride
    as inputs instead)."""
    return (pdu.rb_start, pdu.rb_size, pdu.modulation, pdu.target_code_rate,
            pdu.rv, pdu.nof_layers, pdu.start_symbol, pdu.nof_symbols,
            tuple(pdu.dmrs_symbols), pdu.nof_harq_ack_bits)


class MultiCellUpperPhy:
    """N same-carrier cells processed as one sharded slot program."""

    def __init__(self, cfg: CellConfig, nof_cells: int,
                 ran_mesh: RanMesh | None = None,
                 expert: "ExpertPhyConfig | None" = None):
        from ..phy.upper_phy import ExpertPhyConfig

        self.cfg = cfg
        self.nof_cells = nof_cells
        self.expert = expert or ExpertPhyConfig()
        self.rmesh = ran_mesh or make_ran_mesh()
        self.cell_phys = [UpperPhy(cfg, self.expert) for _ in range(nof_cells)]
        self.harq_pools = [RxBufferPool() for _ in range(nof_cells)]
        #: Retransmissions whose soft-combining history was lost to HARQ
        #: pool exhaustion (decoded against a zero buffer, store skipped) —
        #: the reference flags pool exhaustion rather than losing it silently.
        self.nof_dropped_harq_reservations = 0

    # ------------------------------------------------------------------ DL --

    def process_dl_slot(self, requests, tx_datas=None, fetch: bool = False):
        """Assemble one DL slot for every cell as ONE batched device program
        (cells on the mesh "cell" axis), when all cells share the slot
        structure; heterogeneous structures fall back to per-cell dispatch.

        Args:
          requests: one DlTtiRequest per cell.
          tx_datas: optional list of TxDataRequest per cell.

        Returns (grids (ncell, P, 14, nsubc, 2), samples
        (ncell, P, nsamples, 2)) device arrays (fetch=False) or numpy
        (fetch=True).
        """
        from jax.sharding import NamedSharding, PartitionSpec
        from ..phy import dl_slot as dl_mod
        from ..utils.xfer import to_host

        assert len(requests) == self.nof_cells
        tx_datas = tx_datas or [None] * self.nof_cells
        slot = requests[0].slot
        keys = {dl_mod.plan_key_for(r, self.cfg) for r in requests}
        if len(keys) != 1:
            outs = [self.cell_phys[c].process_dl_slot(
                requests[c], tx_datas[c], fetch=fetch)
                for c in range(self.nof_cells)]
            grids = [g for g, _ in outs]
            samps = [s for _, s in outs]
            if fetch:
                return np.stack(grids), np.stack(samps)
            return jnp.stack(grids), jnp.stack(samps)

        program = dl_mod.get_dl_slot_program(requests[0], self.cfg)
        batch = []
        for c, (req, txd) in enumerate(zip(requests, tx_datas)):
            vals = dl_mod.build_dl_slot_inputs(program, req, txd, slot)
            batch.append(program._value_args(
                slot, *vals, tuple(req.pdsch), tuple(req.pdcch),
                tuple(req.ssb)))
        mesh = self.rmesh.mesh
        shard = lambda x: jax.device_put(
            x, NamedSharding(mesh, PartitionSpec(
                "cell", *([None] * (x.ndim - 1)))))
        grid, samples = program.run_batched(slot, batch, shard_fn=shard)
        if fetch:
            return to_host(grid), to_host(samples)
        return grid, samples

    # ------------------------------------------------------------------ UL --

    def process_ul_slot(self, requests: list[UlTtiRequest], samples: np.ndarray):
        """Process one UL slot across all cells.

        Args:
          requests: one UlTtiRequest per cell (len == nof_cells).
          samples: (nof_cells, nof_rx_ports, nsamples, 2) received baseband.

        Returns: list of per-cell indication lists.

        PUSCH PDUs with identical static structure across all cells run as
        ONE sharded program (cells on the mesh "cell" axis).  Everything else
        (PUCCH, PRACH, SRS, odd-shaped PUSCH) dispatches through the per-cell
        UpperPhy.
        """
        assert len(requests) == self.nof_cells
        cfg = self.cfg
        slot = requests[0].slot
        mesh = self.rmesh.mesh
        out: list[list] = [[] for _ in range(self.nof_cells)]

        # Identify PUSCH PDUs batchable across every cell: position i of each
        # request shares a static key.
        nof_pdus = {len(r.pusch) for r in requests}
        batchable = []
        if len(nof_pdus) == 1 and next(iter(nof_pdus)) > 0:
            n = next(iter(nof_pdus))
            for i in range(n):
                keys = {_static_key(r.pusch[i]) for r in requests}
                if len(keys) == 1:
                    batchable.append(i)

        if batchable:
            grid = ofdm_mod.ofdm_demodulate(
                jax.device_put(
                    jnp.asarray(samples),
                    NamedSharding(mesh, P("cell", None, None, None))),
                cfg.nof_subc, cfg.dft_size, cfg.numerology,
                slot % (1 << cfg.numerology),
            )  # (ncell, P, 14, nsubc, 2)
            for i in batchable:
                self._process_pusch_batched(slot, [r.pusch[i] for r in requests],
                                            grid, out)

        # Everything else per cell.
        for c, req in enumerate(requests):
            rest = dataclasses.replace(
                req,
                pusch=tuple(p for i, p in enumerate(req.pusch)
                            if i not in batchable),
            )
            if rest.pusch or rest.pucch or rest.prach or rest.srs:
                out[c].extend(self.cell_phys[c].process_ul_slot(
                    rest, samples[c], validate=False))
        return out

    def _process_pusch_batched(self, slot, pdus, grid, out):
        cfg = self.cfg
        p0 = pdus[0]
        exp = self.expert
        nof_ack = getattr(p0, "nof_harq_ack_bits", 0)
        rx_cfg = PuschRxConfig(
            nof_rb=p0.rb_size, modulation=p0.modulation,
            target_code_rate=p0.target_code_rate, nof_layers=p0.nof_layers,
            nof_ofdm_symbols=p0.nof_symbols,
            dmrs_symbols=tuple(s - p0.start_symbol for s in p0.dmrs_symbols),
            rv=p0.rv, start_symbol=p0.start_symbol, rb_start=p0.rb_start,
            nof_rx_ports=cfg.nof_rx_ports, dft_size=cfg.dft_size,
            numerology=cfg.numerology, dynamic_params=True,
            nof_harq_ack_bits=nof_ack,
            nof_ldpc_iterations=exp.pusch_decoder_max_iterations,
            use_pallas_decoder=exp.use_pallas_decoder,
        )
        k0 = p0.rb_start * 12
        sub = grid[:, :, p0.start_symbol:p0.start_symbol + p0.nof_symbols,
                   k0:k0 + rx_cfg.nof_subc, :]

        # Per-cell DM-RS references, descrambling signs (and, with ACK on
        # PUSCH, placeholder fix signs) as inputs.
        if nof_ack:
            from ..models.pusch_rx import cached_demux_plan
            from ..ops.ulsch_demux import placeholder_fix_signs
            from ..ran.modulation import bits_per_symbol

            plan, _ = cached_demux_plan(rx_cfg)
        refs, signs, ack_fixes = [], [], []
        for pdu in pdus:
            ref = np.stack([
                dmrs_type1_sequence(slot, s, pdu.n_id, pdu.rb_size,
                                    prb_start=pdu.rb_start)
                for s in pdu.dmrs_symbols
            ])
            refs.append(np_to_pair(ref))
            cinit = ((pdu.rnti << 15) + pdu.n_id) & 0x7FFFFFFF
            scr = prg_mod.gold_sequence_bits(cinit, rx_cfg.nof_codeword_bits)
            signs.append(1 - 2 * scr.astype(np.int8))
            if nof_ack:
                ack_fixes.append(placeholder_fix_signs(
                    plan.ack_bit_idx, nof_ack,
                    bits_per_symbol(p0.modulation), scr))
        mesh = self.rmesh.mesh
        cell_sh = lambda x, nd: jax.device_put(
            x, NamedSharding(mesh, P("cell", *([None] * (nd - 1)))))
        ref_in = cell_sh(jnp.asarray(np.stack(refs)), 4)
        signs_in = cell_sh(jnp.asarray(np.stack(signs)), 2)
        uci_fix = None
        if nof_ack:
            uci_fix = (cell_sh(jnp.asarray(np.stack(ack_fixes)), 2), None, None)

        # HARQ riding the batch: retransmitting cells contribute their stored
        # soft bits, new-data cells an all-zero buffer (the promotion sum is
        # the identity on zeros, bit-exact with not combining), so ONE
        # program serves any new-data/retx mix
        # (reference: include/srsran/phy/upper/rx_buffer_pool.h:40-106).
        seg = rx_cfg.segmentation
        ncb, nbits = seg.nof_cb, seg.nof_cw_bits_per_cb
        buf_idxs = []
        harq_rows = []
        for c, pdu in enumerate(pdus):
            pool = self.harq_pools[c]
            bi = pool.reserve(slot, pdu.rnti, pdu.harq_id, ncb,
                              new_data=pdu.new_data)
            buf_idxs.append(bi)
            if bi is None and not pdu.new_data:
                self.nof_dropped_harq_reservations += 1
                import logging

                logging.getLogger("multi_cell_phy").warning(
                    "HARQ pool exhausted: cell=%d rnti=0x%x harq=%d "
                    "retransmission decodes without soft-combining history",
                    c, pdu.rnti, pdu.harq_id)
            if bi is not None and not pdu.new_data:
                harq_rows.append(pool.get_soft(bi, ncb, nbits))
            else:
                harq_rows.append(jnp.zeros((ncb, nbits), jnp.int8))
        harq_in = cell_sh(jnp.stack(harq_rows), 3)

        rx = cached_pusch_rx_from_grid(rx_cfg)
        res = rx(sub, harq_in, ref_in, signs_in, uci_fix)
        ok = to_host(res["tb_crc_ok"])
        bits = flatten_tb_bits(to_host(res["tb_bits_cb"]), rx_cfg.tbs)
        ack_bits = to_host(res["harq_ack_bits"]) if nof_ack else None
        ack_metric = to_host(res["harq_ack_metric"]) if nof_ack else None
        for c, pdu in enumerate(pdus):
            if buf_idxs[c] is not None:
                self.harq_pools[c].store(buf_idxs[c], ncb, nbits,
                                         res["harq_soft"][c])
            out[c].append(CrcIndication(slot=slot, rnti=pdu.rnti,
                                        harq_id=pdu.harq_id,
                                        tb_crc_ok=bool(ok[c])))
            out[c].append(RxDataIndication(
                slot=slot, rnti=pdu.rnti, harq_id=pdu.harq_id,
                tb_bits=bits[c] if ok[c] else None))
            if nof_ack:
                from ..fapi.pdus import UciIndication

                out[c].append(UciIndication(
                    slot=slot, rnti=pdu.rnti, harq_bits=ack_bits[c],
                    uci_bits=None, valid=bool(ack_metric[c] > 0.0)))
            if ok[c]:
                self.harq_pools[c].release(pdu.rnti, pdu.harq_id)
