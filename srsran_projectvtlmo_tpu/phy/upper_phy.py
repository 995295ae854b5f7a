"""Upper-PHY orchestration: the du_low-equivalent slot engine for one cell.

Consumes FAPI-shaped PDUs (fapi.pdus) and drives the jitted slot programs:
DL: SSB assembly + PDCCH candidates + PDSCH onto the cell resource grid, then
OFDM modulation; UL: carrier OFDM demodulation once, then PUSCH (with the
device-resident HARQ pool), PUCCH 0/1/2 and PRACH processing, producing CRC /
RxData / UCI / RACH indications.

Replaces the reference's executor/pool machinery
(reference: lib/phy/upper/upper_phy_impl.h:46-130, upper_phy_factories.cpp,
downlink_processor_single_executor_impl.cpp, uplink_processor_impl.cpp:70-153)
with per-configuration compiled-program caches; "pools" become jit caches and
batching, and task-type executors become independent program dispatches.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fapi.pdus import (
    DlTtiRequest, UlTtiRequest, TxDataRequest,
    CrcIndication, RxDataIndication, UciIndication, RachIndication,
)
from ..models.pdsch_tx import PdschTxConfig
from ..models.pusch_rx import PuschRxConfig, cached_pusch_rx_from_grid
from ..models.sch_tx import build_sch_symbols_tx
from ..ops import ofdm as ofdm_mod
from ..ops import prach as prach_mod
from ..ops.dmrs import dmrs_type1_sequence
from ..utils.cplx import np_to_pair, pair_to_np
from ..utils.xfer import to_host
from . import pbch as pbch_mod
from . import pdcch as pdcch_mod
from . import pucch as pucch_mod
from .harq import RxBufferPool


@dataclass(frozen=True)
class CellConfig:
    nof_rb: int = 273
    dft_size: int = 4096
    numerology: int = 1
    nof_tx_ports: int = 1
    nof_rx_ports: int = 1
    phys_cell_id: int = 1
    #: Subcarrier offset where the SSB sits in the carrier grid.
    ssb_subc_offset: int = 0
    #: First RB of the CORESET for PDCCH placement.
    coreset_rb_start: int = 0

    @property
    def nof_subc(self) -> int:
        return self.nof_rb * 12


class FapiValidationError(ValueError):
    """Raised when a slot message fails FAPI validation
    (reference: fapi message_validators reject + error.indication path)."""

    def __init__(self, report):
        self.report = report
        super().__init__("; ".join(str(e) for e in report.errors))


class UpperPhy:
    """One cell's upper PHY: DL slot assembly and UL slot processing."""

    def __init__(self, cfg: CellConfig):
        self.cfg = cfg
        self.harq_pool = RxBufferPool()

    # ------------------------------------------------------------------ DL --

    def process_dl_slot(self, request: DlTtiRequest, tx_data: TxDataRequest | None = None,
                        validate: bool = True):
        """Build the DL slot and return (grid (nports, nsym, nsubc) complex64
        -- squeezed to (nsym, nsubc) for single-port cells -- and the OFDM
        samples (..., nsamples, 2) float32 numpy)."""
        if validate:
            from ..fapi import validators as _v

            rep = _v.validate_dl_tti_request(request)
            if tx_data is not None:
                rep.errors.extend(_v.validate_tx_data_request(tx_data, request).errors)
            if not rep.ok:
                raise FapiValidationError(rep)
        cfg = self.cfg
        slot = request.slot
        ports = np.zeros((cfg.nof_tx_ports, 14, cfg.nof_subc), np.complex64)
        grid = ports[0]  # SSB and PDCCH map to the first antenna port

        for ssb in request.ssb:
            msg = pbch_mod.PbchMessage(
                sfn=ssb.sfn, ssb_idx=ssb.ssb_block_index,
                half_radio_frame=ssb.half_radio_frame, n_id=ssb.phys_cell_id,
                l_max=ssb.l_max, mib_payload=ssb.mib_payload,
            )
            ssb_grid = pbch_mod.assemble_ssb(msg)
            k0 = cfg.ssb_subc_offset + ssb.ssb_offset_pointa * 12
            grid[0:4, k0:k0 + pbch_mod.SSB_NSUBC] += ssb_grid

        for pdu in request.pdcch:
            syms = pdcch_mod.pdcch_modulate(
                pdcch_mod.PdcchCandidateConfig(
                    nof_dci_bits=pdu.nof_dci_bits,
                    aggregation_level=pdu.aggregation_level,
                    rnti=pdu.rnti, n_id=pdu.n_id, n_rnti=pdu.n_rnti,
                ),
                self._dci_payload(pdu),
            )
            # Non-interleaved CCE-to-REG mapping: 6 consecutive RBs per CCE in
            # the CORESET, DM-RS on subcarriers {1,5,9} of each RB.
            rb0 = (cfg.coreset_rb_start + pdu.coreset_rb_start) + pdu.cce_index * 6
            self._map_pdcch(grid, slot, pdu.start_symbol, rb0, pdu.aggregation_level, syms, pdu)

        for i, pdu in enumerate(request.pdsch):
            tb = tx_data.tb_bits[i] if tx_data is not None else None
            self._map_pdsch(ports, slot, pdu, tb)

        out_grid = ports[0] if cfg.nof_tx_ports == 1 else ports
        pair = jnp.asarray(np_to_pair(out_grid))
        samples = ofdm_mod.ofdm_modulate(
            pair, cfg.dft_size, cfg.numerology, slot % (1 << cfg.numerology)
        )
        return out_grid, to_host(samples)

    def _dci_payload(self, pdu) -> np.ndarray:
        # The DCI payload bits arrive from L2; tests set them via the attribute.
        payload = getattr(pdu, "payload", None)
        if payload is None:
            return np.zeros(pdu.nof_dci_bits, np.uint8)
        return np.asarray(payload, np.uint8)

    def _map_pdcch(self, grid, slot, start_symbol, rb0, aggregation_level, syms, pdu):
        """Place candidate symbols + DM-RS over `aggregation_level` CCEs."""
        from ..ops import prg as prg_mod

        si = 0
        for cce in range(aggregation_level):
            for rb in range(6):
                k0 = (rb0 + cce * 6 + rb) * 12
                for k in range(12):
                    if k % 4 == 1:
                        continue  # DM-RS positions {1, 5, 9}
                    grid[start_symbol, k0 + k] = syms[si]
                    si += 1
        # DM-RS: Gold QPSK over the candidate's REGs (TS 38.211 Section 7.4.1.3).
        cinit = ((1 << 17) * (14 * slot + start_symbol + 1) * (2 * pdu.n_id + 1) + 2 * pdu.n_id) % (1 << 31)
        npil = aggregation_level * 6 * 3
        m0 = (rb0) * 3
        bits = prg_mod.gold_sequence_bits(cinit, 2 * (m0 + npil)).astype(np.float32)[2 * m0:]
        vals = (1 - 2 * bits) / np.sqrt(2)
        pil = (vals[0::2] + 1j * vals[1::2]).astype(np.complex64)
        pi = 0
        for cce in range(aggregation_level):
            for rb in range(6):
                k0 = (rb0 + cce * 6 + rb) * 12
                for k in (1, 5, 9):
                    grid[start_symbol, k0 + k] = pil[pi]
                    pi += 1

    def _map_pdsch(self, ports, slot, pdu, tb_bits):
        """Map one PDSCH onto the antenna-port grids with identity-style
        precoding (layer l -> port l mod P; reference resource_grid_mapper
        applies the configured precoding matrix per RE pattern)."""
        cfg = self.cfg
        grid = ports if ports.ndim == 2 else ports[0]
        sch_cfg = PdschTxConfig(
            nof_rb=pdu.rb_size, modulation=pdu.modulation,
            target_code_rate=pdu.target_code_rate, nof_layers=pdu.nof_layers,
            nof_ofdm_symbols=pdu.nof_symbols, dmrs_symbols=tuple(
                s - pdu.start_symbol for s in pdu.dmrs_symbols
            ),
            rv=pdu.rv, rnti=pdu.rnti, n_id=pdu.n_id,
            dft_size=cfg.dft_size, numerology=cfg.numerology, slot=slot,
        )
        if tb_bits is None:
            tb_bits = np.zeros(sch_cfg.tbs, np.uint8)
        assert len(tb_bits) == sch_cfg.tbs, f"TB size {len(tb_bits)} != {sch_cfg.tbs}"
        syms = to_host(build_sch_symbols_tx(sch_cfg)(jnp.asarray(tb_bits[None])))[0]
        nl = pdu.nof_layers
        port_grids = ports if ports.ndim == 3 else ports[None]
        # Layer map: x_l(i) = d(nl*i + l); identity precoding layer->port.
        layers = syms.reshape(-1, nl).T.reshape(nl, len(sch_cfg.data_symbols),
                                                sch_cfg.nof_subc)
        k0 = pdu.rb_start * 12
        di = 0
        occ = np.ones((nl, 6 * pdu.rb_size), np.float32)
        if nl == 2:
            occ[1, 1::2] = -1.0
        for s in range(pdu.nof_symbols):
            sym = pdu.start_symbol + s
            if sym in pdu.dmrs_symbols:
                ref = dmrs_type1_sequence(slot, sym, pdu.n_id, pdu.rb_size,
                                          prb_start=pdu.rb_start)
                for l in range(nl):
                    port_grids[l % port_grids.shape[0]][sym, k0:k0 + sch_cfg.nof_subc][0::2] = ref * occ[l]
            else:
                for l in range(nl):
                    port_grids[l % port_grids.shape[0]][sym, k0:k0 + sch_cfg.nof_subc] = layers[l, di]
                di += 1

    # ------------------------------------------------------------------ UL --

    def process_ul_slot(self, request: UlTtiRequest, samples: np.ndarray,
                        prach_samples: np.ndarray | None = None,
                        validate: bool = True):
        """Process one UL slot.

        Args:
          request: the slot's UL PDUs.
          samples: (nof_rx_ports, nsamples, 2) received baseband.
          prach_samples: optional (L, 2) frequency-domain PRACH occasion.

        Returns a list of indication objects.
        """
        if validate:
            from ..fapi import validators as _v

            rep = _v.validate_ul_tti_request(request)
            if not rep.ok:
                raise FapiValidationError(rep)
        cfg = self.cfg
        slot = request.slot
        indications: list = []

        grid = None
        if request.pusch or request.pucch:
            grid = ofdm_mod.ofdm_demodulate(
                jnp.asarray(samples), cfg.nof_subc, cfg.dft_size, cfg.numerology,
                slot % (1 << cfg.numerology),
            )  # (P, 14, nsubc, 2)

        for pdu in request.pusch:
            indications.extend(self._process_pusch(slot, pdu, grid))

        for pdu in request.pucch:
            indications.append(self._process_pucch(slot, pdu, grid))

        if prach_samples is not None:
            for pdu in request.prach:
                det_cfg = prach_mod.PrachDetectorConfig(
                    sequence_length=prach_mod.LONG if pdu.format_is_long else prach_mod.SHORT,
                    root_sequence_index=pdu.root_sequence_index,
                    zero_correlation_zone=pdu.zero_correlation_zone,
                    ncs_table="1.25kHz" if pdu.format_is_long else "short",
                )
                dets = prach_mod.prach_detect(jnp.asarray(prach_samples[None]), det_cfg)[0]
                indications.append(RachIndication(slot=slot, preambles=dets))

        return indications

    def _process_pusch(self, slot, pdu, grid):
        cfg = self.cfg
        rx_cfg = PuschRxConfig(
            nof_rb=pdu.rb_size, modulation=pdu.modulation,
            target_code_rate=pdu.target_code_rate, nof_layers=pdu.nof_layers,
            nof_ofdm_symbols=pdu.nof_symbols,
            dmrs_symbols=tuple(s - pdu.start_symbol for s in pdu.dmrs_symbols),
            rv=pdu.rv, rnti=pdu.rnti, n_id=pdu.n_id,
            start_symbol=pdu.start_symbol, rb_start=pdu.rb_start,
            nof_rx_ports=cfg.nof_rx_ports, dft_size=cfg.dft_size,
            numerology=cfg.numerology, slot=slot,
        )
        k0 = pdu.rb_start * 12
        sub = grid[None, :, pdu.start_symbol:pdu.start_symbol + pdu.nof_symbols,
                   k0:k0 + rx_cfg.nof_subc, :]
        seg = rx_cfg.segmentation
        buf_idx = self.harq_pool.reserve(
            slot, pdu.rnti, pdu.harq_id, seg.nof_cb, new_data=pdu.new_data
        )
        rx = cached_pusch_rx_from_grid(rx_cfg)
        harq = None
        if buf_idx is not None and not pdu.new_data:
            n = seg.nof_cw_bits_per_cb
            harq = self.harq_pool._soft[buf_idx, :seg.nof_cb, :n][None]
        out = rx(sub, harq)
        if buf_idx is not None:
            n = seg.nof_cw_bits_per_cb
            self.harq_pool._soft = self.harq_pool._soft.at[
                buf_idx, :seg.nof_cb, :n
            ].set(out["harq_soft"][0])
        ok = bool(to_host(out["tb_crc_ok"])[0])
        if ok:
            self.harq_pool.release(pdu.rnti, pdu.harq_id)
        return [
            CrcIndication(slot=slot, rnti=pdu.rnti, harq_id=pdu.harq_id, tb_crc_ok=ok),
            RxDataIndication(
                slot=slot, rnti=pdu.rnti, harq_id=pdu.harq_id,
                tb_bits=to_host(out["tb_bits"])[0] if ok else None,
            ),
        ]

    def _process_pucch(self, slot, pdu, grid):
        k0 = pdu.prb_start * 12
        sub = to_host(grid)[0, pdu.start_symbol:pdu.start_symbol + pdu.nof_symbols,
                               k0:k0 + pdu.nof_prb * 12, :]
        if pdu.format == 0:
            f0 = pucch_mod.PucchFormat0Config(
                n_id=pdu.n_id, slot=slot, start_symbol=pdu.start_symbol,
                nof_symbols=pdu.nof_symbols,
                initial_cyclic_shift=pdu.initial_cyclic_shift,
                nof_harq_bits=pdu.nof_harq_bits, sr_opportunity=pdu.sr_opportunity,
            )
            bits, metric, sr = pucch_mod.detect_pucch_format0(jnp.asarray(sub[None]), f0)
            return UciIndication(slot=slot, rnti=pdu.rnti,
                                 harq_bits=to_host(bits)[0], uci_bits=None,
                                 valid=bool(to_host(metric)[0] > 0.25),
                                 sr_detected=bool(to_host(sr)[0]))
        if pdu.format == 1:
            f1 = pucch_mod.PucchFormat1Config(
                n_id=pdu.n_id, slot=slot, start_symbol=pdu.start_symbol,
                nof_symbols=pdu.nof_symbols,
                initial_cyclic_shift=pdu.initial_cyclic_shift,
                time_domain_occ=pdu.time_domain_occ, nof_harq_bits=pdu.nof_harq_bits,
            )
            bits, metric = pucch_mod.detect_pucch_format1(jnp.asarray(sub[None]), f1)
            return UciIndication(slot=slot, rnti=pdu.rnti,
                                 harq_bits=to_host(bits)[0], uci_bits=None,
                                 valid=bool(to_host(metric)[0] > 0.1))
        if pdu.format == 2:
            f2 = pucch_mod.PucchFormat2Config(
                n_id=pdu.n_id, n_id0=pdu.n_id0, rnti=pdu.rnti, slot=slot,
                start_symbol=pdu.start_symbol, nof_symbols=pdu.nof_symbols,
                nof_prb=pdu.nof_prb, nof_uci_bits=pdu.nof_uci_bits,
            )
            bits, ok = pucch_mod.process_pucch_format2(jnp.asarray(sub[None]), f2)
            return UciIndication(slot=slot, rnti=pdu.rnti,
                                 harq_bits=np.empty(0, np.uint8),
                                 uci_bits=to_host(bits)[0],
                                 valid=bool(to_host(ok)[0]))
        raise ValueError(f"unsupported PUCCH format {pdu.format}")
