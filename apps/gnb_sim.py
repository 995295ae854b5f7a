#!/usr/bin/env python3
"""Thin CLI driving the upper-PHY slot pipeline (the apps/gnb equivalent).

Runs a configurable number of DL+UL slots through the full stack with a
loopback "radio": DL slots assemble SSB + PDCCH + PDSCH and OFDM-modulate;
UL slots carry a PUSCH from the built-in UE emulator through an optional TDL
channel into the PUSCH receiver. Prints per-slot results and summary metrics.

Usage:
  python apps/gnb_sim.py --slots 4 --nof-rb 52 --dft 1024 [--config gnb.yml]
  python apps/gnb_sim.py --trace trace.json   # Chrome trace of the slot loop
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--nof-rb", type=int, default=52)
    ap.add_argument("--dft", type=int, default=1024)
    ap.add_argument("--mcs-mod", default="16QAM")
    ap.add_argument("--code-rate", type=float, default=0.5)
    ap.add_argument("--snr-db", type=float, default=30.0)
    ap.add_argument("--channel", default="AWGN", choices=["AWGN", "TDLA", "TDLB", "TDLC"])
    ap.add_argument("--config", default=None, help="YAML cell config")
    ap.add_argument("--trace", default=None, help="write Chrome trace JSON here")
    ap.add_argument("--iq-out", default=None, help="record DL IQ to this file")
    ap.add_argument("--streaming", action="store_true",
                    help="feed UL symbol-by-symbol through the rx-symbol "
                         "handler (reference: upper_phy_rx_symbol_handler)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.fapi.pdus import (
        DlTtiRequest, UlTtiRequest, TxDataRequest, SsbPdu, PdschPdu, PuschPdu,
        CrcIndication,
    )
    from srsran_projectvtlmo_tpu.phy.upper_phy import CellConfig, UpperPhy
    from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
    from srsran_projectvtlmo_tpu.models.ulsch_tx import cached_ulsch_tx
    from srsran_projectvtlmo_tpu.models.channel import ChannelEmulator
    from srsran_projectvtlmo_tpu.models.sch_config import SchChainConfig
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation
    from srsran_projectvtlmo_tpu.ops import ofdm
    from srsran_projectvtlmo_tpu.radio import FileIqSink
    from srsran_projectvtlmo_tpu.utils import tracing
    from srsran_projectvtlmo_tpu.utils.cplx import np_to_pair, pair_to_np

    tracer = tracing.enable_tracing(args.trace) if args.trace else tracing.l1_tracer

    if args.config:
        from srsran_projectvtlmo_tpu.utils.config import load_config

        cell = load_config(args.config).cells[0]
    else:
        cell = CellConfig(nof_rb=args.nof_rb, dft_size=args.dft, numerology=1)

    mod = {m.value: m for m in Modulation}[args.mcs_mod]
    phy = UpperPhy(cell)
    sink = FileIqSink(args.iq_out) if args.iq_out else None

    pusch_rb = min(16, cell.nof_rb)
    ue_cfg = PuschRxConfig(
        nof_rb=pusch_rb, modulation=mod, target_code_rate=args.code_rate,
        rnti=0x4601, n_id=cell.phys_cell_id, dft_size=cell.dft_size,
        numerology=cell.numerology, dmrs_symbols=(2,),
    )
    ue_tx = cached_ulsch_tx(ue_cfg)

    pdsch = PdschPdu(rnti=0x4601, rb_start=0, rb_size=min(24, cell.nof_rb),
                     modulation=mod, target_code_rate=args.code_rate,
                     start_symbol=2, nof_symbols=12, dmrs_symbols=(4,),
                     n_id=cell.phys_cell_id)
    dl_sch = SchChainConfig(nof_rb=pdsch.rb_size, modulation=mod,
                            target_code_rate=args.code_rate, nof_ofdm_symbols=12,
                            dmrs_symbols=(2,), rnti=0x4601, n_id=cell.phys_cell_id,
                            start_symbol=2)

    rng = np.random.default_rng(0)
    crc_ok = 0
    t_start = time.perf_counter()
    for slot in range(args.slots):
        with tracer.span(f"dl_slot_{slot}"):
            tb = rng.integers(0, 2, dl_sch.tbs).astype(np.uint8)
            dl_req = DlTtiRequest(
                slot=slot,
                ssb=(SsbPdu(phys_cell_id=cell.phys_cell_id, ssb_block_index=0,
                            sfn=0, half_radio_frame=False),) if slot == 0 else (),
                pdsch=(pdsch,),
            )
            grid, samples = phy.process_dl_slot(dl_req, TxDataRequest(slot, [tb]))
            if sink:
                sink.transmit(samples)

        with tracer.span(f"ul_slot_{slot}"):
            import dataclasses

            ue_cfg_slot = dataclasses.replace(ue_cfg, slot=slot)
            ue_tx_slot = cached_ulsch_tx(ue_cfg_slot)
            ul_tb = rng.integers(0, 2, ue_cfg_slot.tbs).astype(np.uint8)
            alloc_grid_pair, _ = ue_tx_slot(jnp.asarray(ul_tb[None]))
            alloc = pair_to_np(np.asarray(alloc_grid_pair)[0])
            carrier = np.zeros((14, cell.nof_subc), np.complex64)
            carrier[:, : pusch_rb * 12] = alloc
            emu = ChannelEmulator(args.channel, args.snr_db, cell.nof_rx_ports,
                                  cell.nof_subc, 15e3 * (1 << cell.numerology), seed=slot)
            rx_grid, _ = emu.run(carrier)
            rx_samples = np.stack([
                np.asarray(ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid[p])),
                                              cell.dft_size, cell.numerology,
                                              slot % (1 << cell.numerology)))
                for p in range(cell.nof_rx_ports)
            ])
            pusch_pdu = PuschPdu(rnti=0x4601, rb_start=0, rb_size=pusch_rb,
                                 modulation=mod, target_code_rate=args.code_rate,
                                 n_id=cell.phys_cell_id, dmrs_symbols=(2,))
            ul_req = UlTtiRequest(slot=slot, pusch=(pusch_pdu,))
            if args.streaming:
                # Symbol-streaming dispatch: demodulate the carrier once, then
                # feed the grid symbol by symbol; the PDU fires when its last
                # symbol arrives (reference:
                # upper_phy_rx_symbol_handler_impl.cpp:48-131).
                from srsran_projectvtlmo_tpu.phy.rx_symbol_handler import (
                    RxSymbolHandler)

                handler = RxSymbolHandler(cell.nof_rx_ports, cell.nof_subc)
                handler.repo.add(slot, pusch_pdu)
                full_grid = pair_to_np(np.asarray(ofdm.ofdm_demodulate(
                    jnp.asarray(rx_samples), cell.nof_subc, cell.dft_size,
                    cell.numerology, slot % (1 << cell.numerology))))
                inds = []
                for sym in range(14):
                    ready = handler.handle_rx_symbol(slot, sym, full_grid[:, sym, :])
                    for pdu in ready:
                        req = UlTtiRequest(slot=slot, pusch=(pdu,))
                        inds.extend(phy.process_ul_slot(req, rx_samples,
                                                        validate=False))
                handler.release_slot(slot)
            else:
                inds = phy.process_ul_slot(ul_req, rx_samples)
            for ind in inds:
                if isinstance(ind, CrcIndication):
                    crc_ok += int(ind.tb_crc_ok)
                    print(f"slot {slot}: PUSCH rnti=0x{ind.rnti:04x} "
                          f"crc={'OK' if ind.tb_crc_ok else 'KO'}")

    dt = time.perf_counter() - t_start
    print(f"\n{args.slots} slots in {dt:.2f}s ({args.slots / dt:.1f} slots/s); "
          f"UL CRC OK {crc_ok}/{args.slots}")
    if sink:
        sink.close()
    tracer.close()
    return 0 if crc_ok == args.slots else 1


if __name__ == "__main__":
    sys.exit(main())
