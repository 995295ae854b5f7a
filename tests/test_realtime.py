"""Lower-PHY realtime machinery: slot pipelining, DL/UL chains, PRACH window."""

import threading
import time

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.fapi.pdus import (
    DlTtiRequest, UlTtiRequest, TxDataRequest, PdschPdu, PuschPdu,
    CrcIndication,
)
from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
from srsran_projectvtlmo_tpu.models.ulsch_tx import build_ulsch_tx_slot
from srsran_projectvtlmo_tpu.phy.error_handler import UpperPhyErrorHandler
from srsran_projectvtlmo_tpu.phy.realtime import (
    SlotPipeline, BasebandChain, LowerPhyRealtime, PrachOccasionCollector,
)
from srsran_projectvtlmo_tpu.phy.upper_phy import CellConfig, UpperPhy
from srsran_projectvtlmo_tpu.ran.modulation import Modulation


class TestSlotPipeline:
    def test_window_bound_and_order(self):
        drained = []
        eh = UpperPhyErrorHandler(slot_duration_s=10.0)
        p = SlotPipeline(eh, max_proc_delay_slots=2, sync=lambda r: r)
        for s in range(5):
            p.submit(s, f"r{s}", on_done=lambda slot, res: drained.append(slot))
            assert p.nof_in_flight <= 2
        p.flush()
        assert drained == [0, 1, 2, 3, 4]
        assert p.nof_in_flight == 0

    def test_late_slot_recorded(self):
        events = []
        eh = UpperPhyErrorHandler(slot_duration_s=1e-9,
                                  on_error=lambda k, s, l: events.append((k, s)))
        p = SlotPipeline(eh, max_proc_delay_slots=1,
                         sync=lambda r: time.sleep(0.002) or r)
        p.submit(0, "a")
        p.submit(1, "b")
        p.flush()
        assert any(k == "late_pipeline" for k, _ in events)


class TestBasebandChain:
    def test_self_requeue_and_throttle(self):
        slow = threading.Event()

        def work(x):
            time.sleep(0.005)
            return x * 2

        ch = BasebandChain("t", work, queue_depth=2)
        ch.start()
        t0 = time.perf_counter()
        for i in range(6):
            ch.enqueue(i)
        # With depth 2 the producer was throttled: enqueueing 6 items takes
        # at least ~4 processing periods.
        assert time.perf_counter() - t0 > 0.01
        got = sorted(ch.wait_result(timeout=1.0)[1] for _ in range(6))
        assert got == [0, 2, 4, 6, 8, 10]
        ch.stop()

    def test_exception_surfaced(self):
        def bad(x):
            raise ValueError("boom")

        ch = BasebandChain("t2", bad, queue_depth=1)
        ch.start()
        ch.enqueue(1)
        req, res = ch.wait_result(timeout=1.0)
        assert isinstance(res, ValueError)
        ch.stop()


class _LoopbackGateway:
    def __init__(self):
        self.tx = []
        self.rx_buf = None

    def transmit(self, samples):
        self.tx.append(np.asarray(samples))

    def receive(self, n):
        return self.rx_buf


class TestLowerPhyRealtime:
    def test_dl_ul_chains_end_to_end(self):
        cell = CellConfig(nof_rb=24, dft_size=512, numerology=1)
        phy = UpperPhy(cell)
        gw = _LoopbackGateway()
        eh = UpperPhyErrorHandler(slot_duration_s=60.0)
        rt = LowerPhyRealtime(phy, gw, eh, queue_depth=2)
        rt.start()

        # DL: one PDSCH slot through the chain.
        pdsch = PdschPdu(rnti=0x11, rb_start=0, rb_size=8,
                         modulation=Modulation.QPSK, target_code_rate=0.4,
                         start_symbol=0, nof_symbols=14, dmrs_symbols=(2,))
        from srsran_projectvtlmo_tpu.phy.dl_slot import get_dl_slot_program
        req = DlTtiRequest(slot=0, pdsch=(pdsch,))
        prog = get_dl_slot_program(req, cell)
        tb = np.random.default_rng(0).integers(
            0, 2, prog.pdsch_cfgs[0].tbs).astype(np.uint8)
        rt.dl.enqueue((req, TxDataRequest(slot=0, tb_bits=[tb])))
        _, shape = rt.dl.wait_result(timeout=120.0)
        assert gw.tx and not isinstance(shape, Exception)

        # UL: PUSCH loopback through the chain.
        rx_cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM16,
                               target_code_rate=0.5, rnti=0x21, n_id=1,
                               rb_start=4, nof_rx_ports=1,
                               dft_size=cell.dft_size, numerology=1, slot=1,
                               dmrs_symbols=(2,))
        tx = build_ulsch_tx_slot(rx_cfg)
        tb2 = np.random.default_rng(1).integers(0, 2, rx_cfg.tbs).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb2[None]))
        from srsran_projectvtlmo_tpu.ops import ofdm
        carrier = np.zeros((14, cell.nof_subc, 2), np.float32)
        carrier[:, 4 * 12:20 * 12, :] = np.asarray(grid_pair)[0]
        gw.rx_buf = np.asarray(ofdm.ofdm_modulate(
            jnp.asarray(carrier), cell.dft_size, 1, 1 % 2))[None]
        ul_req = UlTtiRequest(slot=1, pusch=(PuschPdu(
            rnti=0x21, rb_start=4, rb_size=16, modulation=Modulation.QAM16,
            target_code_rate=0.5, n_id=1, dmrs_symbols=(2,)),))
        rt.ul.enqueue((ul_req, None, None))
        _, inds = rt.ul.wait_result(timeout=120.0)
        assert not isinstance(inds, Exception)
        crc = [i for i in inds if isinstance(i, CrcIndication)]
        assert crc and crc[0].tb_crc_ok
        rt.stop()
        assert eh.stats.late_dl == 0 and eh.stats.late_ul == 0


class TestPrachCollector:
    def test_window_state_machine(self):
        c = PrachOccasionCollector()
        c.configure(slot=4, start_symbol=2, nof_symbols=3)
        assert c.state == c.WAIT
        assert c.on_symbol(4, 0, np.zeros(8)) is None  # before window
        assert c.on_symbol(3, 2, np.zeros(8)) is None  # wrong slot
        assert c.on_symbol(4, 2, np.ones(8)) is None
        assert c.state == c.COLLECTING
        assert c.on_symbol(4, 3, np.ones(8)) is None
        win = c.on_symbol(4, 4, np.ones(8))
        assert win is not None and win.shape == (3, 8)
        # Collector resets after surrendering the window.
        assert c.on_symbol(4, 2, np.ones(8)) is None
