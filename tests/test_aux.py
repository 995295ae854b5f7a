"""Tests for auxiliary subsystems: EVM, amplitude control, radio gateways,
tracing, config loading."""

import json
import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops.evm import evm
from srsran_projectvtlmo_tpu.ops.modulation import modulate_np
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.phy.lower import AmplitudeController
from srsran_projectvtlmo_tpu.radio import LoopbackGateway, FileIqSink, FileIqSource
from srsran_projectvtlmo_tpu.utils.tracing import FileEventTracer
from srsran_projectvtlmo_tpu.utils.config import load_config


def test_evm_zero_on_clean_symbols():
    rng = np.random.default_rng(0)
    bits = rng.integers(0, 2, 256 * 4).astype(np.uint8)
    sym = modulate_np(bits, Modulation.QAM16)
    pair = np.stack([sym.real, sym.imag], -1).astype(np.float32)
    e = float(evm(jnp.asarray(pair[None]), Modulation.QAM16)[0])
    assert e < 1e-5
    noisy = pair + 0.05
    e2 = float(evm(jnp.asarray(noisy[None]), Modulation.QAM16)[0])
    assert 0.05 < e2 < 0.12


def test_amplitude_controller_clips():
    ctl = AmplitudeController(gain_db=6.0, full_scale=1.0)
    x = np.zeros((100, 2), np.float32)
    x[:, 0] = 0.6  # 6 dB gain -> 1.2 > full scale
    out, metrics = ctl.process(x)
    assert metrics.clipped_ratio == 1.0
    assert np.allclose(np.sqrt((out ** 2).sum(-1)), 1.0, atol=1e-5)
    ctl2 = AmplitudeController(gain_db=0.0)
    out2, m2 = ctl2.process(x)
    assert m2.clipped_ratio == 0.0
    assert m2.papr_db < 0.1


def test_loopback_gateway_roundtrip():
    gw = LoopbackGateway(nof_ports=1)
    a = np.random.default_rng(1).normal(size=(1, 100, 2)).astype(np.float32)
    gw.transmit(a)
    out = gw.receive(60)
    np.testing.assert_array_equal(out, a[:, :60])
    out2 = gw.receive(60)
    np.testing.assert_array_equal(out2[:, :40], a[:, 60:])
    assert (out2[:, 40:] == 0).all()


def test_file_iq_roundtrip(tmp_path):
    path = tmp_path / "iq.bin"
    sink = FileIqSink(path)
    data = np.arange(20, dtype=np.float32).reshape(10, 2)
    sink.transmit(data)
    sink.close()
    src = FileIqSource(path)
    np.testing.assert_array_equal(src.receive(10)[0], data)


def test_tracer_writes_chrome_json(tmp_path):
    path = tmp_path / "trace.json"
    tr = FileEventTracer(str(path))
    with tr.span("slot_0"):
        tr.instant("cb_decode", count=3)
    tr.close()
    doc = json.loads(path.read_text())
    names = [e.get("name") for e in doc["traceEvents"]]
    assert "slot_0" in names and "cb_decode" in names


def test_config_loading(tmp_path):
    p = tmp_path / "gnb.yml"
    p.write_text("""
cells:
  - nof_rb: 106
    dft_size: 2048
    phys_cell_id: 7
expert_phy:
  pusch_decoder_max_iterations: 8
""")
    cfg = load_config(p)
    assert cfg.cells[0].nof_rb == 106
    assert cfg.cells[0].phys_cell_id == 7
    assert cfg.expert_phy.pusch_decoder_max_iterations == 8


def test_metrics_hub():
    from srsran_projectvtlmo_tpu.phy.metrics import MetricsHub
    hub = MetricsHub()
    for ok in (True, True, False):
        hub.on_slot()
        hub.on_pusch(ok, snr_db=20.0)
    hub.on_uci(True)
    hub.on_prach(2)
    s = hub.snapshot()
    assert s["slots"] == 3
    assert abs(s["pusch"]["ok_ratio"] - 2 / 3) < 1e-3  # snapshot rounds to 4 places
    assert s["pusch"]["avg_snr_db"] == 20.0
    assert s["uci"]["ok_ratio"] == 1.0


@pytest.mark.slow
def test_warmup_precompiles_slot_variants():
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.phy.warmup import precompile_pusch
    from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation
    cfg = PuschRxConfig(nof_rb=4, modulation=Modulation.QPSK, target_code_rate=0.3,
                        dft_size=128, numerology=1)
    seen = []
    pool = precompile_pusch(cfg, nof_slots=2, progress=lambda s, dt: seen.append(s))
    assert sorted(pool) == [0, 1]
    assert seen == [0, 1]


def test_rx_symbol_file_dumper(tmp_path):
    """The dumper decorator appends each completed slot's grid as complex64
    (reference: upper_phy_rx_symbol_handler_printer_decorator.h)."""
    import numpy as np
    from srsran_projectvtlmo_tpu.phy.rx_symbol_handler import (
        RxSymbolHandler, RxSymbolFileDumper)

    path = tmp_path / "rx_symbols.bin"
    inner = RxSymbolHandler(nof_rx_ports=2, nof_subc=24)
    dump = RxSymbolFileDumper(inner, str(path))
    rng = np.random.default_rng(0)
    grids = []
    for slot in range(2):
        g = (rng.normal(size=(2, 14, 24))
             + 1j * rng.normal(size=(2, 14, 24))).astype(np.complex64)
        for sym in range(14):
            dump.handle_rx_symbol(slot, sym, g[:, sym])
        grids.append(g)
        dump.release_slot(slot)
    dump.close()
    raw = np.fromfile(path, np.complex64).reshape(2, 2, 14, 24)
    np.testing.assert_array_equal(raw[0], grids[0])
    np.testing.assert_array_equal(raw[1], grids[1])
    assert dump.nof_slots_written == 2 and dump.nof_dropped_writes == 0
