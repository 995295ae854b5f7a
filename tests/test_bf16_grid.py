"""bf16 resource grids: EVM-bounded parity vs the float32 path."""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig, build_pusch_rx_slot
from srsran_projectvtlmo_tpu.models.ulsch_tx import build_ulsch_tx_slot
from srsran_projectvtlmo_tpu.models.channel import ChannelEmulator
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.ops import ofdm


@pytest.mark.slow
def test_bf16_grid_decodes_with_bounded_evm_penalty():
    cfg32 = PuschRxConfig(nof_rb=24, modulation=Modulation.QAM64,
                          target_code_rate=0.6, nof_rx_ports=1,
                          dft_size=512, numerology=1)
    cfg16 = dataclasses.replace(cfg32, grid_bf16=True)
    tx = build_ulsch_tx_slot(cfg32)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (2, cfg32.tbs)).astype(np.uint8)
    grid_pair, _ = tx(jnp.asarray(tb))
    g = np.asarray(grid_pair)
    gc = g[..., 0] + 1j * g[..., 1]
    emu = ChannelEmulator("TDLA", 25.0, 1, cfg32.nof_subc, cfg32.scs_hz, seed=3)
    rx_slots = []
    for i in range(2):
        rx_grid, _ = emu.run(gc[i])
        rx_slots.append(rx_grid)
    rx_np = np.stack(rx_slots)  # (2, 1, 14, nsubc)
    pair = np.stack([rx_np.real, rx_np.imag], -1).astype(np.float32)
    samples = np.asarray(ofdm.ofdm_modulate(jnp.asarray(pair), cfg32.dft_size, 1, 0))

    out32 = build_pusch_rx_slot(cfg32)(jnp.asarray(samples))
    out16 = build_pusch_rx_slot(cfg16)(jnp.asarray(samples))

    ok32 = np.asarray(out32["tb_crc_ok"])
    ok16 = np.asarray(out16["tb_crc_ok"])
    assert ok32.all() and ok16.all()
    np.testing.assert_array_equal(np.asarray(out16["tb_bits_cb"]),
                                  np.asarray(out32["tb_bits_cb"]))
    evm32 = np.asarray(out32["evm"])
    evm16 = np.asarray(out16["evm"])
    # bf16 quantization adds at most ~0.4% absolute EVM at QAM64 scale
    # (bf16 has 8 mantissa bits: per-RE quantization SNR ~ 40 dB).
    assert np.all(evm16 - evm32 < 0.01), (evm16, evm32)
    # SNR estimates stay within 1 dB.
    assert np.all(np.abs(np.asarray(out16["snr_db"])
                         - np.asarray(out32["snr_db"])) < 1.0)


@pytest.mark.slow
def test_bf16_grid_4port_2layer_parity():
    """The north-star shape (4 ports, 2 layers) decodes identically with
    cbf16-equivalent grids, EVM penalty bounded (VERDICT r2 item 1's
    precondition for flipping the default)."""
    cfg32 = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM64,
                          target_code_rate=0.6, nof_rx_ports=4, nof_layers=2,
                          dft_size=512, numerology=1)
    cfg16 = dataclasses.replace(cfg32, grid_bf16=True)
    tx = build_ulsch_tx_slot(cfg32)
    rng = np.random.default_rng(4)
    tb = rng.integers(0, 2, (1, cfg32.tbs)).astype(np.uint8)
    layer_grids, _ = tx(jnp.asarray(tb))
    g = np.asarray(layer_grids)[0]  # (L, 14, nsubc, 2)
    gc = g[..., 0] + 1j * g[..., 1]
    # Well-conditioned 4x2 mixing + small noise.
    mix = np.exp(-2j * np.pi * np.outer(np.arange(4), np.arange(2)) / 4) / 2.0
    rx = np.einsum("pl,lsk->psk", mix, gc)
    rx += 0.01 * (rng.normal(size=rx.shape) + 1j * rng.normal(size=rx.shape))
    pair = np.stack([rx.real, rx.imag], -1).astype(np.float32)[None]
    samples = np.asarray(ofdm.ofdm_modulate(jnp.asarray(pair),
                                            cfg32.dft_size, 1, 0))

    out32 = build_pusch_rx_slot(cfg32)(jnp.asarray(samples))
    out16 = build_pusch_rx_slot(cfg16)(jnp.asarray(samples))
    assert np.asarray(out32["tb_crc_ok"]).all()
    assert np.asarray(out16["tb_crc_ok"]).all()
    np.testing.assert_array_equal(np.asarray(out16["tb_bits_cb"]),
                                  np.asarray(out32["tb_bits_cb"]))
    evm32 = np.asarray(out32["evm"])
    evm16 = np.asarray(out16["evm"])
    assert np.all(evm16 - evm32 < 0.01), (evm16, evm32)
