"""End-to-end PXSCH chain tests: UL-SCH Tx -> channel -> PUSCH Rx.

Mirrors the reference's pxsch_chain_test (AWGN loopback) and pxsch_bler_test
(TDL fading) at reduced scale.
reference: tests/integrationtests/phy/upper/channel_processors/pxsch_chain_test.cpp,
pxsch_bler_test.cpp:332-458.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models.pusch_rx import flatten_tb_bits
from srsran_projectvtlmo_tpu.models import (
    PuschRxConfig, build_pusch_rx_slot, build_ulsch_tx_slot, ChannelEmulator,
)
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.ops import ofdm
from srsran_projectvtlmo_tpu.utils.cplx import pair_to_np, np_to_pair

CFG_SMALL = PuschRxConfig(
    nof_rb=24, modulation=Modulation.QAM16, target_code_rate=0.5,
    nof_rx_ports=1, dft_size=512, numerology=1,
)


def run_loopback(cfg, profile, sinr_db, seed=0, batch=2):
    tx = build_ulsch_tx_slot(cfg)
    rx = build_pusch_rx_slot(cfg)
    rng = np.random.default_rng(seed)
    tb = rng.integers(0, 2, (batch, cfg.tbs)).astype(np.uint8)
    grid_pair, _ = tx(jnp.asarray(tb))
    tx_grid = pair_to_np(np.asarray(grid_pair))  # (B, 14, nsubc)

    scs = 15e3 * (1 << cfg.numerology)
    rx_samples = []
    for i in range(batch):
        emu = ChannelEmulator(profile, sinr_db, cfg.nof_rx_ports, cfg.nof_subc, scs, seed=seed + i)
        rx_grid, _ = emu.run(tx_grid[i])  # (P, 14, nsubc)
        # Convert the faded grid to time samples through the OFDM modulator so the
        # receiver exercises its own demodulator.
        samples = ofdm.ofdm_modulate(
            jnp.asarray(np_to_pair(rx_grid)), cfg.dft_size, cfg.numerology,
            cfg.slot % (1 << cfg.numerology),
        )
        rx_samples.append(np.asarray(samples))
    out = rx(jnp.asarray(np.stack(rx_samples)))
    return tb, out


class TestPuschChain:
    def test_awgn_loopback_decodes(self):
        tb, out = run_loopback(CFG_SMALL, "AWGN", sinr_db=20.0)
        assert np.asarray(out["tb_crc_ok"]).all(), "TB CRC failed on clean channel"
        np.testing.assert_array_equal(flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]), tb)
        snr = np.asarray(out["snr_db"])
        assert (snr > 10).all(), f"post-eq SNR too low: {snr}"

    def test_qam64_multiport(self):
        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM64, target_code_rate=0.6,
                            nof_rx_ports=2, dft_size=256, numerology=1)
        tb, out = run_loopback(cfg, "AWGN", sinr_db=22.0, seed=3)
        assert np.asarray(out["tb_crc_ok"]).all()
        np.testing.assert_array_equal(flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]), tb)

    @pytest.mark.slow
    def test_tdla_fading_decodes_at_high_snr(self):
        cfg = PuschRxConfig(nof_rb=24, modulation=Modulation.QPSK, target_code_rate=0.33,
                            nof_rx_ports=2, dft_size=512, numerology=1,
                            nof_ldpc_iterations=8)
        ok = 0
        n = 4
        for s in range(n):
            tb, out = run_loopback(cfg, "TDLA", sinr_db=15.0, seed=10 + s, batch=1)
            if bool(np.asarray(out["tb_crc_ok"])[0]):
                ok += 1
        assert ok >= 3, f"only {ok}/{n} slots decoded on TDLA @ 15 dB"

    def test_low_snr_fails_crc(self):
        """Sanity: the CRC gate actually rejects garbage."""
        tb, out = run_loopback(CFG_SMALL, "AWGN", sinr_db=-10.0, seed=5)
        assert not np.asarray(out["tb_crc_ok"]).any()


class TestTwoLayer:
    def test_two_layer_mimo_loopback(self):
        """2-layer PUSCH over a 4-port MIMO fading channel decodes."""
        from srsran_projectvtlmo_tpu.models.channel import ChannelEmulator
        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QPSK, target_code_rate=0.3,
                            nof_layers=2, nof_rx_ports=4, dft_size=256, numerology=1,
                            nof_ldpc_iterations=8)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(0)
        tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb))  # (1, L, 14, nsubc, 2)
        layer_grids = pair_to_np(np.asarray(grid_pair)[0])  # (L, 14, nsubc)
        ok = 0
        n = 4
        for s in range(n):
            emu = ChannelEmulator("TDLA", 20.0, cfg.nof_rx_ports, cfg.nof_subc,
                                  30e3, seed=100 + s)
            rx_grid, _ = emu.run_mimo(layer_grids)
            samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid)),
                                         cfg.dft_size, cfg.numerology, 0)
            out = rx(jnp.asarray(np.asarray(samples))[None])
            if bool(np.asarray(out["tb_crc_ok"])[0]):
                ok += 1
        assert ok >= 3, f"2-layer decode succeeded only {ok}/{n} slots"


class TestUciOnPusch:
    def test_harq_ack_multiplexed(self):
        """2 ACK bits punctured onto PUSCH: both ACK and SCH decode."""
        import dataclasses
        cfg = dataclasses.replace(CFG_SMALL, nof_harq_ack_bits=2)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(11)
        tb = rng.integers(0, 2, (2, cfg.tbs)).astype(np.uint8)
        ack = np.array([[1, 0], [0, 1]], np.uint8)
        grid_pair, samples = tx(jnp.asarray(tb), jnp.asarray(ack))
        noisy = np.asarray(samples) + 0.002 * rng.normal(size=np.asarray(samples).shape).astype(np.float32)
        out = rx(jnp.asarray(noisy)[:, None])
        assert np.asarray(out["tb_crc_ok"]).all(), "SCH failed with ACK puncturing"
        np.testing.assert_array_equal(flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]), tb)
        np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)


class TestCfoCompensation:
    """CFO estimation + compensation (reference:
    port_channel_estimator_average_impl.cpp:236-253 compensate_cfo)."""

    def _run(self, cfo_hz, compensate):
        from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig, \
            build_pusch_rx_slot
        from srsran_projectvtlmo_tpu.models import build_ulsch_tx_slot
        from srsran_projectvtlmo_tpu.ran.modulation import Modulation
        import jax.numpy as jnp

        cfg = PuschRxConfig(nof_rb=24, modulation=Modulation.QAM16,
                            target_code_rate=0.5, nof_rx_ports=1, dft_size=512,
                            numerology=1, dmrs_symbols=(2, 11),
                            compensate_cfo=compensate)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(7)
        tb = rng.integers(0, 2, (2, cfg.tbs)).astype(np.uint8)
        _, samples = tx(jnp.asarray(tb))
        s = np.asarray(samples)
        sc = s[..., 0] + 1j * s[..., 1]
        fs = cfg.dft_size * cfg.scs_hz
        n = np.arange(sc.shape[-1])
        sc = sc * np.exp(2j * np.pi * cfo_hz * n / fs)
        sc += (rng.normal(size=sc.shape) + 1j * rng.normal(size=sc.shape)) * 0.02
        s2 = np.stack([sc.real, sc.imag], -1).astype(np.float32)[:, None]
        out = rx(jnp.asarray(s2))
        return tb, out

    def test_decodes_under_cfo_with_compensation(self):
        # 700 Hz stays under the {2,11}-DM-RS ambiguity limit 1/(2*dt)~1.5kHz.
        tb, out = self._run(cfo_hz=700.0, compensate=True)
        assert np.asarray(out["tb_crc_ok"]).all()
        assert (flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]) == tb).all()

    def test_cfo_free_unaffected(self):
        tb, out = self._run(cfo_hz=0.0, compensate=True)
        assert np.asarray(out["tb_crc_ok"]).all()


class TestFrequencyHopping:
    """Intra-slot frequency hopping: independent channel estimation per hop
    (reference: port_channel_estimator_average_impl.cpp:238-330 hop loop)."""

    def _hop_cfg(self):
        return PuschRxConfig(
            nof_rb=12, modulation=Modulation.QAM16, target_code_rate=0.5,
            nof_rx_ports=1, dft_size=512, numerology=1,
            dmrs_symbols=(2, 9), hop_symbol=7, second_hop_prb=12,
        )

    def _run(self, cfg, hop_boundary=7):
        """Loopback applying a different frequency-selective channel per hop:
        opposite linear phase ramps (±2 symbol delays) plus a gain step."""
        tx = build_ulsch_tx_slot(cfg)
        from srsran_projectvtlmo_tpu.models.pusch_rx import build_pusch_rx_from_grid
        rx = build_pusch_rx_from_grid(cfg)
        rng = np.random.default_rng(1)
        tb = rng.integers(0, 2, (2, cfg.tbs)).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb))
        g = pair_to_np(np.asarray(grid_pair))  # (B, 14, nsubc)
        hop_of = np.asarray([1 if s >= hop_boundary else 0
                             for s in range(cfg.nof_ofdm_symbols)])
        f = np.arange(cfg.nof_subc) / cfg.nof_subc
        h = np.stack([np.exp(2j * np.pi * 2.0 * f),
                      0.6 * np.exp(-2j * np.pi * 2.0 * f)])  # (2, nsubc)
        g = g * h[hop_of][None]
        g += (rng.normal(size=g.shape) + 1j * rng.normal(size=g.shape)) * 1e-3
        out = rx(jnp.asarray(np_to_pair(g))[:, None])
        return tb, out

    def test_hopping_decodes_with_per_hop_channels(self):
        cfg = self._hop_cfg()
        tb, out = self._run(cfg)
        assert np.asarray(out["tb_crc_ok"]).all()
        np.testing.assert_array_equal(flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]), tb)

    def test_single_hop_estimator_degrades_on_hop_channel(self):
        """The same per-hop channel through a non-hopping config (averaged
        estimate) must produce clearly worse post-eq SNR."""
        hop_cfg = self._hop_cfg()
        flat_cfg = PuschRxConfig(
            nof_rb=12, modulation=Modulation.QAM16, target_code_rate=0.5,
            nof_rx_ports=1, dft_size=512, numerology=1, dmrs_symbols=(2, 9),
        )
        _, out_hop = self._run(hop_cfg)
        _, out_flat = self._run(flat_cfg)
        snr_hop = float(np.asarray(out_hop["snr_db"]).mean())
        snr_flat = float(np.asarray(out_flat["snr_db"]).mean())
        assert snr_hop > snr_flat + 10, (snr_hop, snr_flat)


class TestFourLayerPusch:
    """3-4 layer PUSCH: DM-RS type 1 over both CDM groups (ports 0-3), layer
    demap, general-L MMSE (reference envelope: pusch_constants.h:47
    MAX_NOF_LAYERS=4, dmrs_pusch_estimator_impl.cpp:43-53)."""

    def test_four_layer_awgn_loopback(self):
        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QPSK,
                            target_code_rate=0.3, nof_layers=4,
                            nof_rx_ports=4, dft_size=256, numerology=1,
                            nof_ldpc_iterations=8)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(2)
        tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb))  # (1, 4, 14, nsubc, 2)
        layer_grids = pair_to_np(np.asarray(grid_pair)[0])
        # Identity-ish mixing: each layer to its own port + light crosstalk.
        mix = (np.eye(4) + 0.1 * np.ones((4, 4))).astype(np.complex64)
        rx_grid = np.einsum("pl,lsk->psk", mix, layer_grids)
        rx_grid += 0.002 * (rng.normal(size=rx_grid.shape)
                            + 1j * rng.normal(size=rx_grid.shape))
        samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid)),
                                     cfg.dft_size, cfg.numerology, 0)
        out = rx(jnp.asarray(np.asarray(samples))[None])
        assert bool(np.asarray(out["tb_crc_ok"])[0]), "4-layer decode failed"
        np.testing.assert_array_equal(
            flatten_tb_bits(np.asarray(out["tb_bits_cb"]), cfg.tbs)[0], tb[0])

    def test_three_layer_awgn_loopback(self):
        cfg = PuschRxConfig(nof_rb=12, modulation=Modulation.QPSK,
                            target_code_rate=0.3, nof_layers=3,
                            nof_rx_ports=4, dft_size=256, numerology=1,
                            nof_ldpc_iterations=8)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(3)
        tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb))
        layer_grids = pair_to_np(np.asarray(grid_pair)[0])
        mix = (np.eye(4)[:, :3] + 0.1).astype(np.complex64)
        rx_grid = np.einsum("pl,lsk->psk", mix, layer_grids)
        rx_grid += 0.002 * (rng.normal(size=rx_grid.shape)
                            + 1j * rng.normal(size=rx_grid.shape))
        samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid)),
                                     cfg.dft_size, cfg.numerology, 0)
        out = rx(jnp.asarray(np.asarray(samples))[None])
        assert bool(np.asarray(out["tb_crc_ok"])[0]), "3-layer decode failed"

    @pytest.mark.slow
    def test_four_layer_tdl_fading(self):
        """4x4 TDL-A fading at high SNR: most slots decode (BLER sanity,
        reference analog: pxsch_bler_test.cpp 4-port cases)."""
        from srsran_projectvtlmo_tpu.models.channel import ChannelEmulator

        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QPSK,
                            target_code_rate=0.3, nof_layers=4,
                            nof_rx_ports=4, dft_size=256, numerology=1,
                            nof_ldpc_iterations=8)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(4)
        tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
        grid_pair, _ = tx(jnp.asarray(tb))
        layer_grids = pair_to_np(np.asarray(grid_pair)[0])
        ok = 0
        n = 6
        for s in range(n):
            emu = ChannelEmulator("TDLA", 25.0, cfg.nof_rx_ports,
                                  cfg.nof_subc, 30e3, seed=200 + s)
            rx_grid, _ = emu.run_mimo(layer_grids)
            samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid)),
                                         cfg.dft_size, cfg.numerology, 0)
            out = rx(jnp.asarray(np.asarray(samples))[None])
            ok += bool(np.asarray(out["tb_crc_ok"])[0])
        assert ok >= 4, f"4-layer TDL decode succeeded only {ok}/{n} slots"


class TestDmrsType2:
    """DM-RS configuration type 2: pilot pairs at k = 6n + k' + 2*group
    (TS 38.211 Table 6.4.1.1.3-1; reference estimator parameter set,
    dmrs_pusch_estimator_impl.cpp:55-66)."""

    @pytest.mark.parametrize("nlayers", [1, 2, 4])
    def test_type2_loopback(self, nlayers):
        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QPSK,
                            target_code_rate=0.3, nof_layers=nlayers,
                            nof_rx_ports=4 if nlayers > 1 else 1,
                            dft_size=256, numerology=1, dmrs_config_type=2,
                            nof_ldpc_iterations=8)
        tx = build_ulsch_tx_slot(cfg)
        rx = build_pusch_rx_slot(cfg)
        rng = np.random.default_rng(nlayers)
        tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
        grid_pair, samples = tx(jnp.asarray(tb))
        if nlayers == 1:
            noisy = (np.asarray(samples)
                     + 0.003 * rng.normal(size=np.asarray(samples).shape
                                          ).astype(np.float32))
            out = rx(jnp.asarray(noisy)[:, None])
        else:
            layer_grids = pair_to_np(np.asarray(grid_pair)[0])
            mix = (np.eye(4)[:, :nlayers] + 0.1).astype(np.complex64)
            rx_grid = np.einsum("pl,lsk->psk", mix, layer_grids)
            rx_grid += 0.002 * (rng.normal(size=rx_grid.shape)
                                + 1j * rng.normal(size=rx_grid.shape))
            s = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(rx_grid)),
                                   cfg.dft_size, cfg.numerology, 0)
            out = rx(jnp.asarray(np.asarray(s))[None])
        assert bool(np.asarray(out["tb_crc_ok"])[0]), \
            f"type-2 {nlayers}-layer decode failed"
        np.testing.assert_array_equal(
            flatten_tb_bits(np.asarray(out["tb_bits_cb"]), cfg.tbs)[0], tb[0])

    def test_type2_pilot_positions(self):
        from srsran_projectvtlmo_tpu.ops.dmrs import dmrs_type2_subcarriers

        np.testing.assert_array_equal(dmrs_type2_subcarriers(1), [0, 1, 6, 7])
        np.testing.assert_array_equal(dmrs_type2_subcarriers(1, delta=2),
                                      [2, 3, 8, 9])
