"""PXSCH BLER conformance: Tx->fading channel->Rx over many slots, asserting
block error rates at calibrated SNR points.

Reduced-scale port of the reference's conformance test
(reference: tests/integrationtests/phy/upper/channel_processors/
pxsch_bler_test.cpp:332-458: TDL channels, 1/2/4 ports, MCS sweep).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models import (
    PuschRxConfig, build_pusch_rx_slot, build_ulsch_tx_slot, ChannelEmulator,
)
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.ops import ofdm
from srsran_projectvtlmo_tpu.utils.cplx import pair_to_np, np_to_pair


def run_bler(cfg, profile, sinr_db, nof_slots, seed=0):
    tx = build_ulsch_tx_slot(cfg)
    rx = build_pusch_rx_slot(cfg)
    rng = np.random.default_rng(seed)
    scs = 15e3 * (1 << cfg.numerology)
    errors = 0
    tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
    grid_pair, _ = tx(jnp.asarray(tb))
    tx_grid = pair_to_np(np.asarray(grid_pair))[0]
    samples = []
    for s in range(nof_slots):
        emu = ChannelEmulator(profile, sinr_db, cfg.nof_rx_ports, cfg.nof_subc, scs,
                              seed=seed * 1000 + s)
        rx_grid, _ = emu.run(tx_grid)
        samples.append(np.asarray(ofdm.ofdm_modulate(
            jnp.asarray(np_to_pair(rx_grid)), cfg.dft_size, cfg.numerology, 0)))
    out = rx(jnp.asarray(np.stack(samples)))
    ok = np.asarray(out["tb_crc_ok"])
    return 1.0 - ok.mean()


class TestBler:
    def test_qpsk_low_rate_tdlb_mid_snr(self):
        """QPSK R=0.2, 2 rx ports on TDLB at 10 dB: BLER must be low."""
        cfg = PuschRxConfig(nof_rb=24, modulation=Modulation.QPSK, target_code_rate=0.2,
                            nof_rx_ports=2, dft_size=512, numerology=1,
                            nof_ldpc_iterations=8)
        bler = run_bler(cfg, "TDLB", 10.0, nof_slots=16, seed=1)
        assert bler <= 0.25, f"BLER {bler} too high for QPSK R=0.2 @10dB 2port"

    def test_qam16_awgn_threshold_behavior(self):
        """AWGN: high SNR decodes always, very low SNR never (waterfall exists)."""
        cfg = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM16, target_code_rate=0.5,
                            nof_rx_ports=1, dft_size=256, numerology=1)
        assert run_bler(cfg, "AWGN", 25.0, nof_slots=8, seed=2) == 0.0
        assert run_bler(cfg, "AWGN", -2.0, nof_slots=8, seed=3) == 1.0

    def test_port_diversity_gain(self):
        """4 rx ports outperform 1 port on fading at equal SINR."""
        mk = lambda p: PuschRxConfig(nof_rb=16, modulation=Modulation.QPSK,
                                     target_code_rate=0.4, nof_rx_ports=p,
                                     dft_size=256, numerology=1, nof_ldpc_iterations=8)
        bler1 = run_bler(mk(1), "TDLA", 8.0, nof_slots=16, seed=4)
        bler4 = run_bler(mk(4), "TDLA", 8.0, nof_slots=16, seed=4)
        assert bler4 <= bler1, f"no diversity gain: 1port {bler1} vs 4port {bler4}"
        assert bler4 <= 0.2, f"4-port BLER {bler4} too high at 8 dB"


#: Conformance ladder mirroring the reference's pxsch_bler_test case list
#: (TDL-A/B/C x {1,2,4} rx ports, reference:
#: tests/integrationtests/phy/upper/channel_processors/pxsch_bler_test.cpp:
#: 449-458) plus an MCS ladder (QPSK R=0.2 / 16QAM R=0.5 / 64QAM R=0.75 /
#: 256QAM R=0.926) at reduced scale (24 RB, 24 slots, fixed seeds -> the
#: sweep is deterministic).  Bounds are the measured operating point plus a
#: ~3-slot margin for cross-platform float wiggle; mean-iteration bounds
#: mirror the reference's ldpc_decoder_stats assertions.
LADDER = [
    # (profile, ports, modulation, rate, snr_db, bler_max, mean_iter_max)
    ("TDLA", 1, Modulation.QAM16, 0.50, 17.0, 0.21, 3.1),
    ("TDLA", 2, Modulation.QAM16, 0.50, 12.0, 0.30, 4.2),
    ("TDLA", 4, Modulation.QAM16, 0.50, 12.0, 0.17, 4.1),
    ("TDLB", 1, Modulation.QAM16, 0.50, 17.0, 0.13, 3.2),
    ("TDLB", 2, Modulation.QAM16, 0.50, 12.0, 0.13, 4.1),
    ("TDLB", 4, Modulation.QAM16, 0.50, 12.0, 0.17, 4.0),
    ("TDLC", 1, Modulation.QAM16, 0.50, 17.0, 0.17, 4.2),
    ("TDLC", 2, Modulation.QAM16, 0.50, 12.0, 0.30, 5.3),
    ("TDLC", 4, Modulation.QAM16, 0.50, 12.0, 0.13, 4.4),
    ("TDLA", 2, Modulation.QPSK, 0.20, 3.0, 0.34, 5.0),
    ("TDLA", 2, Modulation.QAM64, 0.75, 22.0, 0.21, 3.6),
    ("TDLA", 2, Modulation.QAM256, 0.926, 32.0, 0.30, 4.2),
]


def run_bler_iters(cfg, profile, sinr_db, nof_slots, seed=0):
    """Like run_bler but also returns the mean LDPC iteration count."""
    tx = build_ulsch_tx_slot(cfg)
    rx = build_pusch_rx_slot(cfg)
    rng = np.random.default_rng(seed)
    scs = 15e3 * (1 << cfg.numerology)
    tb = rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8)
    grid_pair, _ = tx(jnp.asarray(tb))
    tx_grid = pair_to_np(np.asarray(grid_pair))[0]
    samples = []
    for s in range(nof_slots):
        emu = ChannelEmulator(profile, sinr_db, cfg.nof_rx_ports, cfg.nof_subc,
                              scs, seed=seed * 1000 + s)
        rx_grid, _ = emu.run(tx_grid)
        samples.append(np.asarray(ofdm.ofdm_modulate(
            jnp.asarray(np_to_pair(rx_grid)), cfg.dft_size, cfg.numerology, 0)))
    out = rx(jnp.asarray(np.stack(samples)))
    ok = np.asarray(out["tb_crc_ok"])
    iters = np.asarray(out["ldpc_iterations"]).astype(np.float64)
    return 1.0 - ok.mean(), iters.mean()


class TestBlerConformanceLadder:
    @pytest.mark.parametrize(
        "profile,ports,mod,rate,snr_db,bler_max,iter_max", LADDER,
        ids=[f"{p}_{n}port_{m.name}_r{int(r * 100)}_{int(s)}dB"
             for p, n, m, r, s, _, _ in LADDER])
    def test_point(self, profile, ports, mod, rate, snr_db, bler_max, iter_max):
        idx = LADDER.index((profile, ports, mod, rate, snr_db, bler_max, iter_max))
        cfg = PuschRxConfig(nof_rb=24, modulation=mod, target_code_rate=rate,
                            nof_rx_ports=ports, dft_size=512, numerology=1,
                            nof_ldpc_iterations=8, ldpc_early_stop=True)
        bler, mean_it = run_bler_iters(cfg, profile, snr_db, nof_slots=24,
                                       seed=100 + idx)
        assert bler <= bler_max, \
            f"{profile} {ports}p {mod.name} R={rate} @{snr_db}dB: BLER {bler:.3f} > {bler_max}"
        assert mean_it <= iter_max, \
            f"{profile} {ports}p {mod.name}: mean iterations {mean_it:.2f} > {iter_max}"
        assert mean_it >= 1.0
