"""TS 38.212 Section 6.2.7 UCI-on-PUSCH placement + two-phase CSI protocol."""

import dataclasses

import numpy as np
import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models.pusch_rx import flatten_tb_bits
from srsran_projectvtlmo_tpu.models.pusch_rx import (
    PuschRxConfig, build_pusch_rx_slot,
)
from srsran_projectvtlmo_tpu.models.ulsch_tx import build_ulsch_tx_slot
from srsran_projectvtlmo_tpu.phy.pusch_uci import PuschUciConfig, PuschUciProcessor
from srsran_projectvtlmo_tpu.ran.modulation import Modulation, bits_per_symbol
from srsran_projectvtlmo_tpu.ran.ulsch_info import get_ulsch_information
from srsran_projectvtlmo_tpu.ops import ofdm


BASE = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM16, target_code_rate=0.5,
                     nof_rx_ports=1, dft_size=256, numerology=1, dmrs_symbols=(2,))


class TestUlschInfo:
    def test_budgets_fit_allocation(self):
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=4, nof_csi_part1_bits=5,
                                  nof_csi_part2_bits=7)
        info = cfg.ulsch_info()
        qm = bits_per_symbol(cfg.modulation)
        total = cfg.nof_data_re * qm
        assert info.nof_ul_sch_bits + info.nof_harq_ack_bits \
            + info.nof_csi_part1_bits + info.nof_csi_part2_bits == total
        assert info.nof_harq_ack_bits > 0
        assert info.nof_csi_part1_bits > 0
        assert info.nof_csi_part2_bits > 0

    def test_rvd_equals_2bit_budget(self):
        """<=2-bit ACK reserves REs sized as a 2-bit payload."""
        one = dataclasses.replace(BASE, nof_harq_ack_bits=1).ulsch_info()
        two = dataclasses.replace(BASE, nof_harq_ack_bits=2).ulsch_info()
        assert one.nof_harq_ack_rvd == two.nof_harq_ack_bits == two.nof_harq_ack_rvd
        # Puncturing: SCH budget is not reduced by <=2-bit ACK.
        assert one.nof_ul_sch_bits == BASE.ulsch_info().nof_ul_sch_bits

    def test_big_ack_rate_matched_around(self):
        info = dataclasses.replace(BASE, nof_harq_ack_bits=4).ulsch_info()
        assert info.nof_harq_ack_rvd == 0
        assert info.nof_ul_sch_bits == BASE.ulsch_info().nof_ul_sch_bits \
            - info.nof_harq_ack_bits


class TestPlacementPlan:
    def test_disjoint_and_complete(self):
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=4, nof_csi_part1_bits=5,
                                  nof_csi_part2_bits=7)
        plan, info = cfg.demux_plan()
        all_idx = np.concatenate([plan.sch_bit_idx, plan.ack_bit_idx,
                                  plan.csi1_bit_idx, plan.csi2_bit_idx])
        assert len(all_idx) == cfg.nof_codeword_bits
        assert len(np.unique(all_idx)) == len(all_idx)
        assert len(plan.sch_bit_idx) == info.nof_ul_sch_bits
        assert len(plan.punct_bit_idx) == 0

    def test_small_ack_punctures_sch(self):
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=1)
        plan, info = cfg.demux_plan()
        # ACK positions are inside the SCH set (puncturing, not rate-matching).
        assert np.isin(plan.ack_bit_idx, plan.sch_bit_idx).all()
        assert len(plan.sch_bit_idx) == info.nof_ul_sch_bits == cfg.nof_codeword_bits
        np.testing.assert_array_equal(plan.punct_bit_idx, plan.ack_bit_idx)

    def test_ack_starts_after_first_dmrs(self):
        """ACK REs start on the first data symbol after the first DM-RS symbol."""
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=4)
        plan, _ = cfg.demux_plan()
        qm = bits_per_symbol(cfg.modulation)
        first_re = plan.ack_bit_idx[0] // qm
        # Stream symbols 0,1 are slot symbols 0,1 (DM-RS at 2); l1 = symbol 3
        # = stream symbol index 2.
        assert first_re >= 2 * cfg.nof_subc
        # CSI1 starts at the first data symbol (l1_csi = 0).
        cfg2 = dataclasses.replace(BASE, nof_csi_part1_bits=5)
        plan2, _ = cfg2.demux_plan()
        assert plan2.csi1_bit_idx[0] // qm < cfg.nof_subc

    def test_csi_placement_independent_of_csi2(self):
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=4, nof_csi_part1_bits=5)
        p0, _ = cfg.demux_plan(0)
        p8, _ = cfg.demux_plan(8)
        np.testing.assert_array_equal(p0.ack_bit_idx, p8.ack_bit_idx)
        np.testing.assert_array_equal(p0.csi1_bit_idx, p8.csi1_bit_idx)


def _loopback(cfg, seed=0, noise=0.002, csi2_size=None, **payloads):
    rng = np.random.default_rng(seed)
    tb = rng.integers(0, 2, (2, cfg.tbs)).astype(np.uint8)
    tx = build_ulsch_tx_slot(cfg, csi2_size)
    rx = build_pusch_rx_slot(
        cfg if csi2_size is None else dataclasses.replace(
            cfg, nof_csi_part2_bits=csi2_size))
    args = {k: jnp.asarray(v) for k, v in payloads.items()}
    _, samples = tx(jnp.asarray(tb), **args)
    noisy = np.asarray(samples) + noise * rng.normal(
        size=np.asarray(samples).shape).astype(np.float32)
    out = rx(jnp.asarray(noisy)[:, None])
    assert np.asarray(out["tb_crc_ok"]).all(), "SCH decode failed"
    np.testing.assert_array_equal(flatten_tb_bits(np.asarray(out["tb_bits_cb"]), tb.shape[-1]), tb)
    return out


class TestUciOnPuschE2E:
    def test_ack_1bit_placeholders(self):
        """1-bit ACK exercises the x/y placeholder scrambling reversal."""
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=1)
        ack = np.array([[1], [0]], np.uint8)
        out = _loopback(cfg, seed=1, ack_bits=ack)
        np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)

    def test_ack_rate_matched(self):
        """11-bit ACK: REs rate-matched around (RM(32,11) coded)."""
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=11)
        rng = np.random.default_rng(3)
        ack = rng.integers(0, 2, (2, 11)).astype(np.uint8)
        out = _loopback(cfg, seed=2, ack_bits=ack)
        np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)

    def test_all_fields_static(self):
        """ACK + CSI1 + CSI2 all multiplexed, static sizes."""
        cfg = dataclasses.replace(BASE, nof_harq_ack_bits=2, nof_csi_part1_bits=4,
                                  nof_csi_part2_bits=6)
        rng = np.random.default_rng(5)
        ack = rng.integers(0, 2, (2, 2)).astype(np.uint8)
        csi1 = rng.integers(0, 2, (2, 4)).astype(np.uint8)
        csi2 = rng.integers(0, 2, (2, 6)).astype(np.uint8)
        out = _loopback(cfg, seed=4, ack_bits=ack, csi1_bits=csi1, csi2_bits=csi2)
        np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)
        np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi1)
        np.testing.assert_array_equal(np.asarray(out["csi2_bits"]), csi2)


def test_csi_part1_part2_two_phase():
    """Dynamic CSI part2 size resolved from decoded part1 (host decision)."""
    rx_cfg = dataclasses.replace(BASE, nof_csi_part1_bits=2)
    cfg = PuschUciConfig(rx=rx_cfg, part2_size_map=(4, 6, 8, 10))

    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (1, rx_cfg.tbs)).astype(np.uint8)
    csi1 = np.array([[1, 0]], np.uint8)       # value 2 -> csi2 size 8
    csi2 = rng.integers(0, 2, (1, 8)).astype(np.uint8)

    tx = build_ulsch_tx_slot(rx_cfg, nof_csi_part2_bits=8)
    grid_pair, _ = tx(jnp.asarray(tb), csi1_bits=jnp.asarray(csi1),
                      csi2_bits=jnp.asarray(csi2))
    noisy = np.asarray(grid_pair) + 0.005 * rng.normal(
        size=np.asarray(grid_pair).shape).astype(np.float32)

    proc = PuschUciProcessor(cfg)
    out = proc.process(jnp.asarray(noisy)[:, None])
    assert out["csi2_size"] == 8
    np.testing.assert_array_equal(out["csi1_bits"], csi1)
    assert bool(out["csi1_valid"][0])
    np.testing.assert_array_equal(np.asarray(out["csi2_bits"]), csi2)
    assert bool(np.asarray(out["csi2_valid"])[0])
    assert bool(np.asarray(out["tb_crc_ok"])[0]), "SCH failed with CSI multiplexed"
    # PuschUciProcessor's two-phase path returns the flat TB directly.
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)


def test_long_csi1_polar_encoded_on_device():
    """K >= 12 UCI rides the UE-emulator slot program via the device-side
    polar chain (CRC11 + allocate + butterfly encode + rate match) and the
    receiver's polar decoder recovers it (closes the round-2 gap: long UCI
    was only testable via synthetic LLRs)."""
    cfg = dataclasses.replace(BASE, nof_csi_part1_bits=25)
    rng = np.random.default_rng(9)
    csi1 = rng.integers(0, 2, (2, 25)).astype(np.uint8)
    out = _loopback(cfg, seed=8, noise=0.001, csi1_bits=csi1)
    np.testing.assert_array_equal(np.asarray(out["csi1_bits"]), csi1)
    assert np.asarray(out["csi1_metric"]).all()


def test_long_ack_polar_roundtrip():
    """40-bit HARQ-ACK: polar with CRC11, still multiplexed with the SCH."""
    cfg = dataclasses.replace(BASE, nof_harq_ack_bits=40)
    rng = np.random.default_rng(10)
    ack = rng.integers(0, 2, (2, 40)).astype(np.uint8)
    out = _loopback(cfg, seed=9, noise=0.001, ack_bits=ack)
    np.testing.assert_array_equal(np.asarray(out["harq_ack_bits"]), ack)
