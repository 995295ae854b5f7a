"""PDCCH encode/blind-decode and PBCH/SSB tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.phy import pdcch, pbch


class TestPdcch:
    @pytest.mark.parametrize("ndci,al", [(20, 1), (39, 2), (60, 4), (124, 8)])
    def test_blind_decode_roundtrip(self, ndci, al):
        cfg = pdcch.PdcchCandidateConfig(nof_dci_bits=ndci, aggregation_level=al,
                                         rnti=0x4601, n_id=42, n_rnti=0x4601)
        rng = np.random.default_rng(ndci)
        dci = rng.integers(0, 2, ndci).astype(np.uint8)
        syms = pdcch.pdcch_modulate(cfg, dci)
        noisy = syms + 0.05 * (rng.normal(size=syms.shape) + 1j * rng.normal(size=syms.shape))
        pair = np.stack([noisy.real, noisy.imag], -1).astype(np.float32)
        nv = np.full(syms.shape, 0.005, np.float32)
        got, ok = pdcch.pdcch_blind_decode(jnp.asarray(pair[None]), jnp.asarray(nv[None]), cfg)
        assert bool(np.asarray(ok)[0]), f"CRC failed ndci={ndci} al={al}"
        np.testing.assert_array_equal(np.asarray(got)[0], dci)

    def test_wrong_rnti_rejected(self):
        cfg = pdcch.PdcchCandidateConfig(nof_dci_bits=40, aggregation_level=2,
                                         rnti=0x4601, n_id=42, n_rnti=0x4601)
        rng = np.random.default_rng(5)
        dci = rng.integers(0, 2, 40).astype(np.uint8)
        syms = pdcch.pdcch_modulate(cfg, dci)
        pair = np.stack([syms.real, syms.imag], -1).astype(np.float32)
        nv = np.full(syms.shape, 0.005, np.float32)
        bad = pdcch.PdcchCandidateConfig(nof_dci_bits=40, aggregation_level=2,
                                         rnti=0x1111, n_id=42, n_rnti=0x4601)
        _, ok = pdcch.pdcch_blind_decode(jnp.asarray(pair[None]), jnp.asarray(nv[None]), bad)
        assert not bool(np.asarray(ok)[0])


class TestPbch:
    def test_pss_properties(self):
        for nid2 in range(3):
            s = pbch.pss_sequence(nid2)
            assert s.shape == (127,)
            assert np.allclose(np.abs(s), 1)
        # Distinct sequences have low cross-correlation.
        c01 = abs(np.vdot(pbch.pss_sequence(0), pbch.pss_sequence(1)))
        assert c01 < 30

    def test_sss_distinct(self):
        a = pbch.sss_sequence(10, 1)
        b = pbch.sss_sequence(11, 1)
        assert abs(np.vdot(a, b)) < 50

    def test_pbch_polar_roundtrip(self):
        msg = pbch.PbchMessage(sfn=123, ssb_idx=2, half_radio_frame=False, n_id=101,
                               mib_payload=tuple(np.random.default_rng(0).integers(0, 2, 24)))
        bits = pbch.pbch_encode(msg)
        assert bits.shape == (pbch.E,)
        # Decode through the polar chain and verify CRC24C.
        from srsran_projectvtlmo_tpu.ops.polar import (
            PolarCode, polar_decode, polar_deallocate,
        )
        from srsran_projectvtlmo_tpu.ops.polar import rate_matching as prm
        from srsran_projectvtlmo_tpu.ops.polar.interleave import deinterleave
        from srsran_projectvtlmo_tpu.ops.crc import crc_host

        code = PolarCode(K=pbch.B, E=pbch.E, n_max=9, ibil=False)
        llr = ((1 - 2 * bits.astype(np.int32)) * 20).astype(np.int8)
        buf = prm.rate_dematch(jnp.asarray(llr[None]), code)
        u = polar_decode(buf, code)
        c = np.asarray(deinterleave(polar_deallocate(u, code), pbch.B))[0]
        payload, crc = c[:pbch.A], c[pbch.A:]
        np.testing.assert_array_equal(crc_host(payload, "CRC24C"), crc)

    def test_ssb_grid_layout(self):
        msg = pbch.PbchMessage(sfn=5, ssb_idx=1, half_radio_frame=True, n_id=77)
        grid = pbch.assemble_ssb(msg)
        assert grid.shape == (4, 240)
        # PSS present on symbol 0 only within 56..182.
        assert np.abs(grid[0, 56:183]).min() > 0.9
        assert np.abs(grid[0, :56]).max() == 0 and np.abs(grid[0, 183:]).max() == 0
        # PBCH symbols fully occupied.
        assert np.abs(grid[1]).min() > 0
        assert np.abs(grid[3]).min() > 0
        # Symbol 2: SSS in the middle, PBCH at the edges.
        assert np.abs(grid[2, 56:183]).min() > 0.9
        assert np.abs(grid[2, 0:48]).min() > 0
        assert np.abs(grid[2, 48:56]).max() == 0
