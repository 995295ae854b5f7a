"""Tests for OFDM modulation, soft demapping, and equalization."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops import ofdm, demodulation, modulation, equalization
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.utils.cplx import np_to_pair, pair_to_np


class TestOfdm:
    @pytest.mark.parametrize("dft,mu,nrb", [(2048, 0, 106), (4096, 1, 273), (1024, 1, 51)])
    def test_mod_demod_roundtrip(self, dft, mu, nrb):
        nsubc = nrb * 12
        rng = np.random.default_rng(4)
        grid = (rng.normal(size=(14, nsubc)) + 1j * rng.normal(size=(14, nsubc))).astype(np.complex64)
        samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(grid)), dft, mu, 0)
        assert samples.shape == (ofdm.slot_sample_count(dft, mu, 0), 2)
        back = ofdm.ofdm_demodulate(samples, nsubc, dft, mu, 0)
        err = np.abs(pair_to_np(np.asarray(back)) - grid)
        assert err.max() < 1e-3, f"max reconstruction err {err.max()}"

    def test_phase_compensation_roundtrip(self):
        dft, mu, nsubc = 1024, 1, 600
        fc = 3.5e9
        rng = np.random.default_rng(5)
        grid = (rng.normal(size=(14, nsubc)) + 1j * rng.normal(size=(14, nsubc))).astype(np.complex64)
        samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(grid)), dft, mu, 0, fc)
        back = ofdm.ofdm_demodulate(samples, nsubc, dft, mu, 0, fc)
        err = np.abs(pair_to_np(np.asarray(back)) - grid)
        assert err.max() < 1e-2

    def test_cp_lengths(self):
        # 30 kHz SCS, 4096-point: symbol 0 of slot 0 has the long CP.
        cps = ofdm.cp_lengths(4096, 1, 0)
        # 16-kappa term scales with 2^mu in samples: 16 * 2 * 4096/2048 = 64
        # (verified float-exact vs the reference modulator, ofdm oracle).
        assert cps[0] == 288 + 64
        assert all(c == 288 for c in cps[1:])
        # Slot 1 at 30 kHz starts the second half subframe -> long CP too.
        cps1 = ofdm.cp_lengths(4096, 1, 1)
        assert cps1[0] == 288 + 64
        # 15 kHz: symbols 0 and 7 long.
        cps15 = ofdm.cp_lengths(2048, 0, 0)
        assert cps15[0] == 160 and cps15[7] == 160 and cps15[1] == 144


class TestSoftDemap:
    @pytest.mark.parametrize("mod", [Modulation.QPSK, Modulation.QAM16, Modulation.QAM64, Modulation.QAM256])
    def test_noiseless_hard_roundtrip(self, mod):
        from srsran_projectvtlmo_tpu.ran.modulation import bits_per_symbol
        rng = np.random.default_rng(6)
        nsym = 300
        bits = rng.integers(0, 2, nsym * bits_per_symbol(mod)).astype(np.uint8)
        sym = modulation.modulate(jnp.asarray(bits), mod)
        pair = np.stack([np.asarray(jnp.real(sym)), np.asarray(jnp.imag(sym))], -1)
        nv = np.full(nsym, 0.05, np.float32)
        llr = demodulation.soft_demap(jnp.asarray(pair), jnp.asarray(nv), mod)
        hard = np.asarray(demodulation.hard_demap(llr))
        np.testing.assert_array_equal(hard, bits)

    def test_qpsk_llr_values(self):
        # QPSK max-log LLR = 2 sqrt(2) y / nvar componentwise.
        y = np.array([[0.3, -0.5]], np.float32)
        nv = np.array([0.5], np.float32)
        llr = np.asarray(demodulation.soft_demap(jnp.asarray(y), jnp.asarray(nv), Modulation.QPSK))
        expect = 2 * np.sqrt(2) * y[0] / nv[0]
        # QPSK quantizes at range 24 (reference demodulation_mapper_qpsk.cpp
        # RANGE_LIMIT_FLOAT; the QAM orders use 20).
        got_float = llr.astype(np.float64) / 120 * 24
        np.testing.assert_allclose(got_float, expect, atol=0.2)

    def test_zero_noise_var_gives_zero(self):
        y = np.array([[0.3, -0.5]], np.float32)
        nv = np.array([0.0], np.float32)
        llr = np.asarray(demodulation.soft_demap(jnp.asarray(y), jnp.asarray(nv), Modulation.QPSK))
        assert (llr == 0).all()


class TestEqualizer:
    def test_mmse_1xn_flat_channel(self):
        """Unit channel, low noise: output approximates input; nvar sensible."""
        rng = np.random.default_rng(8)
        nre, ports = 128, 4
        x = (rng.normal(size=nre) + 1j * rng.normal(size=nre)).astype(np.complex64)
        h = np.ones((nre, ports), np.complex64)
        y = x[:, None] * h
        out, nv = equalization.equalize_mmse_1xn(
            jnp.asarray(np_to_pair(y)), jnp.asarray(np_to_pair(h)), jnp.asarray(np.full(ports, 1e-3, np.float32))
        )
        got = pair_to_np(np.asarray(out))
        np.testing.assert_allclose(got, x, atol=1e-2)
        np.testing.assert_allclose(np.asarray(nv), 1e-3 / ports, rtol=0.01)

    def test_mmse_1xn_matches_reference_formula(self):
        rng = np.random.default_rng(9)
        nre, ports = 64, 2
        h = (rng.normal(size=(nre, ports)) + 1j * rng.normal(size=(nre, ports))).astype(np.complex64)
        y = (rng.normal(size=(nre, ports)) + 1j * rng.normal(size=(nre, ports))).astype(np.complex64)
        nvar = np.array([0.1, 0.3], np.float32)
        beta = 0.7
        out, nv = equalization.equalize_mmse_1xn(
            jnp.asarray(np_to_pair(y)), jnp.asarray(np_to_pair(h)), jnp.asarray(nvar), beta
        )
        hs = h * beta
        c = (np.abs(hs) ** 2).sum(1)
        nacc = ((np.abs(hs) ** 2) * nvar[None, :]).sum(1)
        mf = (y * hs.conj()).sum(1)
        expect = mf * c / (c * c + nacc)
        np.testing.assert_allclose(pair_to_np(np.asarray(out)), expect, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(np.asarray(nv), nacc / (c * c + nacc), rtol=2e-4)

    def test_degenerate_inputs(self):
        y = np.zeros((4, 2, 2), np.float32)
        h = np.zeros((4, 2, 2), np.float32)
        out, nv = equalization.equalize_mmse_1xn(jnp.asarray(y), jnp.asarray(h), jnp.asarray(np.ones(2, np.float32)))
        assert (np.asarray(out) == 0).all()
        assert np.isinf(np.asarray(nv)).all()

    def test_mmse_general_single_layer_consistent(self):
        """General solver on L=1 should closely track the closed form at high SNR."""
        rng = np.random.default_rng(10)
        nre, ports = 32, 4
        h = (rng.normal(size=(nre, ports)) + 1j * rng.normal(size=(nre, ports))).astype(np.complex64)
        x = (rng.normal(size=nre) + 1j * rng.normal(size=nre)).astype(np.complex64)
        y = h * x[:, None]
        nvar = np.full(ports, 1e-4, np.float32)
        out, nv = equalization.equalize_mmse_general(
            jnp.asarray(np_to_pair(y)), jnp.asarray(np_to_pair(h[:, :, None])), jnp.asarray(nvar)
        )
        got = pair_to_np(np.asarray(out))[:, 0]
        np.testing.assert_allclose(got, x, atol=1e-2)

    def test_mmse_general_two_layers(self):
        rng = np.random.default_rng(11)
        nre, ports, layers = 64, 4, 2
        h = (rng.normal(size=(nre, ports, layers)) + 1j * rng.normal(size=(nre, ports, layers))).astype(np.complex64) / np.sqrt(2)
        x = (rng.normal(size=(nre, layers)) + 1j * rng.normal(size=(nre, layers))).astype(np.complex64)
        y = np.einsum("rpl,rl->rp", h, x)
        nvar = np.full(ports, 1e-4, np.float32)
        out, nv = equalization.equalize_mmse_general(
            jnp.asarray(np_to_pair(y)), jnp.asarray(np_to_pair(h)), jnp.asarray(nvar)
        )
        got = pair_to_np(np.asarray(out))
        err = np.abs(got - x).max()
        assert err < 0.05, f"layer separation error {err}"
        assert (np.asarray(nv) < 0.01).all()


class TestStreamingAndErrors:
    def test_pi2_bpsk_demap_roundtrip(self):
        from srsran_projectvtlmo_tpu.ops.modulation import modulate_np
        rng = np.random.default_rng(12)
        bits = rng.integers(0, 2, 128).astype(np.uint8)
        sym = modulate_np(bits, Modulation.PI_2_BPSK)
        pair = np.stack([sym.real, sym.imag], -1).astype(np.float32)
        nv = np.full(128, 0.05, np.float32)
        llr = demodulation.soft_demap(jnp.asarray(pair), jnp.asarray(nv), Modulation.PI_2_BPSK)
        hard = np.asarray(demodulation.hard_demap(llr))
        np.testing.assert_array_equal(hard, bits)

    def test_rx_symbol_handler_dispatch(self):
        from srsran_projectvtlmo_tpu.phy.rx_symbol_handler import RxSymbolHandler
        from srsran_projectvtlmo_tpu.fapi.pdus import PuschPdu
        h = RxSymbolHandler(nof_rx_ports=1, nof_subc=48)
        pdu = PuschPdu(rnti=1, rb_start=0, rb_size=4, modulation=Modulation.QPSK,
                       target_code_rate=0.3, start_symbol=0, nof_symbols=5)
        h.repo.add(slot=0, pdu=pdu)
        ready = []
        for s in range(14):
            ready += h.handle_rx_symbol(0, s, np.zeros((1, 48), np.complex64))
            if s < 4:
                assert not ready
        assert ready == [pdu]
        assert h.repo.nof_pending(0) == 0

    def test_error_handler_late_slot(self):
        import time
        from srsran_projectvtlmo_tpu.phy.error_handler import UpperPhyErrorHandler
        events = []
        eh = UpperPhyErrorHandler(slot_duration_s=0.0005,
                                  on_error=lambda k, s, l: events.append((k, s)))
        t0 = time.perf_counter()
        time.sleep(0.002)
        assert not eh.check_dl_deadline(1, t0)
        assert eh.stats.late_dl == 1 and events == [("late_dl", 1)]
        assert eh.check_ul_deadline(2, time.perf_counter())


def test_channel_estimator_cfo():
    """Two DM-RS symbols with a known inter-symbol phase drift -> CFO estimate."""
    from srsran_projectvtlmo_tpu.ops.channel_estimate import estimate_channel_hop
    nof_rb = 8
    npil = 6 * nof_rb
    rng = np.random.default_rng(0)
    ref = (rng.normal(size=npil) + 1j * rng.normal(size=npil)).astype(np.complex64)
    ref /= np.abs(ref)
    scs = 30e3
    cfo_true = 300.0  # Hz
    phase = np.exp(2j * np.pi * cfo_true / scs)
    h = 0.9 + 0.1j
    rx = np.stack([h * ref, h * ref * phase])[None]  # (1, 2, npil)
    pair = np.stack([rx.real, rx.imag], -1).astype(np.float32)
    ref_pair = np.stack([ref.real, ref.imag], -1).astype(np.float32)
    out = estimate_channel_hop(jnp.asarray(pair), jnp.asarray(ref_pair), nof_rb, 2)
    got = float(np.asarray(out["cfo_hz"])[0])
    assert abs(got - cfo_true) < 20, f"cfo {got} vs {cfo_true}"


def test_extended_cp_roundtrip():
    rng = np.random.default_rng(13)
    nsubc = 24 * 12
    grid = (rng.normal(size=(12, nsubc)) + 1j * rng.normal(size=(12, nsubc))).astype(np.complex64)
    s = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(grid)), 512, 2, 0, 0.0, 1.0, "extended")
    assert s.shape == (ofdm.slot_sample_count(512, 2, 0, "extended"), 2)
    assert ofdm.slot_sample_count(512, 2, 0, "extended") == 12 * (512 + 128)
    back = ofdm.ofdm_demodulate(s, nsubc, 512, 2, 0, 0.0, 1.0, "extended")
    err = np.abs(pair_to_np(np.asarray(back)) - grid)
    assert err.max() < 1e-3


def test_time_alignment_estimator():
    from srsran_projectvtlmo_tpu.ops.time_alignment import estimate_time_alignment
    npil = 96
    scs = 30e3
    stride = 2
    tau = 0.4e-6
    k = np.arange(npil)
    lse = np.exp(-2j * np.pi * k * stride * scs * tau).astype(np.complex64)
    pair = np.stack([lse.real, lse.imag], -1).astype(np.float32)
    got = float(np.asarray(estimate_time_alignment(jnp.asarray(pair[None]), stride, scs))[0])
    assert abs(got - tau) < 0.1e-6, f"TA {got} vs {tau}"
    # Negative delay wraps correctly.
    lse2 = np.exp(+2j * np.pi * k * stride * scs * tau).astype(np.complex64)
    pair2 = np.stack([lse2.real, lse2.imag], -1).astype(np.float32)
    got2 = float(np.asarray(estimate_time_alignment(jnp.asarray(pair2[None]), stride, scs))[0])
    assert abs(got2 + tau) < 0.1e-6
