"""Polar chain tests: construction, encoder vs G_N golden, PC allocation,
rate-match round trips through the SC decoder."""

import numpy as np
import pytest

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.ops.polar import (
    PolarCode, polar_encode, polar_decode, polar_allocate, polar_deallocate, pc_matrix,
)
from srsran_projectvtlmo_tpu.ops.polar import rate_matching as prm


def golden_gn(n):
    g = np.array([[1, 0], [1, 1]], dtype=np.uint8)
    out = np.array([[1]], dtype=np.uint8)
    for _ in range(n):
        out = np.kron(out, g)
    return out


def golden_allocate(message, code):
    u = np.zeros(code.N, dtype=np.uint8)
    k_set = set(code.k_set.tolist())
    pc_set = set(code.pc_set.tolist())
    y = [0, 0, 0, 0, 0]
    ik = 0
    for i in range(code.N):
        y = [y[1], y[2], y[3], y[4], y[0]]
        if i in k_set:
            if i in pc_set:
                u[i] = y[0]
            else:
                u[i] = message[ik]
                y[0] ^= int(message[ik])
                ik += 1
    return u


class TestConstruction:
    @pytest.mark.parametrize("k,e,nmax,ibil", [
        (40, 100, 9, False),   # DL, puncture/shorten region
        (140, 288, 9, False),  # DL larger
        (20, 60, 10, True),    # UL with PC bits
        (20, 256, 10, True),   # UL PC + wm bit (E > K+189)
        (100, 2048, 10, True), # UL repetition (E > N)
    ])
    def test_sets_consistent(self, k, e, nmax, ibil):
        code = PolarCode(K=k, E=e, n_max=nmax, ibil=ibil)
        assert len(code.k_set) == k + code.n_pc
        assert code.frozen_mask.sum() == code.N - k - code.n_pc
        assert set(code.pc_set.tolist()) <= set(code.k_set.tolist()) or code.n_wm_pc
        if k <= 25:
            assert code.n_pc == 3

    def test_pc_matrix_matches_register(self):
        code = PolarCode(K=20, E=80, n_max=10, ibil=True)
        rng = np.random.default_rng(0)
        msg = rng.integers(0, 2, code.K).astype(np.uint8)
        golden_u = golden_allocate(msg, code)
        u = np.asarray(polar_allocate(jnp.asarray(msg[None]), code))[0]
        np.testing.assert_array_equal(u, golden_u)


class TestEncoder:
    @pytest.mark.parametrize("n", [5, 7, 9, 10])
    def test_matches_gn(self, n):
        rng = np.random.default_rng(n)
        u = rng.integers(0, 2, (3, 1 << n)).astype(np.uint8)
        x = np.asarray(polar_encode(jnp.asarray(u), n))
        want = (u @ golden_gn(n)) % 2
        np.testing.assert_array_equal(x, want)


class TestRoundtrip:
    @pytest.mark.parametrize("k,e,nmax,ibil", [
        (40, 100, 9, False),
        (57, 864, 9, False),
        (140, 288, 9, False),
        (20, 60, 10, True),
        (20, 256, 10, True),
        (12 + 6, 96, 10, True),
        (100, 2000, 10, True),
    ])
    def test_noiseless(self, k, e, nmax, ibil):
        code = PolarCode(K=k, E=e, n_max=nmax, ibil=ibil)
        rng = np.random.default_rng(k + e)
        msg = rng.integers(0, 2, (4, k)).astype(np.uint8)
        u = polar_allocate(jnp.asarray(msg), code)
        x = polar_encode(u, code.n)
        tx = prm.rate_match(x, code)
        llr = ((1 - 2 * np.asarray(tx).astype(np.int32)) * 10).astype(np.int8)
        back = prm.rate_dematch(jnp.asarray(llr), code)
        u_hat = polar_decode(back, code)
        got = np.asarray(polar_deallocate(u_hat, code))
        np.testing.assert_array_equal(got, msg, err_msg=f"K={k} E={e}")

    def test_noisy_decode(self):
        code = PolarCode(K=57, E=432, n_max=9, ibil=False)
        rng = np.random.default_rng(42)
        msg = rng.integers(0, 2, (20, code.K)).astype(np.uint8)
        u = polar_allocate(jnp.asarray(msg), code)
        x = polar_encode(u, code.n)
        tx = np.asarray(prm.rate_match(x, code)).astype(np.float64)
        # BPSK over AWGN at ~3 dB Eb/N0 effective.
        y = (1 - 2 * tx) + rng.normal(0, 0.5, tx.shape)
        llr = np.clip(np.round(8 * y), -120, 120).astype(np.int8)
        back = prm.rate_dematch(jnp.asarray(llr), code)
        got = np.asarray(polar_deallocate(polar_decode(back, code), code))
        # SC at this rate/SNR should decode nearly all words.
        word_ok = (got == msg).all(axis=1)
        assert word_ok.mean() >= 0.9, f"only {word_ok.mean():.2f} decoded"
