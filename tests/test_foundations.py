"""Tests for foundation layers: PRG, CRC, LLR semantics, modulation, ran math."""

import numpy as np
import pytest

from srsran_projectvtlmo_tpu.ops import prg, crc, modulation
from srsran_projectvtlmo_tpu.ran import sch, ldpc_params
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.utils import llr as llr_mod
from srsran_projectvtlmo_tpu.utils.bits import pack_bits, unpack_bits

from tests.golden.sequences import gold_sequence, crc_bits


class TestGoldPrg:
    @pytest.mark.parametrize("c_init", [0, 1, 0x12345678 & 0x7FFFFFFF, (1 << 31) - 1, 301])
    def test_matches_golden(self, c_init):
        n = 1517
        got = prg.gold_sequence_bits(c_init, n)
        want = gold_sequence(c_init, n)
        np.testing.assert_array_equal(got, want)

    def test_long_sequence(self):
        c_init = 98765
        n = 40000
        np.testing.assert_array_equal(prg.gold_sequence_bits(c_init, n), gold_sequence(c_init, n))

    def test_signs(self):
        bits = prg.gold_sequence_bits(7, 64)
        signs = prg.gold_sequence_signs(7, 64)
        np.testing.assert_array_equal(signs, 1 - 2 * bits.astype(np.int8))


class TestCrc:
    @pytest.mark.parametrize("name", list(crc.POLYS))
    def test_host_matches_golden(self, name):
        rng = np.random.default_rng(0)
        order, poly = crc.POLYS[name]
        for n in (1, 8, 24, 100, 1000):
            bits = rng.integers(0, 2, n).astype(np.uint8)
            np.testing.assert_array_equal(crc_host_wrap(bits, name), crc_bits(bits, order, poly),
                                          err_msg=f"{name} n={n}")

    @pytest.mark.parametrize("name", ["CRC24A", "CRC24B", "CRC16"])
    def test_device_matches_host(self, name):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, (4, 528)).astype(np.uint8)
        got = np.asarray(crc.crc_device(bits, name))
        for i in range(4):
            np.testing.assert_array_equal(got[i], crc.crc_host(bits[i], name))

    def test_check_device(self):
        rng = np.random.default_rng(2)
        bits = rng.integers(0, 2, 120).astype(np.uint8)
        rem = crc.crc_host(bits, "CRC24B")
        ok = np.concatenate([bits, rem])
        bad = ok.copy()
        bad[17] ^= 1
        assert bool(crc.crc_check_device(ok[None], "CRC24B")[0])
        assert not bool(crc.crc_check_device(bad[None], "CRC24B")[0])


def crc_host_wrap(bits, name):
    return crc.crc_host(bits, name)


class TestLlr:
    def test_saturating_add(self):
        import jax.numpy as jnp
        a = jnp.array([100, -100, 127, -127, 127, 5, 60], dtype=jnp.int8)
        b = jnp.array([50, -50, 5, 5, -127, -5, 70], dtype=jnp.int8)
        out = llr_mod.llr_saturating_add(a, b)
        np.testing.assert_array_equal(np.asarray(out), [120, -120, 127, -127, 0, 0, 120])

    def test_promotion_sum(self):
        import jax.numpy as jnp
        a = jnp.array([100, -100, 60], dtype=jnp.int8)
        b = jnp.array([50, -50, 50], dtype=jnp.int8)
        out = llr_mod.llr_promotion_sum(a, b)
        np.testing.assert_array_equal(np.asarray(out), [127, -127, 110])

    def test_quantize_round_half_away(self):
        import jax.numpy as jnp
        x = jnp.array([0.5004166, -0.5004166, 2.0, -2.0])  # 0.5004166*120 = 60.05
        out = llr_mod.llr_quantize(x, 1.0)
        np.testing.assert_array_equal(np.asarray(out), [60, -60, 120, -120])


class TestBits:
    def test_roundtrip(self):
        rng = np.random.default_rng(3)
        bits = rng.integers(0, 2, 1000).astype(np.uint8)
        np.testing.assert_array_equal(unpack_bits(pack_bits(bits), 1000), bits)


class TestModulation:
    @pytest.mark.parametrize("mod", list(Modulation))
    def test_unit_energy(self, mod):
        from srsran_projectvtlmo_tpu.ops.modulation import constellation
        pts = constellation(mod)
        assert abs(np.mean(np.abs(pts) ** 2) - 1.0) < 1e-6

    def test_qpsk_values(self):
        import jax.numpy as jnp
        bits = jnp.array([0, 0, 0, 1, 1, 0, 1, 1], dtype=jnp.uint8)
        sym = np.asarray(modulation.modulate(bits, Modulation.QPSK))
        s = 1 / np.sqrt(2)
        np.testing.assert_allclose(sym, [s + 1j * s, s - 1j * s, -s + 1j * s, -s - 1j * s], rtol=1e-6)

    def test_qam16_gray(self):
        import jax.numpy as jnp
        # TS 38.211 5.1.4: b(0..3)=0000 -> (1+1j)/sqrt(10); 1111 -> (-3-3j)/sqrt(10) is wrong:
        # 1111: re = (1-2)= -1*(2-(1-2)) = -3 -> -3/sqrt10... verify numerically.
        bits = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], dtype=jnp.uint8)
        sym = np.asarray(modulation.modulate(bits, Modulation.QAM16))
        np.testing.assert_allclose(sym[0], (1 + 1j) / np.sqrt(10), rtol=1e-6)
        np.testing.assert_allclose(sym[1], (-3 - 3j) / np.sqrt(10), rtol=1e-6)


class TestRanMath:
    def test_lifting_sizes(self):
        assert len(ldpc_params.ALL_LIFTING_SIZES) == 51
        assert ldpc_params.ALL_LIFTING_SIZES[0] == 2
        assert ldpc_params.ALL_LIFTING_SIZES[-1] == 384
        assert ldpc_params.lifting_index(384) == 1  # 384 = 3 * 2^7
        assert ldpc_params.lifting_index(208) == 6  # 208 = 13 * 16
        assert ldpc_params.lifting_index(2) == 0

    def test_tbs_known_values(self):
        # Small case: nof_info <= 3824 quantized lookup.
        tbs = sch.tbs_calculator(nof_re=156, target_code_rate=0.30, modulation_bits=2, nof_layers=1)
        assert tbs in sch.TBS_TABLE
        # Large case must be byte aligned and > 3824.
        tbs = sch.tbs_calculator(nof_re=156 * 273, target_code_rate=0.92, modulation_bits=8, nof_layers=2)
        assert tbs > 3824 and (tbs + 24) % 8 == 0

    def test_segmentation_single_cb(self):
        info = sch.sch_segmentation_info(3000, 0.8)
        assert info.base_graph == ldpc_params.BaseGraph.BG1
        assert info.nof_cb == 1
        assert info.cb_crc_bits == 0
        assert info.nof_bits_per_cb == 22 * info.lifting_size

    def test_segmentation_multi_cb(self):
        info = sch.sch_segmentation_info(20000, 0.5)
        assert info.nof_cb > 1
        assert info.cb_crc_bits == 24
        # All payload bits fit: C * K' >= B + C*24
        assert info.nof_payload_bits_per_cb * info.nof_cb >= 20000 + 24 + info.nof_cb * 24
        assert info.nof_filler_bits_per_cb >= 0

    def test_base_graph_selection(self):
        assert sch.choose_base_graph(200, 0.9) == ldpc_params.BaseGraph.BG2
        assert sch.choose_base_graph(4000, 0.9) == ldpc_params.BaseGraph.BG1
        assert sch.choose_base_graph(10000, 0.2) == ldpc_params.BaseGraph.BG2


class TestSlotPoint:
    def test_arithmetic_and_wrap(self):
        from srsran_projectvtlmo_tpu.ran.slot import SlotPoint
        s = SlotPoint(1, 19)  # mu=1: 20 slots/frame
        assert s.sfn == 0 and s.slot_index == 19
        t = s + 1
        assert t.sfn == 1 and t.slot_index == 0
        assert t - s == 1
        assert s < t
        # Hyperframe wrap: distance is signed shortest path.
        a = SlotPoint(1, 0)
        b = a + (1024 * 20 - 1)
        assert a - b == 1
        assert b < a
        u = SlotPoint(1, 43)
        assert u.subframe_index == (43 % 20) // 2
        assert u.slot_in_subframe == 43 % 2


class TestMcs:
    def test_mcs_tables(self):
        from srsran_projectvtlmo_tpu.ran.mcs import mcs_to_modulation_and_rate
        from srsran_projectvtlmo_tpu.ran.modulation import Modulation
        assert mcs_to_modulation_and_rate(0) == (Modulation.QPSK, 120 / 1024)
        assert mcs_to_modulation_and_rate(28)[0] == Modulation.QAM64
        mod, r = mcs_to_modulation_and_rate(27, "qam256")
        assert mod == Modulation.QAM256 and abs(r - 948 / 1024) < 1e-9
        mod, r = mcs_to_modulation_and_rate(20, "qam256")
        assert mod == Modulation.QAM256 and abs(r - 682.5 / 1024) < 1e-9
        import pytest
        with pytest.raises(ValueError):
            mcs_to_modulation_and_rate(29)
