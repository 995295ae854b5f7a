"""Two-phase CSI part-1 -> part-2 protocol on PUSCH."""

import numpy as np

import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
from srsran_projectvtlmo_tpu.models.ulsch_tx import build_ulsch_tx_slot
from srsran_projectvtlmo_tpu.phy.pusch_uci import (
    PuschUciConfig, PuschUciProcessor, csi1_re_plan, csi2_re_plan, _bit_idx,
)
from srsran_projectvtlmo_tpu.ops import short_block, prg
from srsran_projectvtlmo_tpu.ops.modulation import modulate_np
from srsran_projectvtlmo_tpu.ran.modulation import Modulation, bits_per_symbol
from srsran_projectvtlmo_tpu.utils.cplx import pair_to_np, np_to_pair
from srsran_projectvtlmo_tpu.ops import ofdm


def test_csi_part1_part2_two_phase():
    rx = PuschRxConfig(nof_rb=16, modulation=Modulation.QAM16, target_code_rate=0.5,
                       nof_rx_ports=1, dft_size=256, numerology=1, dmrs_symbols=(2,))
    # part1 value v selects part2 size: here 2 bits -> sizes (4, 6, 8, 10).
    cfg = PuschUciConfig(rx=rx, nof_csi1_bits=2, part2_size_map=(4, 6, 8, 10))
    qm = bits_per_symbol(rx.modulation)

    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (1, rx.tbs)).astype(np.uint8)
    csi1 = np.array([1, 0], np.uint8)       # value 2 -> csi2 size 8
    csi2 = rng.integers(0, 2, 8).astype(np.uint8)

    tx = build_ulsch_tx_slot(rx)
    grid_pair, _ = tx(jnp.asarray(tb))
    grid = pair_to_np(np.asarray(grid_pair))[0]  # (14, nsubc)

    # Multiplex CSI fields (puncturing) exactly like the receiver's plan.
    scr = prg.gold_sequence_bits(rx.scrambling_cinit(), rx.nof_codeword_bits)
    data_syms = list(rx.data_symbols)

    def overwrite(res, payload_bits, k):
        coded = short_block.encode_host(payload_bits, len(res) * qm, qm)
        coded = coded ^ scr[_bit_idx(res, qm)]
        syms = modulate_np(coded, rx.modulation)
        for i, r in enumerate(res):
            sym_i, subc = divmod(int(r), rx.nof_subc)
            grid[data_syms[sym_i], subc] = syms[i]

    overwrite(csi1_re_plan(rx, 2), csi1, 2)
    overwrite(csi2_re_plan(rx, 2, 8), csi2, 8)

    noisy = grid + 0.01 * (rng.normal(size=grid.shape) + 1j * rng.normal(size=grid.shape))
    samples = ofdm.ofdm_modulate(jnp.asarray(np_to_pair(noisy)), rx.dft_size, 1, 0)
    rx_grid = ofdm.ofdm_demodulate(samples, rx.nof_subc, rx.dft_size, 1, 0)

    proc = PuschUciProcessor(cfg)
    out = proc.process(jnp.asarray(np.asarray(rx_grid))[None, None])
    assert out["csi2_size"] == 8
    np.testing.assert_array_equal(out["csi1_bits"][0], csi1)
    assert bool(out["csi1_valid"][0])
    np.testing.assert_array_equal(np.asarray(out["csi2_bits"])[0], csi2)
    assert bool(np.asarray(out["csi2_valid"])[0])
    assert bool(np.asarray(out["tb_crc_ok"])[0]), "SCH failed with CSI puncturing"
    np.testing.assert_array_equal(np.asarray(out["tb_bits"]), tb)
