"""NZP-CSI-RS generation (TS 38.211 Section 7.4.1.5), row-1/row-2 patterns.

Gold-sequence QPSK pilots mapped on the configured (symbol, subcarrier comb)
of each RB.
reference: lib/phy/upper/signal_processors/nzp_csi_rs_generator_impl.cpp.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import prg as prg_mod


@dataclass(frozen=True)
class CsiRsConfig:
    nof_rb: int
    prb_start: int = 0
    symbol: int = 4
    #: Density-1 row 2: one RE per RB at subcarrier offset k0.
    subcarrier_offset: int = 0
    scrambling_id: int = 0
    slot: int = 0
    amplitude: float = 1.0


def csi_rs_cinit(cfg: CsiRsConfig) -> int:
    return (
        (1 << 10) * (14 * cfg.slot + cfg.symbol + 1) * (2 * cfg.scrambling_id + 1)
        + cfg.scrambling_id
    ) % (1 << 31)


def csi_rs_sequence(cfg: CsiRsConfig) -> np.ndarray:
    """(nof_rb,) complex64 pilots (row-2 density 1)."""
    m0 = cfg.prb_start
    bits = prg_mod.gold_sequence_bits(csi_rs_cinit(cfg), 2 * (m0 + cfg.nof_rb)).astype(np.float32)
    bits = bits[2 * m0:]
    vals = (1 - 2 * bits) / np.sqrt(2)
    return (cfg.amplitude * (vals[0::2] + 1j * vals[1::2])).astype(np.complex64)


def map_csi_rs(grid: np.ndarray, cfg: CsiRsConfig) -> None:
    """Scatter CSI-RS pilots into a (nsym, nsubc) numpy grid in place."""
    seq = csi_rs_sequence(cfg)
    k = (cfg.prb_start + np.arange(cfg.nof_rb)) * 12 + cfg.subcarrier_offset
    grid[cfg.symbol, k] = seq
