"""Golden (slow, obviously-correct) reference implementations used as oracles.

These intentionally use bit-by-bit loops that transcribe the 3GPP equations
directly; the framework's fast implementations are validated against them.
"""

from __future__ import annotations

import numpy as np


def gold_sequence(c_init: int, length: int) -> np.ndarray:
    """TS 38.211 Section 5.2.1 pseudo-random sequence, direct LFSR simulation."""
    nc = 1600
    total = length + nc
    x1 = np.zeros(total + 31, dtype=np.uint8)
    x2 = np.zeros(total + 31, dtype=np.uint8)
    x1[0] = 1
    for j in range(31):
        x2[j] = (c_init >> j) & 1
    for n in range(total):
        x1[n + 31] = x1[n + 3] ^ x1[n]
        x2[n + 31] = x2[n + 3] ^ x2[n + 2] ^ x2[n + 1] ^ x2[n]
    return (x1[nc:nc + length] ^ x2[nc:nc + length]).astype(np.uint8)


def crc_bits(bits: np.ndarray, order: int, poly: int) -> np.ndarray:
    """Bit-by-bit long-division CRC. `poly` includes the leading term."""
    reg = np.concatenate([np.asarray(bits, dtype=np.uint8), np.zeros(order, dtype=np.uint8)])
    g = np.array([(poly >> (order - i)) & 1 for i in range(order + 1)], dtype=np.uint8)
    for i in range(len(bits)):
        if reg[i]:
            reg[i:i + order + 1] ^= g
    return reg[-order:]
