"""UL-SCH / UCI multiplexing on PUSCH (TS 38.212 Section 6.2.7, scoped).

The reference implements a streaming per-symbol demultiplexer state machine
(reference: lib/phy/upper/channel_processors/pusch/ulsch_demultiplex_impl.cpp,
set_csi_part2 :241).  Here the placement is a precomputed index plan shared by
the transmitter and receiver:

 * HARQ-ACK <= 2 bits: the ACK REs *puncture* the UL-SCH (data still mapped,
   receiver zeroes those LLRs for SCH decoding);
 * HARQ-ACK > 2 bits: the ACK REs are *reserved* (data rate-matched around).

Scoped placement rule (documented deviation): ACK REs occupy evenly strided
subcarriers of the first data symbol(s) after the first DM-RS symbol --
equivalent diversity/estimation behavior to the standard distribution, same
index plan on both ends.  CSI part 1/2 multiplexing follows in a later round.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def harq_ack_re_plan(
    nof_ack_bits: int,
    qm: int,
    nof_subc: int,
    data_symbols: tuple[int, ...],
    dmrs_symbols: tuple[int, ...],
    beta_offset: float = 2.0,
) -> np.ndarray:
    """Indices (in codeword-symbol order) of the REs carrying HARQ-ACK.

    The codeword symbol index is i = sym_idx * nof_subc + subc where sym_idx
    counts *data* symbols in order.  Returns an int64 array of G_ack/qm REs.
    """
    if nof_ack_bits == 0:
        return np.empty(0, dtype=np.int64)
    # Coded ACK bits: ceil(beta * payload * qm-normalized); >= 1 RE, 4x repetition
    # floor for robustness at small payloads.
    nof_re = max(int(np.ceil(beta_offset * nof_ack_bits * 4 / qm)), 1)
    first_dmrs = min(dmrs_symbols)
    after = [i for i, s in enumerate(data_symbols) if s > first_dmrs]
    order = after + [i for i in range(len(data_symbols)) if i not in after]
    res = []
    for sym_i in order:
        take = min(nof_subc, nof_re - len(res))
        if take <= 0:
            break
        stride = max(nof_subc // take, 1)
        for k in range(take):
            res.append(sym_i * nof_subc + k * stride)
    return np.asarray(sorted(set(res))[:nof_re], dtype=np.int64)
