"""Streaming rx-symbol handling: dispatch allocations when their last symbol lands.

The reference's upper PHY receives the UL resource grid symbol by symbol from
the lower PHY and dispatches each pending PDU once its final OFDM symbol has
arrived (reference: lib/phy/upper/upper_phy_rx_symbol_handler_impl.cpp:48-131,
uplink_slot_pdu_repository).  Here the repository tracks pending UL PDUs per
slot; symbols accumulate into a host-side grid buffer and ready PDUs are
returned to the caller (who runs them through UpperPhy.process_ul_slot or the
per-PDU processors).
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PendingPdu:
    pdu: object
    last_symbol: int


class UplinkSlotPduRepository:
    """Pending UL PDUs keyed by slot (reference: uplink_slot_pdu_repository)."""

    def __init__(self):
        self._pending: dict[int, list[PendingPdu]] = defaultdict(list)

    def add(self, slot: int, pdu) -> None:
        last = pdu.start_symbol + pdu.nof_symbols - 1
        self._pending[slot].append(PendingPdu(pdu, last))

    def pop_ready(self, slot: int, symbol: int) -> list:
        ready = [p.pdu for p in self._pending[slot] if p.last_symbol == symbol]
        self._pending[slot] = [p for p in self._pending[slot] if p.last_symbol != symbol]
        return ready

    def clear_slot(self, slot: int) -> list:
        return [p.pdu for p in self._pending.pop(slot, [])]

    def nof_pending(self, slot: int) -> int:
        return len(self._pending.get(slot, []))


class RxSymbolHandler:
    """Accumulates per-symbol rx data and surfaces PDUs whose window completed."""

    def __init__(self, nof_rx_ports: int, nof_subc: int, nof_symbols: int = 14):
        self.repo = UplinkSlotPduRepository()
        self._shape = (nof_rx_ports, nof_symbols, nof_subc)
        self._grids: dict[int, np.ndarray] = {}
        self._seen: dict[int, set[int]] = defaultdict(set)

    def handle_rx_symbol(self, slot: int, symbol: int, symbol_data: np.ndarray) -> list:
        """symbol_data (nof_rx_ports, nof_subc) complex -> list of ready PDUs."""
        grid = self._grids.setdefault(slot, np.zeros(self._shape, np.complex64))
        grid[:, symbol, :] = symbol_data
        self._seen[slot].add(symbol)
        return self.repo.pop_ready(slot, symbol)

    def grid(self, slot: int) -> np.ndarray:
        return self._grids[slot]

    def release_slot(self, slot: int) -> None:
        self._grids.pop(slot, None)
        self._seen.pop(slot, None)
