"""HARQ soft-buffer pool: device-resident rx_buffer arena.

The reference keeps persistent soft-bit + CB-CRC buffers keyed by
(RNTI, HARQ-id) with slot-based reservation/expiry
(reference: include/srsran/phy/upper/rx_buffer_pool.h:40-106,
lib/phy/upper/rx_buffer_pool_impl.cpp).  Here the soft bits live in one
preallocated device array (nof_buffers, max_codeblocks, max_cb_size) int8;
the host keeps only the (rnti, harq) -> buffer-index reservation map, so HARQ
combining happens on device with no host round trips.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np


@dataclass
class _Reservation:
    buffer_index: int
    expiry_slot: int
    nof_cb: int


class RxBufferPool:
    """Host-managed reservation map over a device soft-buffer arena."""

    def __init__(self, nof_buffers: int = 16, max_codeblocks: int = 162,
                 max_cb_size: int = 66 * 384, expiry_slots: int = 100):
        self.nof_buffers = nof_buffers
        self.max_codeblocks = max_codeblocks
        self.max_cb_size = max_cb_size
        self.expiry_slots = expiry_slots
        self._soft = jnp.zeros((nof_buffers, max_codeblocks, max_cb_size), jnp.int8)
        self._reservations: dict[tuple[int, int], _Reservation] = {}
        self._free = list(range(nof_buffers))

    def reserve(self, slot: int, rnti: int, harq_id: int, nof_cb: int, *,
                new_data: bool) -> int | None:
        """Reserve (or re-acquire) the buffer for (rnti, harq). None if exhausted."""
        self.run_slot(slot)
        key = (rnti, harq_id)
        res = self._reservations.get(key)
        if res is not None and res.nof_cb == nof_cb:
            res.expiry_slot = slot + self.expiry_slots
            if new_data:
                self._soft = self._soft.at[res.buffer_index, :nof_cb].set(0)
            return res.buffer_index
        if res is not None:
            self._release(key)
        if not self._free:
            return None
        idx = self._free.pop()
        self._reservations[key] = _Reservation(idx, slot + self.expiry_slots, nof_cb)
        self._soft = self._soft.at[idx, :nof_cb].set(0)
        return idx

    def get_soft(self, buffer_index: int, nof_cb: int, cb_size: int):
        """Device view of the stored soft bits: (nof_cb, cb_size) int8."""
        return self._soft[buffer_index, :nof_cb, :cb_size]

    def store(self, buffer_index: int, nof_cb: int, cb_size: int, soft) -> None:
        """Replace the buffer contents with `soft` ((nof_cb, cb_size) int8)."""
        self._soft = self._soft.at[buffer_index, :nof_cb, :cb_size].set(soft)

    def combined(self, buffer_index: int, nof_cb: int, cb_size: int, new_llrs):
        """Promotion-sum `new_llrs` (B=1 layout (nof_cb, cb_size)) into the buffer.

        Returns the combined LLRs; stores them back as the new buffer state.
        """
        from ..utils.llr import llr_promotion_sum

        old = self._soft[buffer_index, :nof_cb, :cb_size]
        out = llr_promotion_sum(old, new_llrs)
        self._soft = self._soft.at[buffer_index, :nof_cb, :cb_size].set(out)
        return out

    def release(self, rnti: int, harq_id: int) -> None:
        """Free the buffer (e.g. after TB CRC pass)."""
        self._release((rnti, harq_id))

    def _release(self, key) -> None:
        res = self._reservations.pop(key, None)
        if res is not None:
            self._free.append(res.buffer_index)

    def run_slot(self, slot: int) -> None:
        """Expire stale reservations (reference: rx_buffer_pool expiry)."""
        for key, res in list(self._reservations.items()):
            if slot >= res.expiry_slot:
                self._release(key)

    @property
    def nof_reserved(self) -> int:
        return len(self._reservations)
