"""Transport-block segmentation into LDPC codeblocks (TS 38.212 Section 5.2.2).

Tx: TB bits + CRC24A/16 -> C codeblocks of K bits each: per-CB CRC24B when
C > 1, filler bits zeroed for encoding (their positions are carried in the
segmentation info for rate matching, which skips them).
reference: lib/phy/upper/channel_coding/ldpc/ldpc_segmenter_impl.cpp:90-254.

Host does the exact-integer index plan; bit movement and CRC run on device as
one reshape + batched CRC matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...ran.sch import SchSegmentation, sch_segmentation_info
from ..crc import crc_device, crc_host


def segment_tx(tb_bits, seg: SchSegmentation):
    """(TB,) bits -> (C, K) uint8 codeblocks with CRCs attached and filler zeroed.

    `tb_bits` may be numpy or jnp; returns a jnp array.
    """
    tb_bits = jnp.asarray(tb_bits, dtype=jnp.uint8)
    crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"
    tb_crc = crc_device(tb_bits[None], crc_name)[0]
    b = jnp.concatenate([tb_bits, tb_crc])

    c, kp, k = seg.nof_cb, seg.nof_payload_bits_per_cb, seg.nof_bits_per_cb
    payload = kp - seg.cb_crc_bits
    # Zero-pad B to C * payload (only the last CB can be short of payload bits --
    # by construction C * payload >= B with equality unless rounding; spec pads
    # with filler, equivalently zeros here since CRC runs per-CB afterwards).
    total = c * payload
    b = jnp.concatenate([b, jnp.zeros(total - b.shape[0], jnp.uint8)])
    cbs = b.reshape(c, payload)
    if seg.cb_crc_bits:
        cb_crc = crc_device(cbs, "CRC24B")
        cbs = jnp.concatenate([cbs, cb_crc], axis=1)
    # Filler bits (positions kp..k) are zero for encoding.
    cbs = jnp.concatenate([cbs, jnp.zeros((c, k - kp), jnp.uint8)], axis=1)
    return cbs


def desegment_rx(cb_bits, seg: SchSegmentation, tbs: int):
    """(C, K) decoded hard bits -> (tb_bits (TB,), tb_crc_ok bool, cb_crc_ok (C,)).

    Strips filler and per-CB CRCs, reassembles the TB, checks both CRC levels.
    """
    c, kp = seg.nof_cb, seg.nof_payload_bits_per_cb
    payload_bits = cb_bits[:, :kp]
    if seg.cb_crc_bits:
        from ..crc import crc_check_device

        cb_ok = crc_check_device(payload_bits, "CRC24B")
        payload = payload_bits[:, : kp - seg.cb_crc_bits].reshape(-1)
    else:
        cb_ok = jnp.ones((c,), bool)
        payload = payload_bits.reshape(-1)
    tb_and_crc = payload[: tbs + seg.tb_crc_bits]
    crc_name = "CRC24A" if seg.tb_crc_bits == 24 else "CRC16"
    from ..crc import crc_check_device

    tb_ok = crc_check_device(tb_and_crc[None], crc_name)[0]
    return tb_and_crc[:tbs], tb_ok, cb_ok
