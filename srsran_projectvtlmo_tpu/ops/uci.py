"""UCI encoding/decoding (HARQ-ACK / CSI payloads), TS 38.212 Sections 6.3.1/6.3.2.

1-11 bits: short-block code with brute-force ML detection.
12-1706 bits: CRC6 (K<=19) or CRC11 (K>=20) + polar (n_max=10, ibil), with
two-codeblock segmentation when (K>=360 and E>=1088) or K>=1013; filler bits
are prepended to the first codeblock.
reference: lib/phy/upper/channel_processors/uci/uci_decoder_impl.cpp:30-123.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .crc import crc_host
from . import short_block
from .polar import PolarCode, polar_encode, polar_decode, polar_allocate, polar_deallocate
from .polar import rate_matching as polar_rm


def nof_uci_codeblocks(k: int, e: int) -> int:
    return 2 if (k >= 360 and e >= 1088) or k >= 1013 else 1


def uci_crc_size(k: int) -> int:
    return 11 if k >= 20 else 6


def uci_encode(msg: np.ndarray, e: int, bits_per_symbol: int = 2) -> np.ndarray:
    """Host-side UCI encoder (test driver / UE emulator). msg (K,) -> (E,) bits."""
    k = len(msg)
    if k <= 11:
        return short_block.encode_host(msg, e, bits_per_symbol)
    c = nof_uci_codeblocks(k, e)
    crc_bits = uci_crc_size(k)
    crc_name = "CRC11" if crc_bits == 11 else "CRC6"
    out = []
    k0 = k // c
    filler = k % c
    starts = [0, k0]
    sizes = [k0, -(-k // c)] if c == 2 else [k]
    for j in range(c):
        cb = msg[starts[j]:starts[j] + sizes[j]]
        if j == 0 and filler and c > 1:
            cb = np.concatenate([np.zeros(filler, np.uint8), cb])
        elif j == 0 and c == 1:
            cb = cb  # no filler for single CB (K % 1 == 0)
        payload = np.concatenate([cb, crc_host(cb, crc_name)])
        code = PolarCode(K=len(payload), E=e // c, n_max=10, ibil=True)
        u = polar_allocate(jnp.asarray(payload[None]), code)
        x = polar_encode(u, code.n)
        out.append(np.asarray(polar_rm.rate_match(x, code))[0])
    return np.concatenate(out)


def uci_decode(llrs, k: int, bits_per_symbol: int = 2):
    """Decode one UCI payload from (B, E) int8 LLRs.

    Returns (bits (B, K) uint8, valid (B,) bool-ish). For short blocks `valid`
    is a detection metric threshold (>= 0.5 heuristic mirrors DTX detection);
    for polar it is the CRC check.
    """
    e = llrs.shape[-1]
    if k <= 11:
        bits, metric = short_block.detect(llrs, k, bits_per_symbol)
        return bits, metric > 0.25
    from .crc import crc_check_device

    c = nof_uci_codeblocks(k, e)
    crc_bits = uci_crc_size(k)
    crc_name = "CRC11" if crc_bits == 11 else "CRC6"
    k0 = k // c
    filler = k % c if c > 1 else 0
    outs = []
    valid = None
    sizes = [k0, -(-k // c)] if c == 2 else [k]
    for j in range(c):
        cb_k = sizes[j] + crc_bits + (filler if j == 0 else 0)
        code = PolarCode(K=cb_k, E=e // c, n_max=10, ibil=True)
        cb_llr = llrs[..., j * (e // c):(j + 1) * (e // c)]
        buf = polar_rm.rate_dematch(cb_llr, code)
        u = polar_decode(buf, code)
        payload = polar_deallocate(u, code)  # (B, cb_k)
        ok = crc_check_device(payload, crc_name)
        start = filler if j == 0 else 0
        outs.append(payload[..., start:cb_k - crc_bits])
        valid = ok if valid is None else (valid & ok)
    return jnp.concatenate(outs, axis=-1), valid
