#!/usr/bin/env python3
"""Extract the 3GPP TS 38.212 LDPC base-graph shift tables into a compact .npz asset.

The tables are standardized numeric data (TS 38.212 Tables 5.3.2-2 / 5.3.2-3): for each
of the 8 lifting-set indices i_LS, a matrix of cyclic-shift values V(i,j) per
(check node, variable node) edge, with 0xFFFF marking "no edge".  The reference keeps
them as C++ constexpr arrays (reference: lib/phy/upper/channel_coding/ldpc/
ldpc_luts_impl.cpp:450,2682); we parse those arrays once and store the same standard
data as numpy arrays.  The actual per-lifting-size shift is V mod Z
(ldpc_luts_impl.cpp:4536-4540).

Output: srsran_projectvtlmo_tpu/data/ldpc_base_graphs.npz
  bg1: uint16 [8, 46, 68]   (NO_EDGE = 0xFFFF)
  bg2: uint16 [8, 42, 52]
"""

import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference/lib/phy/upper/channel_coding/ldpc/ldpc_luts_impl.cpp")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "ldpc_base_graphs.npz"

NO_EDGE = 0xFFFF


def extract(text: str, marker: str, nof_sets: int, rows: int, cols: int) -> np.ndarray:
    """Pull all integers between '<marker> - lifting size index k' section comments."""
    out = np.empty((nof_sets, rows, cols), dtype=np.uint16)
    for k in range(nof_sets):
        start = text.index(f"// {marker} - lifting size index {k}")
        if k + 1 < nof_sets:
            end = text.index(f"// {marker} - lifting size index {k + 1}")
        else:
            # Section runs until the closing of the array; the next static declaration.
            end = text.index("static", start)
            if end < start:
                end = len(text)
            end = text.index("static const", start)
        chunk = text[start:end]
        # Strip comments, then collect numbers and NO_EDGE tokens in order.
        chunk = re.sub(r"//.*", "", chunk)
        toks = re.findall(r"NO_EDGE|\d+", chunk)
        # The first token after the marker text may include stray digits from the
        # marker itself -- the marker line was removed with the comment strip above.
        vals = [NO_EDGE if t == "NO_EDGE" else int(t) for t in toks]
        expect = rows * cols
        if len(vals) != expect:
            raise SystemExit(f"{marker}[{k}]: parsed {len(vals)} values, expected {expect}")
        out[k] = np.array(vals, dtype=np.uint16).reshape(rows, cols)
    return out


def main() -> None:
    text = REF.read_text()
    bg1 = extract(text, "BG1", 8, 46, 68)
    bg2 = extract(text, "BG2", 8, 42, 52)

    # Sanity: core structure of the standard base graphs.
    for name, bg, m, n in (("BG1", bg1, 46, 68), ("BG2", bg2, 42, 52)):
        k = n - m  # 22 / 10 information nodes
        for i in range(8):
            mat = bg[i]
            # Double-diagonal parity part: each extension row r>=4 has exactly one
            # parity column (k+4 .. n) edge, with shift 0, on its own diagonal.
            for r in range(4, m):
                prow = mat[r, k + 4:]
                nz = np.flatnonzero(prow != NO_EDGE)
                assert list(nz) == [r - 4], f"{name}[{i}] row {r}: {nz}"
                assert prow[r - 4] == 0
            # Core parity 4x4 block is double-diagonal.
            core = mat[:4, k:k + 4]
            assert (core != NO_EDGE).sum() >= 9
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, bg1=bg1, bg2=bg2)
    print(f"wrote {OUT}: bg1 {bg1.shape} ({(bg1 != NO_EDGE).sum()} edges over 8 sets), "
          f"bg2 {bg2.shape} ({(bg2 != NO_EDGE).sum()} edges)")


if __name__ == "__main__":
    sys.exit(main())
