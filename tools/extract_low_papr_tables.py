#!/usr/bin/env python3
"""Extract TS 38.211 Tables 5.2.2.2-1..4 (low-PAPR base sequence phases).

Standardized phi tables for sequence lengths 6/12/18/24 (30 sequences each),
kept as C++ arrays in the reference (reference: lib/phy/upper/
sequence_generators/low_papr_sequence_generator_impl.cpp:39-133).

Output: srsran_projectvtlmo_tpu/data/low_papr_tables.npz (phi_6/12/18/24 int8).
"""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/lib/phy/upper/sequence_generators/low_papr_sequence_generator_impl.cpp")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "low_papr_tables.npz"


def grab(text: str, name: str, m: int) -> np.ndarray:
    pat = rf"phi_M_sc_{m}\s*=\s*\{{(.*?)\}}\}};"
    mt = re.search(pat, text, re.S)
    assert mt, name
    vals = [int(v) for v in re.findall(r"-?\d+", mt.group(1))]
    assert len(vals) == 30 * m, (name, len(vals))
    arr = np.asarray(vals, dtype=np.int8).reshape(30, m)
    assert set(np.unique(arr)) <= {-3, -1, 1, 3}
    return arr


def main() -> None:
    text = REF.read_text()
    out = {f"phi_{m}": grab(text, f"phi_{m}", m) for m in (6, 12, 18, 24)}
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
