#!/usr/bin/env python3
"""Extract the TS 38.211 PRACH logical->physical root sequence tables.

Table 6.3.3.1-3 (long, 838 entries) and 6.3.3.1-4 (short, 138 entries) are
standardized data kept as C++ arrays in the reference
(reference: lib/phy/upper/channel_processors/prach_generator_impl.cpp:40-95).

Output: srsran_projectvtlmo_tpu/data/prach_tables.npz
"""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/lib/phy/upper/channel_processors/prach_generator_impl.cpp")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "prach_tables.npz"


def grab(text: str, func: str, count: int) -> np.ndarray:
    m = re.search(rf"{func}\(unsigned root_sequence_index\)\s*\{{.*?=\s*\{{(.*?)\}};", text, re.S)
    assert m, func
    vals = [int(v) for v in re.findall(r"\d+", m.group(1))]
    assert len(vals) == count, (func, len(vals))
    return np.asarray(vals, dtype=np.uint16)


def main() -> None:
    text = REF.read_text()
    long_lut = grab(text, "get_sequence_number_long", 838)
    short_lut = grab(text, "get_sequence_number_short", 138)
    # Sanity: permutations of 1..L-1.
    assert sorted(long_lut.tolist()) == list(range(1, 839))
    assert sorted(short_lut.tolist()) == list(range(1, 139))
    # The short table follows the closed form (i/2+1, 139-(i/2+1)) alternating.
    i = np.arange(138)
    expect = np.where(i % 2 == 0, i // 2 + 1, 138 - i // 2)
    assert (short_lut == expect).all()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, long_root_lut=long_lut, short_root_lut=short_lut)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
