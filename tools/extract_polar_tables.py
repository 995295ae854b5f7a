#!/usr/bin/env python3
"""Extract the TS 38.212 polar reliability sequences into a compact .npz asset.

The polar sub-channel reliability order (Table 5.3.1.2-1) is standardized data;
the reference keeps per-N ordered sequences (reference: lib/phy/upper/
channel_coding/polar/polar_code_impl.cpp:29-137).  We parse them once.  The
sub-block interleaver patterns are derived from the standard 32-entry pattern P
(Table 5.4.1.1-1) as J(n) = P[32n/N]*(N/32) + n mod N/32 and verified against
the reference tables instead of being stored.

Output: srsran_projectvtlmo_tpu/data/polar_tables.npz with mother_code_{5..10}.
"""

import re
from pathlib import Path

import numpy as np

REF = Path("/root/reference/lib/phy/upper/channel_coding/polar/polar_code_impl.cpp")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "polar_tables.npz"

#: TS 38.212 Table 5.4.1.1-1 sub-block interleaver pattern.
SUBBLOCK_PATTERN = [0, 1, 2, 4, 3, 5, 6, 7, 8, 16, 9, 17, 10, 18, 11, 19,
                    12, 20, 13, 21, 14, 22, 15, 23, 24, 25, 26, 28, 27, 29, 30, 31]


def parse_array(text: str, name: str, count: int) -> np.ndarray:
    m = re.search(rf"{name}\s*=\s*\{{(.*?)\}};", text, re.S)
    assert m, name
    vals = [int(v) for v in re.findall(r"\d+", m.group(1))]
    assert len(vals) == count, (name, len(vals))
    return np.asarray(vals, dtype=np.uint16)


def blk_interleaver(n: int) -> np.ndarray:
    nn = 1 << n
    j = np.arange(nn)
    p = np.asarray(SUBBLOCK_PATTERN)
    return (p[32 * j // nn] * (nn // 32) + j % (nn // 32)).astype(np.uint16)


def main() -> None:
    text = REF.read_text()
    out = {}
    for n in range(5, 11):
        out[f"mother_code_{n}"] = parse_array(text, f"mother_code_{n}", 1 << n)
        ref_blk = parse_array(text, f"blk_interleaver_{n}", 1 << n)
        derived = blk_interleaver(n)
        assert (ref_blk == derived).all(), f"blk_interleaver_{n} derivation mismatch"
    # Consistency: each mother code is a permutation of 0..N-1.
    for n in range(5, 11):
        mc = out[f"mother_code_{n}"]
        assert sorted(mc.tolist()) == list(range(1 << n))
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT}: mother codes n=5..10; blk interleavers verified derivable from P")


if __name__ == "__main__":
    main()
