#!/usr/bin/env python3
"""Golden DM-RS sequence vectors from the reference generation (dump_dmrs)
into tests/vectors/dmrs_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (n_id, n_scid, slot, symbol, nof_rb, rb_start, type)
CONFIGS = [
    (41, 0, 3, 2, 4, 10, 1),
    (41, 1, 3, 2, 4, 10, 1),
    (1007, 0, 19, 13, 273, 0, 1),
    (17, 0, 0, 0, 24, 100, 1),
    (900, 1, 7, 11, 24, 0, 2),
    (900, 0, 7, 11, 24, 5, 2),
    (3, 0, 12, 3, 52, 0, 2),
]


def main():
    data = {}
    for cfg in CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_dmrs")] + [str(v) for v in cfg],
            capture_output=True, text=True, check=True).stdout.split()
        key = "d" + "_".join(str(v) for v in cfg)
        data[key] = np.array([float.fromhex(v) for v in out[1:]],
                             np.float32).reshape(-1, 2)
    np.savez_compressed(VEC / "dmrs_reference.npz", **data)
    print(f"wrote dmrs_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
