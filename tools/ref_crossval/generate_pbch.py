#!/usr/bin/env python3
"""Golden PBCH-encoder vectors from the reference C++ encoder (dump_pbch)
into tests/vectors/pbch_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (n_id, sfn, ssb_idx, l_max, hrf, k_ssb, seed)
CONFIGS = [
    (123, 45, 2, 8, 1, 5, 0),
    (0, 0, 0, 4, 0, 0, 1),
    (1007, 1023, 7, 8, 0, 22, 2),
    (500, 512, 37, 64, 1, 11, 3),
    (41, 256, 0, 8, 0, 17, 4),   # k_ssb >= 16: MSB rides in the payload
]


def main():
    data = {}
    for cfg in CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_pbch")] + [str(v) for v in cfg],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {ln.split()[0]: [int(v) for v in ln.split()[1:]] for ln in out}
        key = "p" + "_".join(str(v) for v in cfg)
        data[f"{key}_mib"] = np.array(rows["MIB"], np.uint8)
        data[f"{key}_enc"] = np.array(rows["ENC"], np.uint8)
    np.savez_compressed(VEC / "pbch_reference.npz", **data)
    print(f"wrote pbch_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
