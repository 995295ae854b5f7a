#!/usr/bin/env python3
"""Golden vectors from the reference C++ short-block encoder/ML detector
(dump_short) into tests/vectors/short_block_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"


def main():
    data = {}
    n = 0
    for k in range(1, 12):
        for bps in (1, 2, 4):
            for seed in (0, 1):
                e = 48
                out = subprocess.run(
                    [str(BUILD / "dump_short"), str(k), str(e), str(bps),
                     str(seed)],
                    capture_output=True, text=True, check=True).stdout.splitlines()
                rows = {ln.split()[0]: [int(v) for v in ln.split()[1:]]
                        for ln in out}
                key = f"k{k}_e{e}_bps{bps}_s{seed}"
                data[f"{key}_msg"] = np.array(rows["MSG"], np.uint8)
                data[f"{key}_enc"] = np.array(rows["ENC"], np.uint8)
                data[f"{key}_llr"] = np.array(rows["LLR"], np.int8)
                data[f"{key}_det"] = np.array(rows["DET"], np.uint8)
                data[f"{key}_valid"] = np.array(rows["VALID"], np.uint8)
                n += 1
    np.savez_compressed(VEC / "short_block_reference.npz", **data)
    print(f"wrote short_block_reference.npz ({n} cases)")


if __name__ == "__main__":
    sys.exit(main())
