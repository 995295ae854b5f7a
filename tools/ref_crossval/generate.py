#!/usr/bin/env python3
"""Generate stored golden vectors from the reference C++ LDPC implementation.

Runs tools/ref_crossval/dump (build.sh) for a configuration matrix and stores
message/codeword/LLR/decoded arrays in tests/vectors/ldpc_reference.npz so the
parity tests run without the reference mount.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np

DUMP = Path("/tmp/refbuild/dump")
OUT = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors" / "ldpc_reference.npz"

CONFIGS = [(bg, z, it, seed)
           for bg in (1, 2)
           for z in (2, 3, 13, 40, 52, 144, 208, 384)
           for it in (2, 6)
           for seed in (0,)]


def main():
    data = {}
    for bg, z, it, seed in CONFIGS:
        out = subprocess.run([str(DUMP), str(bg), str(z), str(it), str(seed)],
                             capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {l.split()[0]: np.array(l.split()[1:], dtype=np.int32) for l in out}
        key = f"bg{bg}_z{z}_it{it}_s{seed}"
        data[f"{key}_msg"] = rows["MSG"].astype(np.uint8)
        data[f"{key}_enc"] = rows["ENC"].astype(np.uint8)
        data[f"{key}_llr"] = rows["LLR"].astype(np.int8)
        data[f"{key}_dec"] = rows["DEC"].astype(np.uint8)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
