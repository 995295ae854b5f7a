#!/usr/bin/env python3
"""Generate stored golden vectors from the reference C++ PRACH detector
(dump_prach, built by build.sh) into tests/vectors/prach_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (long, root, zcz, nports, preamble, delay_samples, snr_db, seed)
CONFIGS = [
    (1, 0, 1, 1, 17, 0.5, 20, 0),
    (1, 0, 1, 1, 17, 3.5, 20, 1),
    (1, 0, 11, 2, 5, 2.0, 10, 2),
    (1, 120, 5, 1, 33, 1.0, 15, 3),
    (1, 0, 0, 1, 9, 4.0, 20, 4),     # zcz 0: single root, unrestricted
    (0, 0, 11, 1, 17, 0.5, 20, 5),   # short B4
    (0, 0, 11, 2, 41, 1.5, 12, 6),
    (0, 50, 13, 1, 7, 0.5, 15, 7),
]


def main():
    data = {}
    for cfgv in CONFIGS:
        args = [str(BUILD / "dump_prach")] + [str(v) for v in cfgv]
        out = subprocess.run(args, capture_output=True, text=True,
                             check=True).stdout.splitlines()
        rows = {l.split()[0]: l.split()[1:] for l in out}
        lng, root, zcz, nports, pre, delay, snr, seed = cfgv
        key = f"l{lng}_r{root}_z{zcz}_p{nports}_pre{pre}_d{delay}_s{seed}"
        iq = np.array([float.fromhex(x) for x in rows["IN"]], np.float32)
        L = 839 if lng else 139
        data[f"{key}_in"] = iq.reshape(nports, L, 2)
        data[f"{key}_ta_res_ns"] = np.float32(float.fromhex(rows["TA_RES"][0]))
        det = rows["DET"]
        n = len(det) // 3
        data[f"{key}_det"] = np.array(
            [[float(det[3 * i]), float.fromhex(det[3 * i + 1]),
              float.fromhex(det[3 * i + 2])] for i in range(n)],
            np.float32).reshape(n, 3)
        assert any(int(d[0]) == pre for d in data[f"{key}_det"]), \
            f"reference missed its own preamble: {key}"
    np.savez_compressed(VEC / "prach_reference.npz", **data)
    print(f"wrote prach_reference.npz ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
