#!/usr/bin/env python3
"""Golden PUCCH format-0 detection vectors from the reference C++ detector
(dump_pucch0) into tests/vectors/pucch0_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (n_id, slot, l0, nsym, m0, nharq, nports, mcs, snr_milli, seed)
CONFIGS = [
    (37, 3, 12, 2, 4, 2, 1, 3, 1500, 0),
    (37, 3, 12, 2, 4, 2, 2, 3, 1500, 1),
    (37, 3, 12, 2, 4, 2, 4, 6, 1500, 2),
    (501, 0, 13, 1, 0, 1, 4, 6, 2000, 3),
    (501, 5, 12, 2, 7, 1, 2, 0, 1500, 4),
    (88, 1, 12, 2, 2, 2, 4, -1, 0, 5),   # noise only
    (88, 1, 12, 2, 2, 1, 1, -1, 0, 6),   # noise only, 1 port
]


def main():
    data = {}
    for cfg in CONFIGS:
        n_id, slot, l0, nsym, m0, nharq, nports, mcs, snr, seed = cfg
        out = subprocess.run(
            [str(BUILD / "dump_pucch0")] + [str(v) for v in cfg],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {ln.split()[0]: ln.split()[1:] for ln in out}
        key = "c" + "_".join(str(v) for v in cfg)
        rx = np.array([float.fromhex(v) for v in rows["RX"]], np.float32)
        data[f"{key}_rx"] = rx.reshape(nports, nsym, 12, 2)
        data[f"{key}_bits"] = np.array([int(v) for v in rows.get("BITS", [])],
                                       np.uint8)
        data[f"{key}_status"] = np.array([int(rows["STATUS"][0])], np.uint8)
    np.savez_compressed(VEC / "pucch0_reference.npz", **data)
    print(f"wrote pucch0_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
