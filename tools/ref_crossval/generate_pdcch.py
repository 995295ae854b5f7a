#!/usr/bin/env python3
"""Golden PDCCH-encoder vectors from the reference C++ encoder (dump_pdcch)
into tests/vectors/pdcch_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (nof_dci_bits, E, rnti, seed) -- aggregation levels 1..8 worth of E.
CONFIGS = [
    (40, 216, 0x4601, 0),
    (12, 108, 0xFFFF, 1),
    (60, 432, 1, 2),
    (128, 864, 0xABCD, 3),
    (40, 1728, 0x17, 4),
]


def main():
    data = {}
    for cfg in CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_pdcch")] + [str(v) for v in cfg],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {ln.split()[0]: [int(v) for v in ln.split()[1:]] for ln in out}
        key = "d" + "_".join(str(v) for v in cfg)
        data[f"{key}_dci"] = np.array(rows["DCI"], np.uint8)
        data[f"{key}_enc"] = np.array(rows["ENC"], np.uint8)
    np.savez_compressed(VEC / "pdcch_reference.npz", **data)
    print(f"wrote pdcch_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
