#!/usr/bin/env python3
"""Golden PSS/SSS vectors from the reference C++ processors (dump_ssb) into
tests/vectors/ssb_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

PCIS = [0, 1, 123, 500, 1007]


def main():
    data = {}
    for pci in PCIS:
        out = subprocess.run([str(BUILD / "dump_ssb"), str(pci)],
                             capture_output=True, text=True,
                             check=True).stdout.splitlines()
        rows = {ln.split()[0]: [float.fromhex(x) for x in ln.split()[1:]]
                for ln in out}
        data[f"pci{pci}_pss"] = np.array(rows["PSS"], np.float32).reshape(127, 2)
        data[f"pci{pci}_sss"] = np.array(rows["SSS"], np.float32).reshape(127, 2)
    np.savez_compressed(VEC / "ssb_reference.npz", **data)
    print(f"wrote ssb_reference.npz ({len(PCIS)} cells)")


if __name__ == "__main__":
    sys.exit(main())
