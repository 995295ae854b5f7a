#!/usr/bin/env python3
"""Golden vectors from the reference C++ channel equalizer (dump_eq) into
tests/vectors/eq_reference.npz.  Inputs are stored as the equalizer sees
them (cbf16-quantized), so both sides consume identical values."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (mmse, nre, nports, nlayers, seed)
#: The reference's envelope: MMSE is single-layer (any port count), ZF
#: covers 1xN SIMO and the 2-layer 2/4-port cases
#: (channel_equalizer_generic_impl.cpp:165-221).
CONFIGS = [
    (1, 64, 1, 1, 0),
    (1, 64, 2, 1, 1),
    (1, 64, 4, 1, 2),
    (0, 64, 1, 1, 3),
    (0, 64, 4, 1, 6),
    (0, 64, 2, 2, 4),
    (0, 64, 4, 2, 5),
]


def main():
    data = {}
    for mmse, nre, p, l, seed in CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_eq"), str(mmse), str(nre), str(p), str(l),
             str(seed)],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {ln.split()[0]: [float.fromhex(x) for x in ln.split()[1:]]
                for ln in out}
        key = f"{'mmse' if mmse else 'zf'}_re{nre}_p{p}_l{l}_s{seed}"
        data[f"{key}_rx"] = np.array(rows["RX"], np.float32).reshape(p, nre, 2)
        data[f"{key}_est"] = np.array(rows["EST"], np.float32).reshape(
            p, l, nre, 2)
        data[f"{key}_nvar"] = np.array(rows["NVAR"], np.float32)
        data[f"{key}_eq"] = np.array(rows["EQ"], np.float32).reshape(
            nre, l, 2)
        data[f"{key}_eqnv"] = np.array(rows["EQNV"], np.float32).reshape(
            nre, l)
    np.savez_compressed(VEC / "eq_reference.npz", **data)
    print(f"wrote eq_reference.npz ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
