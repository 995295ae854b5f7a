#!/usr/bin/env python3
"""Golden vectors from the reference C++ Gold PRG and low-PAPR sequence
generators (dump_seq) into tests/vectors/seq_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (c_init, advance, n) -- c_inits shaped like real DM-RS/scrambling inits.
PRG = [
    (12345, 0, 256),
    (0x7FFFFFFF, 0, 256),
    (1, 1600, 256),
    ((0x4601 << 15) + 17, 0, 512),
    (((1 << 17) * (14 * 3 + 2 + 1) * (2 * 41 + 1) + 2 * 41) % (1 << 31), 100, 256),
]

#: (u, v, alpha_num, alpha_den, len)
PAPR = [
    (0, 0, 0, 12, 12),
    (5, 0, 3, 12, 12),
    (17, 0, 7, 12, 24),
    (29, 0, 11, 12, 36),
    (11, 0, 5, 12, 60),
    (23, 1, 2, 12, 72),
    (8, 1, 9, 12, 144),
]


def main():
    data = {}
    for cinit, adv, n in PRG:
        out = subprocess.run(
            [str(BUILD / "dump_seq"), "prg", str(cinit), str(adv), str(n)],
            capture_output=True, text=True, check=True).stdout.split()
        data[f"prg_{cinit}_{adv}_{n}"] = np.array(out[1:], np.uint8)
    for u, v, an, ad, ln in PAPR:
        out = subprocess.run(
            [str(BUILD / "dump_seq"), "papr", str(u), str(v), str(an),
             str(ad), str(ln)],
            capture_output=True, text=True, check=True).stdout.split()
        vals = np.array([float.fromhex(x) for x in out[1:]], np.float32)
        data[f"papr_{u}_{v}_{an}_{ad}_{ln}"] = vals.reshape(-1, 2)
    np.savez_compressed(VEC / "seq_reference.npz", **data)
    print(f"wrote seq_reference.npz ({len(PRG)} prg + {len(PAPR)} papr)")


if __name__ == "__main__":
    sys.exit(main())
