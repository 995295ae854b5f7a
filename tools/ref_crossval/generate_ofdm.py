#!/usr/bin/env python3
"""Golden vectors from the reference C++ OFDM slot modulator/demodulator
(dump_ofdm) into tests/vectors/ofdm_reference.npz."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (bw_rb, dft_size, slot_in_subframe, seed, center_freq_hz)
CONFIGS = [
    (24, 512, 0, 0, 0.0),
    (24, 512, 1, 1, 0.0),            # short-CP-only slot
    (52, 1024, 0, 2, 3.5e9),         # Section 5.4 phase compensation
    (106, 2048, 0, 3, 3.5e9),
    (273, 4096, 1, 4, 3.9e9),        # north-star 100 MHz shape
]


def main():
    data = {}
    for bw_rb, dft, slot, seed, fc in CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_ofdm"), str(bw_rb), str(dft), str(slot),
             str(seed), repr(fc)],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {ln.split()[0]: [float.fromhex(x) for x in ln.split()[1:]]
                for ln in out}
        key = f"rb{bw_rb}_dft{dft}_slot{slot}_fc{int(fc / 1e6)}"
        data[f"{key}_grid"] = np.array(rows["GRID"], np.float32).reshape(
            14, bw_rb * 12, 2)
        data[f"{key}_samples"] = np.array(rows["SAMPLES"], np.float32).reshape(-1, 2)
        data[f"{key}_demod"] = np.array(rows["DEMOD"], np.float32).reshape(
            14, bw_rb * 12, 2)
    np.savez_compressed(VEC / "ofdm_reference.npz", **data)
    print(f"wrote ofdm_reference.npz ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
