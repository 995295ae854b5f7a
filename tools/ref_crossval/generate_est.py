#!/usr/bin/env python3
"""Golden vectors from the reference C++ channel estimator (dump_est) into
tests/vectors/est_reference.npz.  Inputs are printed by the dumper exactly as
the estimator consumes them; the Python side replays the identical pilots/RX
through ops.channel_estimate.estimate_channel_hop."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (nof_rb, rb_start, noise_milli, cfo_hz, seed, dmrs_syms)
CONFIGS = [
    (24, 4, 50, 200.0, 0, (2, 7, 11)),
    (24, 0, 50, 0.0, 1, (2, 7, 11)),
    (52, 0, 20, 500.0, 2, (2, 11)),
    (4, 2, 100, -300.0, 3, (2, 7, 11)),
    (24, 4, 5, 100.0, 4, (2,)),       # single DM-RS symbol: no CFO
    (1, 0, 50, 0.0, 5, (2, 7)),       # 1-RB band: all-pilot virtual pilots
]


def main():
    data = {}
    for nof_rb, rb_start, noise, cfo, seed, syms in CONFIGS:
        args = [str(BUILD / "dump_est"), str(nof_rb), str(rb_start),
                str(noise), str(cfo), str(seed), str(len(syms))]
        args += [str(s) for s in syms]
        out = subprocess.run(args, capture_output=True, text=True,
                             check=True).stdout.splitlines()
        rows = {}
        for ln in out:
            parts = ln.split()
            rows[parts[0]] = parts[1:]
        npil = nof_rb * 6
        ndmrs = len(syms)
        key = f"rb{nof_rb}_s{rb_start}_n{noise}_c{int(cfo)}_seed{seed}"
        hexf = lambda vals: np.array([float.fromhex(v) for v in vals],
                                     np.float32)
        data[f"{key}_pilots"] = hexf(rows["PILOTS"]).reshape(ndmrs, npil, 2)
        data[f"{key}_rx"] = hexf(rows["RX"]).reshape(ndmrs, npil, 2)
        data[f"{key}_epochs"] = np.array([float(v) for v in rows["EPOCHS"]],
                                         np.float64)
        data[f"{key}_ce0"] = hexf(rows[f"CE0"]).reshape(nof_rb * 12, 2)
        data[f"{key}_ce_dmrs"] = hexf(rows[f"CE{syms[0]}"]).reshape(
            nof_rb * 12, 2)
        data[f"{key}_stats"] = hexf(rows["STATS"])  # nv, rsrp, epre, snr, ta, cfo
        data[f"{key}_meta"] = np.array(
            [nof_rb, rb_start, ndmrs] + list(syms), np.int64)
    np.savez_compressed(VEC / "est_reference.npz", **data)
    print(f"wrote est_reference.npz ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
