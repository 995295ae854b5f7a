#!/usr/bin/env python3
"""Generate stored UL-SCH/UCI multiplexing vectors from the reference C++.

Runs tools/ref_crossval/dump_ulsch (build.sh) over a configuration matrix and
stores each field's demultiplexed LLR stream plus the encoded-bit budgets in
tests/vectors/ulsch_demux_reference.npz, so the placement parity tests run
without the reference mount.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from srsran_projectvtlmo_tpu.ran.modulation import Modulation, bits_per_symbol
from srsran_projectvtlmo_tpu.ran.sch import tbs_calculator

DUMP = Path("/tmp/refbuild/dump_ulsch")
OUT = (Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"
       / "ulsch_demux_reference.npz")

MODS = {1: Modulation.PI_2_BPSK, 2: Modulation.QPSK, 4: Modulation.QAM16,
        6: Modulation.QAM64, 8: Modulation.QAM256}

# (nof_prb, dmrs_symbols, qm, layers, code_rate, o_ack, o_csi1, o_csi2)
CONFIGS = [
    (16, (2,), 4, 1, 0.50, 0, 0, 0),
    (16, (2,), 4, 1, 0.50, 1, 0, 0),
    (16, (2,), 4, 1, 0.50, 2, 0, 0),
    (16, (2,), 4, 1, 0.50, 3, 0, 0),
    (16, (2,), 4, 1, 0.50, 11, 0, 0),
    (16, (2,), 4, 1, 0.50, 1, 4, 7),
    (16, (2,), 4, 1, 0.50, 5, 6, 9),
    (16, (2,), 2, 1, 0.30, 2, 3, 0),
    (16, (2,), 1, 1, 0.30, 1, 2, 0),
    (4, (2,), 2, 1, 0.30, 1, 1, 1),
    (52, (2, 7, 11), 6, 1, 0.70, 2, 8, 16),
    (52, (2, 7, 11), 6, 2, 0.70, 4, 11, 0),
    (106, (2, 11), 8, 1, 0.85, 20, 25, 40),
    (273, (2, 11), 8, 2, 0.85, 2, 4, 0),
    (24, (0,), 2, 1, 0.30, 3, 0, 12),
]


def main():
    data = {}
    for i, (prb, dmrs, qm, layers, rate, o_ack, o_csi1, o_csi2) in enumerate(CONFIGS):
        nof_re = min(156, 12 * (14 - len(dmrs))) * prb
        tbs = tbs_calculator(nof_re=nof_re, target_code_rate=rate,
                             modulation_bits=qm, nof_layers=layers)
        mask = ["1" if s in dmrs else "0" for s in range(14)]
        args = [str(DUMP), str(prb), "14", *mask, str(qm), str(layers),
                str(tbs), str(int(rate * 1000)), str(o_ack), str(o_csi1),
                str(o_csi2)]
        out = subprocess.run(args, capture_output=True, text=True, check=True)
        key = f"cfg{i}"
        meta = dict(prb=prb, dmrs=list(dmrs), qm=qm, layers=layers,
                    rate_x1000=int(rate * 1000), tbs=tbs, o_ack=o_ack,
                    o_csi1=o_csi1, o_csi2=o_csi2)
        data[f"{key}_meta"] = np.array(
            [prb, qm, layers, int(rate * 1000), tbs, o_ack, o_csi1, o_csi2],
            np.int64)
        data[f"{key}_dmrs"] = np.array(list(dmrs), np.int64)
        for line in out.stdout.splitlines():
            parts = line.split()
            if parts[0].startswith("G_"):
                data[f"{key}_{parts[0]}"] = np.array([int(parts[1])], np.int64)
            else:
                name, _, _, *vals = parts
                data[f"{key}_{name.lower()}"] = np.array(vals, np.int8)
        print(key, meta)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({len(CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
