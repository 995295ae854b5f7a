#!/usr/bin/env python3
"""Generate stored golden vectors from the reference C++ polar chain and
interval-table demapper (dump_polar / dump_demap, built by build.sh), stored
in tests/vectors/{polar,demap}_reference.npz so the parity tests run without
the reference mount."""
import subprocess
import sys
from pathlib import Path

import numpy as np

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (K incl CRC, E, nMax, ibil, seed, flip_pct) — DCI-like (nMax 9) and
#: UCI-like (nMax 10) shapes; puncturing (E < N), shortening and repetition
#: (E > N) cases; clean and noisy LLRs.
POLAR_CONFIGS = [
    (36, 100, 9, 1, 0, 0),
    (39, 216, 9, 1, 1, 0),     # aggregation level 2 DCI shape
    (44, 432, 9, 1, 2, 6),
    (18, 48, 10, 1, 3, 0),
    (20, 240, 10, 1, 4, 8),
    (100, 300, 10, 1, 5, 0),
    (164, 500, 10, 1, 6, 4),
    (56, 864, 9, 1, 7, 0),     # E > N repetition
]

DEMAP_CONFIGS = [(qm, 256, seed) for qm in (2, 4, 6, 8) for seed in (0, 1)]


def main():
    data = {}
    for k, e, nmax, ibil, seed, flip in POLAR_CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_polar"), str(k), str(e), str(nmax), str(ibil),
             str(seed), str(flip)],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {l.split()[0]: np.array(l.split()[1:], dtype=np.int32)
                for l in out}
        if flip == 0:
            assert (rows["MSG"] == rows["DEC"]).all(), (k, e, nmax)
        key = f"k{k}_e{e}_n{nmax}_ibil{ibil}_s{seed}_f{flip}"
        data[f"{key}_msg"] = rows["MSG"].astype(np.uint8)
        data[f"{key}_alloc"] = rows["ALLOC"].astype(np.uint8)
        data[f"{key}_enc"] = rows["ENC"].astype(np.uint8)
        data[f"{key}_rm"] = rows["RM"].astype(np.uint8)
        data[f"{key}_llr"] = rows["LLR"].astype(np.int8)
        data[f"{key}_dematch"] = rows["DEMATCH"].astype(np.int8)
        data[f"{key}_dec"] = rows["DEC"].astype(np.uint8)
    np.savez_compressed(VEC / "polar_reference.npz", **data)
    print(f"wrote polar_reference.npz ({len(POLAR_CONFIGS)} configs)")

    data = {}
    for qm, n, seed in DEMAP_CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_demap"), str(qm), str(n), str(seed)],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {l.split()[0]: l.split()[1:] for l in out}
        key = f"qm{qm}_n{n}_s{seed}"
        re = np.array([float.fromhex(x) for x in rows["RE"]], np.float32)
        data[f"{key}_sym"] = re.reshape(n, 2)
        data[f"{key}_nvar"] = np.array(
            [float.fromhex(x) for x in rows["NVAR"]], np.float32)
        data[f"{key}_llr"] = np.array(rows["LLR"], np.int32).astype(np.int8)
    np.savez_compressed(VEC / "demap_reference.npz", **data)
    print(f"wrote demap_reference.npz ({len(DEMAP_CONFIGS)} configs)")
    generate_mod()





MOD_CONFIGS = [(qm, 960, seed) for qm in (1, 2, 4, 6, 8) for seed in (0,)]


def generate_mod():
    data = {}
    for qm, n, seed in MOD_CONFIGS:
        out = subprocess.run(
            [str(BUILD / "dump_mod"), str(qm), str(n), str(seed)],
            capture_output=True, text=True, check=True).stdout.splitlines()
        rows = {l.split()[0]: l.split()[1:] for l in out}
        key = f"qm{qm}_n{n}_s{seed}"
        data[f"{key}_bits"] = np.array(rows["BITS"], np.uint8)
        sym = np.array([float.fromhex(x) for x in rows["SYM"]], np.float32)
        data[f"{key}_sym"] = sym.reshape(-1, 2)
    np.savez_compressed(VEC / "mod_reference.npz", **data)
    print(f"wrote mod_reference.npz ({len(MOD_CONFIGS)} configs)")


if __name__ == "__main__":
    sys.exit(main())
