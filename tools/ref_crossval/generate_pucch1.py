#!/usr/bin/env python3
"""Golden PUCCH format-1 detection vectors from the reference C++ detector
(dump_pucch1) into tests/vectors/pucch1_reference.npz.

The Tx waveform is built with this repo's format-1 tables (base sequence +
per-symbol cyclic-shift hopping + time-domain OCC); the reference detector
receiving it with the true channel estimate must detect the SAME bits the
framework's detector recovers -- if the sequence conventions disagreed, the
reference would simply fail to detect the transmission at 20 dB."""
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from srsran_projectvtlmo_tpu.phy import pucch as pucch_mod

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (n_id, slot, l0, nsym, m0, occ, bits, nports, snr_db, seed); bits=None -> noise only
CONFIGS = [
    (30, 1, 0, 14, 3, 0, (0,), 1, 20.0, 0),
    (30, 1, 0, 14, 3, 0, (1, 0), 2, 20.0, 1),
    (7, 4, 0, 14, 4, 1, (1, 1), 4, 20.0, 2),
    (501, 0, 4, 8, 0, 2, (0, 1), 4, 20.0, 3),
    (88, 2, 0, 14, 2, 0, None, 4, 0.0, 4),   # noise only -> DTX
]


def main():
    data = {}
    for cfg_t in CONFIGS:
        n_id, slot, l0, nsym, m0, occ, bits, nports, snr_db, seed = cfg_t
        cfg = pucch_mod.PucchFormat1Config(
            n_id=n_id, slot=slot, start_symbol=l0, nof_symbols=nsym,
            initial_cyclic_shift=m0, time_domain_occ=occ,
            nof_harq_bits=len(bits) if bits else 1)
        seqs, (w_data,), (w_dmrs,) = pucch_mod._f1_tables(cfg)
        rng = np.random.default_rng(seed)
        h = (rng.normal(size=nports) + 1j * rng.normal(size=nports)) / np.sqrt(2)
        amp = 10 ** (snr_db / 20.0)
        grid = np.zeros((nports, nsym, 12), np.complex64)
        if bits is not None:
            if len(bits) == 1:
                d = (1 - 2 * bits[0]) / np.sqrt(2) * (1 + 1j)
            else:
                d = ((1 - 2 * bits[0]) + 1j * (1 - 2 * bits[1])) / np.sqrt(2)
            i_d = i_p = 0
            for s in range(nsym):
                if s % 2 == 0:
                    grid[:, s] = amp * h[:, None] * w_dmrs[i_p] * seqs[s][None]
                    i_p += 1
                else:
                    grid[:, s] = amp * h[:, None] * d * w_data[i_d] * seqs[s][None]
                    i_d += 1
        grid += (rng.normal(size=grid.shape)
                 + 1j * rng.normal(size=grid.shape)) / np.sqrt(2)

        lines = [f"{n_id} {slot} {l0} {nsym} {m0} {occ}"
                 f" {len(bits) if bits else 1} {nports}"]
        for p in range(nports):
            hp = amp * h[p]
            lines.append(f"{float(hp.real).hex()} {float(hp.imag).hex()}"
                         f" {float(1.0).hex()}")
        for p in range(nports):
            for s in range(nsym):
                lines.append(" ".join(
                    f"{float(grid[p, s, k].real).hex()}"
                    f" {float(grid[p, s, k].imag).hex()}" for k in range(12)))
        out = subprocess.run([str(BUILD / "dump_pucch1")],
                             input="\n".join(lines) + "\n",
                             capture_output=True, text=True, check=True)
        rows = {ln.split()[0]: ln.split()[1:] for ln in out.stdout.splitlines()}
        key = (f"c{n_id}_{slot}_{l0}_{nsym}_{m0}_{occ}"
               f"_{len(bits) if bits else 1}_{nports}_{seed}")
        pair = np.stack([grid.real, grid.imag], -1).astype(np.float32)
        data[f"{key}_rx"] = pair
        data[f"{key}_bits"] = np.array([int(v) for v in rows.get("BITS", [])],
                                       np.uint8)
        data[f"{key}_status"] = np.array([int(rows["STATUS"][0])], np.uint8)
    np.savez_compressed(VEC / "pucch1_reference.npz", **data)
    print(f"wrote pucch1_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
