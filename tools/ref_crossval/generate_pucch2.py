#!/usr/bin/env python3
"""Golden PUCCH format-2 vectors from the reference C++ demodulator +
short-block ML detector (dump_pucch2) into tests/vectors/pucch2_reference.npz.

The Tx waveform (QPSK UCI codeword + DM-RS) is built with this repo's F2
conventions; the reference demodulating and decoding the SAME message is an
interop proof of the data scrambling c_init, QPSK mapping and RE layout."""
import subprocess
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))
from srsran_projectvtlmo_tpu.phy import pucch as pucch_mod
from srsran_projectvtlmo_tpu.ops import prg as prg_mod
from srsran_projectvtlmo_tpu.ops import uci as uci_mod

BUILD = Path("/tmp/refbuild")
VEC = Path(__file__).resolve().parent.parent.parent / "tests" / "vectors"

#: (nof_prb, nsym, l0, rnti, n_id, n_id0, k, nports, snr_db, seed)
CONFIGS = [
    (1, 1, 13, 0x1234, 9, 11, 4, 1, 20.0, 0),
    (2, 2, 12, 0x4601, 17, 3, 7, 2, 20.0, 1),
    (4, 2, 12, 0x777, 500, 41, 11, 4, 20.0, 2),
]


def main():
    data = {}
    for nof_prb, nsym, l0, rnti, n_id, n_id0, k, nports, snr_db, seed in CONFIGS:
        cfg = pucch_mod.PucchFormat2Config(
            n_id=n_id, n_id0=n_id0, rnti=rnti, slot=2, start_symbol=l0,
            nof_symbols=nsym, nof_prb=nof_prb, nof_uci_bits=k)
        rng = np.random.default_rng(seed)
        msg = rng.integers(0, 2, k).astype(np.uint8)
        e = 16 * nof_prb * nsym
        coded = uci_mod.uci_encode(msg, e, bits_per_symbol=2)
        cinit = ((rnti << 15) + n_id) & 0x7FFFFFFF
        scr = coded ^ prg_mod.gold_sequence_bits(cinit, e)
        sym = ((1 - 2 * scr[0::2].astype(np.float64))
               + 1j * (1 - 2 * scr[1::2].astype(np.float64)))
        sym = (sym / np.sqrt(2)).astype(np.complex64).reshape(nsym, 8 * nof_prb)
        tx = np.zeros((nsym, 12 * nof_prb), np.complex64)
        tx[:, pucch_mod._f2_data_subc(nof_prb)] = sym
        tx[:, pucch_mod._f2_dmrs_subc(nof_prb)] = pucch_mod._f2_dmrs_ref(cfg)
        amp = 10 ** (snr_db / 20.0)
        h = (rng.normal(size=nports) + 1j * rng.normal(size=nports)) / np.sqrt(2)
        rx = amp * h[:, None, None] * tx[None]
        rx = rx + (rng.normal(size=rx.shape)
                   + 1j * rng.normal(size=rx.shape)).astype(np.complex64) / np.sqrt(2)
        rx = rx.astype(np.complex64)

        lines = [f"{nof_prb} {nsym} {l0} {rnti} {n_id} {k} {nports}"]
        for p in range(nports):
            hp = amp * h[p]
            lines.append(f"{float(hp.real).hex()} {float(hp.imag).hex()}"
                         f" {float(1.0).hex()}")
        for p in range(nports):
            for s in range(nsym):
                lines.append(" ".join(
                    f"{float(rx[p, s, kk].real).hex()}"
                    f" {float(rx[p, s, kk].imag).hex()}"
                    for kk in range(12 * nof_prb)))
        out = subprocess.run([str(BUILD / "dump_pucch2")],
                             input="\n".join(lines) + "\n",
                             capture_output=True, text=True, check=True)
        rows = {ln.split()[0]: ln.split()[1:] for ln in out.stdout.splitlines()}
        key = f"c{nof_prb}_{nsym}_{l0}_{rnti}_{n_id}_{n_id0}_{k}_{nports}_{seed}"
        pair = np.stack([rx.real, rx.imag], -1).astype(np.float32)
        data[f"{key}_rx"] = pair
        data[f"{key}_msg"] = msg
        data[f"{key}_bits"] = np.array([int(v) for v in rows.get("BITS", [])],
                                       np.uint8)
        data[f"{key}_valid"] = np.array([int(rows["VALID"][0])], np.uint8)
    np.savez_compressed(VEC / "pucch2_reference.npz", **data)
    print(f"wrote pucch2_reference.npz ({len(CONFIGS)} cases)")


if __name__ == "__main__":
    sys.exit(main())
