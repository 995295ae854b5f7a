#!/usr/bin/env python3
"""Extract the reference's validated PRACH (threshold, margin) calibration
table into data/prach_thresholds.npz.

This is calibration DATA (433 empirically validated operating points), not
code — same category as the LDPC shift tables and PRACH N_cs tables
(reference: lib/phy/upper/channel_processors/prach_detector_generic_thresholds.h:190-...).
"""
import re
import sys
from pathlib import Path

import numpy as np

SRC = Path("/root/reference/lib/phy/upper/channel_processors/prach_detector_generic_thresholds.h")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "prach_thresholds.npz"

ROW = re.compile(
    r"\{\{\s*/\* nof_rx_ports \*/\s*(\d+),\s*prach_subcarrier_spacing::(\w+),"
    r"\s*prach_format_type::(\w+),\s*/\* ZCZ \*/\s*(\d+),\s*/\* combine symbols \*/"
    r"\s*(true|false)\},\s*\{([0-9.]+)F,\s*(\d+)\},\s*th_flag::(\w+)\}"
)

SCS = {"kHz15": 0, "kHz30": 1, "kHz60": 2, "kHz120": 3, "kHz1_25": 4, "kHz5": 5}
FMT = {"zero": 0, "one": 1, "two": 2, "three": 3, "A1": 4, "A2": 5, "A3": 6,
       "B1": 7, "B4": 8, "C0": 9, "C2": 10, "A1_B1": 11, "A2_B2": 12, "A3_B3": 13}
FLAG = {"red": 0, "orange": 1, "green": 2}


def main():
    text = SRC.read_text()
    rows = ROW.findall(text)
    if len(rows) < 400:
        sys.exit(f"parse failure: only {len(rows)} rows matched")
    ports, scs, fmt, zcz, comb, thr, margin, flag = [], [], [], [], [], [], [], []
    for r in rows:
        ports.append(int(r[0]))
        scs.append(SCS[r[1]])
        fmt.append(FMT[r[2]])
        zcz.append(int(r[3]))
        comb.append(r[4] == "true")
        thr.append(float(r[5]))
        margin.append(int(r[6]))
        flag.append(FLAG[r[7]])
    np.savez_compressed(
        OUT,
        nof_rx_ports=np.asarray(ports, np.int16),
        scs=np.asarray(scs, np.int8),
        format=np.asarray(fmt, np.int8),
        zcz=np.asarray(zcz, np.int8),
        combine=np.asarray(comb, bool),
        threshold=np.asarray(thr, np.float32),
        margin=np.asarray(margin, np.int16),
        flag=np.asarray(flag, np.int8),
    )
    print(f"wrote {OUT} with {len(rows)} entries")


if __name__ == "__main__":
    main()
