#!/usr/bin/env python3
"""Extract TS 38.211 Tables 6.3.3.2-2/3 (PRACH configuration index tables).

Standardized data kept as C++ arrays in the reference
(reference: lib/ran/prach/prach_configuration.cpp:27-556).  Stored as a JSON
sidecar (variable-length subframe lists) under srsran_projectvtlmo_tpu/data/.
"""

import json
import re
from pathlib import Path

REF = Path("/root/reference/lib/ran/prach/prach_configuration.cpp")
OUT = Path(__file__).resolve().parent.parent / "srsran_projectvtlmo_tpu" / "data" / "prach_config_tables.json"

ENTRY = re.compile(
    r"\{prach_format_type::(\w+),\s*(\w+),\s*(\w+),\s*\{([^}]*)\},\s*(\d+),\s*(\d+),\s*(\d+),\s*(\d+)\}"
    r"|\{(PRACH_CONFIG_RESERVED)\}")

RESERVED = {"format": "invalid", "x": None, "y": None, "subframes": [],
            "starting_symbol": 0, "nof_prach_slots_within_subframe": 0,
            "nof_occasions_within_slot": 0, "duration": 0}


def parse(text: str, fn_name: str) -> list:
    start = text.index(fn_name)
    end = text.index("return", start)
    chunk = text[start:end]
    rows = []
    for m in ENTRY.finditer(chunk):
        if m.group(9):
            rows.append(dict(RESERVED))
            continue
        fmt, x, y, subs, sym, slots, occ, dur = m.groups()[:8]
        rows.append({
            "format": fmt,
            "x": None if "MAX" in x else int(x),
            "y": None if "MAX" in y else int(y),
            "subframes": [int(v) for v in subs.split(",") if v.strip()],
            "starting_symbol": int(sym),
            "nof_prach_slots_within_subframe": int(slots),
            "nof_occasions_within_slot": int(occ),
            "duration": int(dur),
        })
    assert len(rows) == 256, (fn_name, len(rows))
    return rows


def main() -> None:
    text = REF.read_text()
    data = {
        "fr1_paired": parse(text, "prach_configuration_get_fr1_paired"),
        "fr1_unpaired": parse(text, "prach_configuration_get_fr1_unpaired"),
    }
    OUT.write_text(json.dumps(data))
    print(f"wrote {OUT}: {len(data)} tables x 256 entries")


if __name__ == "__main__":
    main()
