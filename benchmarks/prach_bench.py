#!/usr/bin/env python3
"""PRACH detector benchmark (the reference's
tests/benchmarks/phy/upper/channel_processors/prach_detector_benchmark.cpp).

Long (839) and short (139) formats, batched occasions.

  python benchmarks/prach_bench.py [--batch 8] [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.ops import prach

    print(f"backend: {jax.devices()[0]}  batch: {args.batch}")
    rng = np.random.default_rng(0)
    for name, length, table, zcz in (("long B4", prach.LONG, "1.25kHz", 11),
                                     ("short A1", prach.SHORT, "short", 11)):
        cfg = prach.PrachDetectorConfig(
            sequence_length=length, root_sequence_index=1,
            zero_correlation_zone=zcz, ncs_table=table)
        pre = prach.prach_generate(cfg, 17)
        occ = np.broadcast_to(pre, (args.batch, length)).copy()
        occ += (rng.normal(size=occ.shape) + 1j * rng.normal(size=occ.shape)) * 0.05
        occ_pair = jnp.asarray(np.stack([occ.real, occ.imag], -1).astype(np.float32))

        res = prach.prach_detect(occ_pair, cfg)
        assert any(d[0] == 17 for d in res[0]), res[0]
        t0 = time.perf_counter()
        for _ in range(args.reps):
            res = prach.prach_detect(occ_pair, cfg)
        dt = time.perf_counter() - t0
        print(f"prach {name}: {args.batch * args.reps / dt:10.1f} occasions/s "
              f"(incl. host threshold scan)")
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))), "tools"))
            from device_time import profile_device
            from srsran_projectvtlmo_tpu.ops.prach import (
                _detect_jit, threshold_and_margin)
            _, margin, _ = threshold_and_margin(
                1, cfg.preamble.scs_hz, cfg.fmt, zcz, cfg.combine_symbols)
            nfft = 1024 if length == prach.LONG else 256
            inp = occ_pair[:, None, None]
            dev_s, _ = profile_device(
                lambda x: _detect_jit(x, cfg, nfft, margin)[0], inp, reps=3)
            print(f"prach {name}: {args.batch / dev_s:10.1f} occasions/s "
                  f"device-bound (op-profile, batch {args.batch})")
        except Exception as e:
            print("device profile skipped:", e)


if __name__ == "__main__":
    main()
