#!/usr/bin/env python3
"""LDPC encoder/decoder throughput benchmark (the reference's
tests/benchmarks/phy/upper/channel_coding/ldpc/*_benchmark.cpp equivalent).

Sweeps base graphs and lifting sizes, measures Mbps on the current backend,
and asserts exact payload recovery at every size (the all-size correctness
sweep on hardware).  NOTE: on the tunneled dev chip the wall-clock Mbps are
dispatch-bound (a ~1 ms kernel behind a ~25 ms RTT); use
tools/device_time.py op-profiles (bench.py ldpc lines) for device-bound
throughput.

  python benchmarks/ldpc_bench.py [--decoder xla|pallas] [--batch 32] [--iters 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", default="es_bm",
                choices=["xla", "pallas", "es_bm"])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--zs", default="40,64,104,128,176,208,256,352,384",
                help="lifting sizes; 'all' sweeps all 51 (reference benchmark shape)")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph
    from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
    from srsran_projectvtlmo_tpu.ops.ldpc.decode import ldpc_decode
    from srsran_projectvtlmo_tpu.ops.ldpc.decode_pallas import ldpc_decode_pallas

    print(f"backend: {jax.devices()[0]}  decoder: {args.decoder}  batch: {args.batch}")
    rng = np.random.default_rng(0)
    for bg in (BaseGraph.BG1, BaseGraph.BG2):
        kb = 22 if bg == BaseGraph.BG1 else 10
        if args.zs == "all":
            from srsran_projectvtlmo_tpu.ran.ldpc_params import ALL_LIFTING_SIZES
            zs = list(ALL_LIFTING_SIZES)
        else:
            zs = [int(v) for v in args.zs.split(",")]
        for z in zs:
            k = kb * z
            info = rng.integers(0, 2, (args.batch, k)).astype(np.uint8)
            info_d = jnp.asarray(info)
            cw = ldpc_encode(info_d, bg, z)
            jax.block_until_ready(cw)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                cw = ldpc_encode(info_d, bg, z)
            jax.block_until_ready(cw)
            enc_mbps = args.batch * args.reps * k / (time.perf_counter() - t0) / 1e6

            llr = jnp.asarray(
                ((1 - 2 * np.asarray(cw)[:, 2 * z:].astype(np.int32)) * 8).astype(np.int8))
            if args.decoder == "pallas":
                dec = lambda: ldpc_decode_pallas(llr, bg, z, args.iters)[:2]
            elif args.decoder == "es_bm":
                # The production early-stop kernel (packed-lane for
                # z % 128 != 0); random payload CRCs never pass, so the
                # measured path is the full iteration count.
                from srsran_projectvtlmo_tpu.ops.ldpc.decode_pallas import (
                    ldpc_decode_pallas_es_bm)

                dec = lambda: ldpc_decode_pallas_es_bm(
                    llr, bg, z, "CRC24B", k, args.iters)[:2]
            else:
                dec = lambda: ldpc_decode(llr, bg, z, nof_iterations=args.iters)
            hard, _ = dec()
            jax.block_until_ready(hard)
            assert (np.asarray(hard) == info).all(), f"decode failed bg={bg} z={z}"
            t0 = time.perf_counter()
            for _ in range(args.reps):
                hard, _ = dec()
            jax.block_until_ready(hard)
            dec_mbps = args.batch * args.reps * k / (time.perf_counter() - t0) / 1e6
            print(f"{bg.name} z={z:4d} K={k:5d}: encode {enc_mbps:8.1f} Mbps   "
                  f"decode({args.iters}it) {dec_mbps:8.1f} Mbps")


if __name__ == "__main__":
    main()
