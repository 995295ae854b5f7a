#!/usr/bin/env python3
"""Equalizer / channel-estimator / demapper / precoder micro-benchmarks
(the reference's tests/benchmarks/phy/upper/{equalization,signal_processors}
channel_equalizer_benchmark.cpp, dmrs_pusch_estimator, precoder benchmarks).

  python benchmarks/frontend_bench.py [--batch 8] [--nrb 273]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(name, fn, *args, reps=20, items=1):
    import jax

    out = jax.block_until_ready(jax.tree.leaves(fn(*args))[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = time.perf_counter() - t0
    print(f"{name:40s} {items * reps / dt:14.0f} items/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--nrb", type=int, default=273)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.ops.equalization import (
        equalize_mmse_1xn, equalize_mmse_general)
    from srsran_projectvtlmo_tpu.ops.demodulation import soft_demap
    from srsran_projectvtlmo_tpu.ops.channel_estimate import estimate_channel_hop
    from srsran_projectvtlmo_tpu.ops.dmrs import dmrs_type1_sequence
    from srsran_projectvtlmo_tpu.ops.precoding import precode
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation

    print(f"backend: {jax.devices()[0]}  batch: {args.batch}  nrb: {args.nrb}")
    rng = np.random.default_rng(0)
    nre = args.nrb * 12 * 12
    b = args.batch

    y = jnp.asarray(rng.normal(size=(b, nre, 2, 2)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(b, nre, 2, 2)).astype(np.float32))
    nvar = jnp.full((b, 2), 0.1, jnp.float32)
    f1 = jax.jit(lambda y, h, n: equalize_mmse_1xn(y, h, n))
    bench("mmse 1x2 equalize", f1, y, h, nvar, items=b * nre)

    h2 = jnp.asarray(rng.normal(size=(b, nre, 2, 2, 2)).astype(np.float32))
    f2 = jax.jit(lambda y, h, n: equalize_mmse_general(y, h, n))
    bench("mmse 2x2 general equalize", f2, y, h2, nvar, items=b * nre)

    eq = jnp.asarray(rng.normal(size=(b, nre, 2)).astype(np.float32))
    ev = jnp.full((b, nre), 0.1, jnp.float32)
    fd = jax.jit(lambda e, v: soft_demap(e, v, Modulation.QAM256))
    bench("qam256 soft demap", fd, eq, ev, items=b * nre)

    npil = 6 * args.nrb
    ref = dmrs_type1_sequence(0, 2, 1, args.nrb)
    ref_pair = jnp.asarray(np.stack([ref.real, ref.imag], -1).astype(np.float32))
    pil = jnp.asarray(rng.normal(size=(b, 1, npil, 2)).astype(np.float32))
    fe = jax.jit(lambda g: estimate_channel_hop(g, ref_pair, args.nrb, 2))
    bench("dmrs channel estimate (1 hop)", fe, pil, items=b)

    layers = jnp.asarray(rng.normal(size=(b, 2, nre, 2)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 2, 2)).astype(np.float32))
    fp = jax.jit(lambda x, w: precode(x, w))
    bench("precode 2 layers -> 4 ports", fp, layers, w, items=b * nre)


if __name__ == "__main__":
    main()
