#!/usr/bin/env python3
"""DFT/OFDM throughput benchmark (the reference's
tests/benchmarks/phy/generic_functions/dft_processor_benchmark.cpp and the
OFDM modulator half of the lower-PHY benchmarks).

Sweeps the NR DFT sizes over batched slot programs; reports transforms/s and
full OFDM mod+demod slot rates.

  python benchmarks/dft_bench.py [--batch 8] [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NR_DFT_SIZES = (128, 256, 384, 512, 768, 1024, 1536, 2048, 3072, 4096)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.devices()[0]}  batch: {args.batch}")
    rng = np.random.default_rng(0)

    @jax.jit
    def fft_pair(x):
        xc = x[..., 0] + 1j * x[..., 1]
        y = jnp.fft.fft(xc, axis=-1)
        return jnp.stack([y.real, y.imag], -1)

    for n in NR_DFT_SIZES:
        x = jnp.asarray(rng.normal(size=(args.batch, 14, n, 2)).astype(np.float32))
        y = jax.block_until_ready(fft_pair(x))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            y = fft_pair(x)
        jax.block_until_ready(y)
        dt = time.perf_counter() - t0
        rate = args.batch * 14 * args.reps / dt
        print(f"dft {n:5d}: {rate:12.0f} transforms/s "
              f"({args.batch * 14 * args.reps * 5 * n * np.log2(n) / dt / 1e9:8.2f} GFLOP/s est)")

    from srsran_projectvtlmo_tpu.ops import ofdm
    for nrb, dft in ((106, 2048), (273, 4096)):
        g = jnp.asarray(rng.normal(size=(args.batch, 14, nrb * 12, 2)).astype(np.float32))
        s = jax.block_until_ready(ofdm.ofdm_modulate(g, dft, 1, 0))
        b = jax.block_until_ready(ofdm.ofdm_demodulate(s, nrb * 12, dft, 1, 0))
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s = ofdm.ofdm_modulate(g, dft, 1, 0)
            b = ofdm.ofdm_demodulate(s, nrb * 12, dft, 1, 0)
        jax.block_until_ready(b)
        rate = args.batch * args.reps / (time.perf_counter() - t0)
        print(f"ofdm mod+demod {nrb} PRB @ {dft}: {rate:10.1f} slots/s")


if __name__ == "__main__":
    main()
