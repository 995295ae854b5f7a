#!/usr/bin/env python3
"""Benchmark driver: PUSCH receive slot rate on the north-star-shaped workload.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: full PUSCH Rx slot pipeline (OFDM demod -> DM-RS channel estimation
-> MMSE -> soft demap -> descramble -> rate recovery -> 6-iteration layered
min-sum LDPC decode -> CRC), 100 MHz-class 273-PRB 256QAM single layer.
vs_baseline is measured slots/s against the reference's implied real-time bound
of 2000 slots/s/cell for the 100 MHz TDD cell (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
# Persist compiled programs across runs (first remote compile is slow).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.models import PuschRxConfig, build_pusch_rx_slot, build_ulsch_tx_slot
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation

    batch = int(os.environ.get("BENCH_BATCH", "4"))
    nrb = int(os.environ.get("BENCH_NRB", "273"))
    cfg = PuschRxConfig(
        nof_rb=nrb,
        modulation=Modulation.QAM256,
        target_code_rate=0.92,
        nof_rx_ports=int(os.environ.get("BENCH_PORTS", "1")),
        dft_size=4096,
        numerology=1,
        use_pallas_decoder=os.environ.get("BENCH_PALLAS", "1") == "1",
    )
    tx = build_ulsch_tx_slot(cfg)
    rx = build_pusch_rx_slot(cfg)

    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (batch, cfg.tbs)).astype(np.uint8)
    grid_pair, samples = tx(jnp.asarray(tb))
    samples = jax.block_until_ready(samples)[:, None]  # add the (single) rx-port axis

    out = rx(samples)  # compile
    jax.block_until_ready(out["tb_crc_ok"])
    from srsran_projectvtlmo_tpu.utils.xfer import to_host

    ok = to_host(out["tb_crc_ok"])
    assert ok.all(), f"benchmark slot failed decode: {ok}"

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rx(samples)
    jax.block_until_ready(out["tb_crc_ok"])
    dt = time.perf_counter() - t0

    slots_per_s = batch * iters / dt
    print(json.dumps({
        "metric": "pusch_rx_slot_rate_273prb_qam256",
        "value": round(slots_per_s, 2),
        "unit": "slots/s",
        "vs_baseline": round(slots_per_s / 2000.0, 4),
    }))


if __name__ == "__main__":
    main()
