#!/usr/bin/env python3
"""Benchmark driver: prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Progressive attempts under subprocess watchdogs (the target runtime's remote
compiler is unreliable for some large programs: a wedged compile blocks the
single-client device until the process dies, so every attempt runs in a child
with a hard timeout):

  1. Full PUSCH Rx slot pipeline (OFDM demod -> DM-RS estimate -> MMSE -> demap
     -> descramble -> rate recovery -> layered min-sum LDPC decode -> CRC) at
     BENCH_NRB PRBs, QAM256 R=0.92 -- the north-star-shaped workload.
  2. The same at 24 PRBs.
  3. LDPC decoder-only throughput (Pallas kernel).
  4. OFDM modulate/demodulate slot rate.

vs_baseline: slot metrics against the reference's implied real-time bound of
2000 slots/s/cell (BASELINE.md); LDPC Mbps against the 622 Mbps sustained
decode rate that bound implies at 273-PRB QAM256 (TBS 311368 x 2000/s).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def child_pusch(nrb: int, batch: int, iters: int, pallas: bool):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.models import build_pusch_rx_slot, build_ulsch_tx_slot
    from srsran_projectvtlmo_tpu.models.pusch_rx import PuschRxConfig
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation
    from srsran_projectvtlmo_tpu.utils.xfer import to_host

    cfg = PuschRxConfig(nof_rb=nrb, modulation=Modulation.QAM256, target_code_rate=0.92,
                        nof_rx_ports=1, dft_size=4096, numerology=1,
                        use_pallas_decoder=pallas)
    tx = build_ulsch_tx_slot(cfg)
    rx = build_pusch_rx_slot(cfg)
    rng = np.random.default_rng(0)
    tb = rng.integers(0, 2, (batch, cfg.tbs)).astype(np.uint8)
    _, samples = tx(jnp.asarray(tb))
    samples = jax.block_until_ready(samples)[:, None]
    out = rx(samples)
    jax.block_until_ready(out["tb_crc_ok"])
    ok = to_host(out["tb_crc_ok"])
    assert ok.all(), f"benchmark slot failed decode: {ok}"
    t0 = time.perf_counter()
    for _ in range(iters):
        out = rx(samples)
    jax.block_until_ready(out["tb_crc_ok"])
    rate = batch * iters / (time.perf_counter() - t0)
    return {"metric": f"pusch_rx_slot_rate_{nrb}prb_qam256",
            "value": round(rate, 2), "unit": "slots/s",
            "vs_baseline": round(rate / 2000.0, 4)}


def child_ldpc(z: int, batch: int, iters_ldpc: int, reps: int):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph
    from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
    from srsran_projectvtlmo_tpu.ops.ldpc.decode_pallas_v2 import ldpc_decode_pallas_v2

    rng = np.random.default_rng(0)
    info = rng.integers(0, 2, (batch, 22 * z)).astype(np.uint8)
    cw = jax.block_until_ready(ldpc_encode(jnp.asarray(info), BaseGraph.BG1, z))
    llr = jnp.asarray(((1 - 2 * np.asarray(cw)[:, 2 * z:].astype(np.int32)) * 8).astype(np.int8))
    hard, _ = ldpc_decode_pallas_v2(llr, BaseGraph.BG1, z, iters_ldpc)
    jax.block_until_ready(hard)
    assert (np.asarray(hard) == info).all()
    t0 = time.perf_counter()
    for _ in range(reps):
        hard, _ = ldpc_decode_pallas_v2(llr, BaseGraph.BG1, z, iters_ldpc)
    jax.block_until_ready(hard)
    mbps = batch * reps * 22 * z / (time.perf_counter() - t0) / 1e6
    return {"metric": f"ldpc_decode_bg1_z{z}_{iters_ldpc}it",
            "value": round(mbps, 1), "unit": "Mbps",
            "vs_baseline": round(mbps / 622.0, 4)}


def child_ofdm(batch: int, reps: int):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.ops import ofdm

    rng = np.random.default_rng(0)
    grid = rng.normal(size=(batch, 14, 273 * 12, 2)).astype(np.float32)
    g = jnp.asarray(grid)
    s = jax.block_until_ready(ofdm.ofdm_modulate(g, 4096, 1, 0))
    back = jax.block_until_ready(ofdm.ofdm_demodulate(s, 273 * 12, 4096, 1, 0))
    t0 = time.perf_counter()
    for _ in range(reps):
        s = ofdm.ofdm_modulate(g, 4096, 1, 0)
        back = ofdm.ofdm_demodulate(s, 273 * 12, 4096, 1, 0)
    jax.block_until_ready(back)
    rate = batch * reps / (time.perf_counter() - t0)
    return {"metric": "ofdm_mod_demod_slot_rate_273prb",
            "value": round(rate, 1), "unit": "slots/s",
            "vs_baseline": round(rate / 2000.0, 4)}


def run_child(spec: dict, budget_s: int):
    env = dict(os.environ)
    env["BENCH_CHILD_SPEC"] = json.dumps(spec)
    try:
        proc = subprocess.run([sys.executable, "-u", os.path.abspath(__file__)],
                              capture_output=True, text=True, timeout=budget_s, env=env)
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode != 0:
        return None
    for line in reversed(proc.stdout.strip().splitlines()):
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return None


def main() -> None:
    spec_env = os.environ.get("BENCH_CHILD_SPEC")
    if spec_env:
        spec = json.loads(spec_env)
        kind = spec.pop("kind")
        result = {"pusch": child_pusch, "ldpc": child_ldpc, "ofdm": child_ofdm}[kind](**spec)
        print(json.dumps(result))
        return

    nrb = int(os.environ.get("BENCH_NRB", "273"))
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    # (spec, per-try budget seconds, tries): the remote compiler is erratic --
    # the same program can compile in seconds or wedge; a fresh process retry
    # usually resolves it. Slots batch per launch (multi-cell aggregation):
    # per-launch dispatch latency through the tunnel dominates small batches,
    # so the aggregate rate climbs with batch (measured 535/815/981 slots/s at
    # batch 4/8/16).
    attempts = [
        ({"kind": "pusch", "nrb": nrb, "batch": batch, "iters": iters, "pallas": True}, 700, 2),
        ({"kind": "pusch", "nrb": nrb, "batch": 4, "iters": iters, "pallas": True}, 600, 2),
        ({"kind": "pusch", "nrb": 24, "batch": batch, "iters": iters, "pallas": True}, 500, 2),
        ({"kind": "ldpc", "z": 256, "batch": 32, "iters_ldpc": 6, "reps": 10}, 400, 2),
        ({"kind": "ofdm", "batch": 4, "reps": 10}, 300, 2),
    ]
    for spec, budget, tries in attempts:
        for _ in range(tries):
            result = run_child(dict(spec), budget)
            if result is not None:
                print(json.dumps(result))
                return
    print(json.dumps({"metric": "bench_failed", "value": 0, "unit": "n/a",
                      "vs_baseline": 0}))


if __name__ == "__main__":
    main()
