#!/usr/bin/env python3
"""Device-time measurement via the jax profiler (wall clock through the axon
tunnel carries a ~25 ms fixed round trip; op_profile rawTime is the truth).

Usage: import and call `device_time(fn, *args, reps=3)` -> seconds per call
of non-idle device time, plus the top-op breakdown.
"""
import glob
import json
import os
import shutil
import tempfile

import numpy as np


def profile_device(fn, *args, reps: int = 3, top: int = 12):
    """Run fn(*args) reps times under the profiler; return
    (non_idle_seconds_per_rep, [(fraction, name), ...])."""
    import jax

    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # true warmup
    tmp = tempfile.mkdtemp(prefix="jaxprof")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(reps):
                out = fn(*args)
                np.asarray(jax.tree_util.tree_leaves(out)[0])
        f = glob.glob(os.path.join(tmp, "plugins/profile/*/*.xplane.pb"))
        from xprof.convert import raw_to_tool_data as rtd

        data, _ = rtd.xspace_to_tool_data(f, "op_profile", {})
        d = json.loads(data)
        root = d["byProgramExcludeIdle"]
        total = root["metrics"]["rawTime"]
        flat = []

        def walk(node, depth):
            m = node.get("metrics") or {}
            if depth >= 2:  # skip the by_program/root wrappers
                flat.append((m.get("rawTime", 0), node.get("name", "?")))
            for ch in (node.get("children") or []):
                walk(ch, depth + 1)

        walk(root, 0)
        flat.sort(reverse=True)
        tops = [(t / total, name) for t, name in flat[:top] if t > 0]
        return total * 1e-12 / reps, tops
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
    import jax.numpy as jnp
    from srsran_projectvtlmo_tpu.models.pusch_rx import (
        PuschRxConfig, build_pusch_rx_from_grid)
    from srsran_projectvtlmo_tpu.ran.modulation import Modulation

    b = int(os.environ.get("B", "8"))
    cfg = PuschRxConfig(nof_rb=273, modulation=Modulation.QAM256,
                        target_code_rate=948.0 / 1024.0,
                        nof_rx_ports=4, nof_layers=2, dft_size=4096,
                        numerology=1, use_pallas_decoder=True,
                        ldpc_early_stop=True,
                        nof_ldpc_iterations=int(os.environ.get("ITERS", "6")))
    rx = build_pusch_rx_from_grid(cfg)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.normal(size=(b, 4, 14, cfg.nof_subc, 2)).astype(np.float32))
    secs, tops = profile_device(lambda x: rx(x)["tb_crc_ok"], g)
    print(f"device time: {secs*1e3:.2f} ms per launch ({b} slots) -> "
          f"{b/secs:.0f} slots/s device-bound")
    for frac, name in tops:
        print(f"  {100*frac:6.2f}% {name[:90]}")
