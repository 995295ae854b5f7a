#!/usr/bin/env python3
"""Hardware parity harness: compiled Pallas LDPC decoders vs the XLA
program across lifting sizes.  Caught the Mosaic lane-rotation corruption
for z not a multiple of 128 (the wrappers now fall back to XLA there)."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srsran_projectvtlmo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax.numpy as jnp
from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph
from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
from srsran_projectvtlmo_tpu.ops.ldpc.decode import ldpc_decode, ldpc_decode_es
from srsran_projectvtlmo_tpu.ops.ldpc.decode_pallas import (
    ldpc_decode_pallas, ldpc_decode_pallas_es)
rng = np.random.default_rng(1)
for z in (40, 64, 96, 104, 128, 208, 256, 384):
    info = rng.integers(0, 2, (16, 22*z)).astype(np.uint8)
    cw = np.asarray(ldpc_encode(jnp.asarray(info), BaseGraph.BG1, z))
    base = ((1-2*cw[:, 2*z:].astype(np.int32))*8).astype(np.int8)
    noisy = np.where(rng.random(base.shape) < 0.05, -base//2, base).astype(np.int8)
    llr = jnp.asarray(noisy)
    h_x, s_x = ldpc_decode(llr, BaseGraph.BG1, z, nof_iterations=4)
    h_p, s_p = ldpc_decode_pallas(llr, BaseGraph.BG1, z, 4)
    kp = 22*z
    r_es = ldpc_decode_pallas_es(llr, BaseGraph.BG1, z, "CRC24B", kp, 4)
    r_xes = ldpc_decode_es(llr, BaseGraph.BG1, z, "CRC24B", kp, nof_iterations=4)
    print(f"z={z:4d} v1 soft==xla: {(np.asarray(s_p)==np.asarray(s_x)).all()} "
          f"es==xla_es: {all((np.asarray(a)==np.asarray(b)).all() for a,b in zip(r_es, r_xes))}")
