#!/usr/bin/env python3
"""Hardware parity harness: compiled Pallas LDPC decoders vs the XLA
program across lifting sizes.  Caught the Mosaic lane-rotation corruption
for z not a multiple of 128 in round 3; since round 4 those sizes run the
packed-lane kernel (block-cyclic rotation via two rolls + select), verified
bit-exact here for both base graphs."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from srsran_projectvtlmo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import numpy as np, jax.numpy as jnp
from srsran_projectvtlmo_tpu.ran.ldpc_params import BaseGraph
from srsran_projectvtlmo_tpu.ops.ldpc.encode import ldpc_encode
from srsran_projectvtlmo_tpu.ops.ldpc.decode import ldpc_decode, ldpc_decode_es
from srsran_projectvtlmo_tpu.ops.ldpc.decode_pallas import (
    ldpc_decode_pallas, ldpc_decode_pallas_es, ldpc_decode_pallas_es_bm)

rng = np.random.default_rng(1)
zs = [int(z) for z in os.environ.get(
    "ZS", "40,64,96,104,128,176,208,240,256,352,384").split(",")]
for bg, kb in ((BaseGraph.BG1, 22), (BaseGraph.BG2, 10)):
    for z in zs:
        info = rng.integers(0, 2, (16, kb * z)).astype(np.uint8)
        cw = np.asarray(ldpc_encode(jnp.asarray(info), bg, z))
        base = ((1 - 2 * cw[:, 2 * z:].astype(np.int32)) * 8).astype(np.int8)
        noisy = np.where(rng.random(base.shape) < 0.05, -base // 2,
                         base).astype(np.int8)
        llr = jnp.asarray(noisy)
        kp = kb * z
        r_bm = ldpc_decode_pallas_es_bm(llr, bg, z, "CRC24B", kp, 4)
        r_es = ldpc_decode_pallas_es(llr, bg, z, "CRC24B", kp, 4)
        r_x = ldpc_decode_es(llr, bg, z, "CRC24B", kp, nof_iterations=4)
        ok_bm = all((np.asarray(a) == np.asarray(b)).all()
                    for a, b in zip(r_bm, r_x))
        ok_es = all((np.asarray(a) == np.asarray(b)).all()
                    for a, b in zip(r_es, r_x))
        extra = ""
        if z % 128 == 0:
            h_p, s_p = ldpc_decode_pallas(llr, bg, z, 4)
            _, s_x = ldpc_decode(llr, bg, z, nof_iterations=4)
            extra = f" v1=={ (np.asarray(s_p) == np.asarray(s_x)).all() }"
        print(f"bg{int(bg)} z={z:4d} es_bm==xla: {ok_bm} es==xla: {ok_es}{extra}",
              flush=True)
        assert ok_bm and ok_es, (bg, z)
print("ALL PARITY OK")
