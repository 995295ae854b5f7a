#!/usr/bin/env python3
"""Per-stage device timing of the north-star DL slot assembly
(273 PRB QAM256 2-layer 4-port + PDCCH + SSB + CSI-RS + OFDM), each stage
jitted separately, measured via op-profile rawTime."""
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

import numpy as np
from srsran_projectvtlmo_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp

from srsran_projectvtlmo_tpu.models.pdsch_tx import PdschTxConfig
from srsran_projectvtlmo_tpu.models.sch_tx import (
    build_sch_symbols_tx_dyn, sch_scramble_planes, sch_k0_prime)
from srsran_projectvtlmo_tpu.ran.modulation import Modulation
from srsran_projectvtlmo_tpu.ops.precoding import layer_map, precode
from srsran_projectvtlmo_tpu.ops import ofdm as ofdm_mod
from device_time import profile_device


def main():
    cfg = PdschTxConfig(nof_rb=273, modulation=Modulation.QAM256,
                        target_code_rate=948 / 1024, nof_layers=2,
                        nof_ofdm_symbols=12, dmrs_symbols=(0,),
                        start_symbol=2, rnti=0x4601, n_id=1,
                        dft_size=4096, numerology=1)
    tx = build_sch_symbols_tx_dyn(cfg)
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.integers(0, 2, (1, cfg.tbs)).astype(np.uint8))
    scr = tuple(jnp.asarray(p) for p in sch_scramble_planes(cfg, 0x4601, 1))
    k0p = jnp.asarray(sch_k0_prime(cfg, 0), jnp.int32)

    @jax.jit
    def enc_pair(a):
        sy = tx(a, scr, k0p)
        return jnp.stack([jnp.real(sy), jnp.imag(sy)], -1)

    s, tops = profile_device(enc_pair, tb, reps=5)
    print(f"encode+rm+scramble+mod: {s*1e3:.3f} ms")
    for fr, name in tops[:6]:
        print(f"   {fr*100:6.2f}% {name}")

    syms = tx(tb, scr, k0p)[0]
    sym_pair = jnp.stack([jnp.real(syms), jnp.imag(syms)], -1)
    w = np.zeros((4, 2, 2), np.float32); w[:, :, 0] = 0.5
    w = jnp.asarray(w)

    @jax.jit
    def prec_fn(sp, wt):
        layers = layer_map(jnp.moveaxis(sp, -1, 0), 2)
        layers = jnp.moveaxis(layers, 0, -1)
        return precode(layers, wt)

    s, tops = profile_device(prec_fn, sym_pair, w, reps=5)
    print(f"layer_map+precode: {s*1e3:.3f} ms")
    for fr, name in tops[:4]:
        print(f"   {fr*100:6.2f}% {name}")

    ports = prec_fn(sym_pair, w)  # (4, nre, 2)
    nsub = cfg.nof_rb * 12

    @jax.jit
    def assemble(pp):
        grid = jnp.zeros((4, 14, nsub, 2), jnp.float32)
        blocks = pp.reshape(4, 11, nsub, 2)
        grid = jax.lax.dynamic_update_slice(grid, blocks, (0, 3, 0, 0))
        return grid

    s, tops = profile_device(assemble, ports[:, :11 * nsub], reps=5)
    print(f"grid DUS assembly (11 syms): {s*1e3:.3f} ms")
    for fr, name in tops[:4]:
        print(f"   {fr*100:6.2f}% {name}")

    grid = assemble(ports[:, :11 * nsub])

    @jax.jit
    def mod(g):
        return ofdm_mod.ofdm_modulate(g, 4096, 1, 0)

    s, tops = profile_device(mod, grid, reps=5)
    print(f"ofdm_modulate (4 ports): {s*1e3:.3f} ms")
    for fr, name in tops[:6]:
        print(f"   {fr*100:6.2f}% {name}")


if __name__ == "__main__":
    main()
