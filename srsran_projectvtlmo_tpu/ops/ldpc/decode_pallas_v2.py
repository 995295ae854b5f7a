"""Compile-light Pallas LDPC decoder: layers run in a fori_loop with the graph
as scalar-prefetched tables and rotations as dynamic lane slices.

Same arithmetic as decode.py / decode_pallas.py (bit-exact).  Trades some
steady-state speed (dynamic rotates, masked padded edges) for a kernel whose
program size is independent of the graph -- O(E_max) ops instead of
O(iterations x edges) -- so the (remote) Mosaic compile stays fast at every
lifting size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ran.ldpc_params import BaseGraph
from ...utils.llr import LLR_MAX, LLR_INFTY
from .graphs import get_graph

DEFAULT_B_TILE = 8


def _sat_sub(a, b):
    plain = jnp.clip(a - b, -LLR_MAX, LLR_MAX)
    out = jnp.where(jnp.abs(a) == LLR_INFTY, a, jnp.where(jnp.abs(b) == LLR_INFTY, -b, plain))
    return jnp.where(a == b, 0, out)


def _promotion_sum(a, b):
    s = a + b
    plain = jnp.where(jnp.abs(s) > LLR_MAX, jnp.sign(s) * LLR_INFTY, s)
    out = jnp.where(jnp.abs(a) == LLR_INFTY, a, jnp.where(jnp.abs(b) == LLR_INFTY, b, plain))
    return jnp.where(a == -b, 0, out)


def _scale(mag, sf: float):
    return jnp.floor(mag.astype(jnp.float32) * jnp.float32(sf) + 0.5).astype(jnp.int32)


def _make_kernel(bg: BaseGraph, z: int, nof_iterations: int, sf: float, b_tile: int):
    g = get_graph(bg, z)
    nv, m, e_max = g.n_full, g.m, g.max_row_degree

    def rot_left(x, s):
        """x (b, z) rotated left by traced s: out[i] = x[(i + s) mod z].

        pltpu.roll rolls right by the (dynamic) shift, so left-by-s is
        right-by-(z - s); Mosaic supports dynamic lane rotates, while value
        dynamic_slice does not lower (KernelType.TC limitation).
        """
        return pltpu.roll(x, z - s, axis=1)

    def kernel(cols_ref, shifts_ref, llr_ref, out_ref,
               soft, min1, min2, amin, signs, sprod):
        soft[0] = jnp.zeros((b_tile, z), jnp.int32)
        soft[1] = jnp.zeros((b_tile, z), jnp.int32)
        for c in range(2, nv):
            soft[c] = llr_ref[c - 2].astype(jnp.int32)
        soft[nv] = jnp.zeros((b_tile, z), jnp.int32)  # trash row for padded edges
        min1[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        min2[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        amin[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        signs[...] = jnp.zeros((m, b_tile, z), jnp.int32)
        sprod[...] = jnp.zeros((m, b_tile, z), jnp.int32)

        def layer_body(r, _):
            old_m1 = min1[r]
            old_m2 = min2[r]
            old_am = amin[r]
            old_sb = signs[r]
            old_sp = sprod[r]

            new_m1 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
            new_m2 = jnp.full((b_tile, z), LLR_MAX, jnp.int32)
            new_am = jnp.zeros((b_tile, z), jnp.int32)
            new_sp = jnp.zeros((b_tile, z), jnp.int32)
            new_sb = jnp.zeros((b_tile, z), jnp.int32)
            v2cs = []
            infos = []
            for e in range(e_max):
                col = cols_ref[r * e_max + e]       # nv (trash) when padded
                s = shifts_ref[r * e_max + e]
                valid = col < nv
                soft_chk = rot_left(soft[col], s)
                old_sign_e = jnp.bitwise_and(old_sb >> e, 1)
                old_mag = jnp.where(old_am == e, old_m2, old_m1)
                c2v_old = jnp.where((old_sp ^ old_sign_e) == 1, -old_mag, old_mag)
                v2c = _sat_sub(soft_chk, c2v_old)
                v2cs.append(v2c)
                infos.append((col, s, valid))

                absv = jnp.where(valid, jnp.abs(v2c), LLR_INFTY + 1)
                sign = jnp.where(valid, (v2c < 0).astype(jnp.int32), 0)
                is_min = absv < new_m1
                new_m2 = jnp.where(is_min, new_m1, jnp.minimum(new_m2, absv))
                new_am = jnp.where(is_min, e, new_am)
                new_m1 = jnp.where(is_min, absv, new_m1)
                new_sp = new_sp ^ sign
                new_sb = new_sb | (sign << e)

            s_m1 = _scale(new_m1, sf)
            s_m2 = _scale(new_m2, sf)

            for e in range(e_max):
                col, s, valid = infos[e]
                v2c = v2cs[e]
                sign_e = jnp.bitwise_and(new_sb >> e, 1)
                mag = jnp.where(new_am == e, s_m2, s_m1)
                c2v = jnp.where((new_sp ^ sign_e) == 1, -mag, mag)
                soft_new = _promotion_sum(c2v, v2c)
                # Padded edges write the trash row (col == nv). Back-rotation
                # to the variable domain is a right-roll by s.
                soft[col] = pltpu.roll(soft_new, s, axis=1)
            min1[r] = s_m1
            min2[r] = s_m2
            amin[r] = new_am
            signs[r] = new_sb
            sprod[r] = new_sp
            return 0

        def iteration(_, carry):
            jax.lax.fori_loop(0, m, layer_body, 0)
            return carry

        jax.lax.fori_loop(0, nof_iterations, iteration, 0)

        for c in range(g.kb):
            out_ref[c] = jnp.clip(soft[c], -LLR_INFTY, LLR_INFTY).astype(jnp.int8)

    # Padded tables: invalid edges point at the trash row with shift 0.
    cols = np.where(g.row_cols >= 0, g.row_cols, nv).astype(np.int32).reshape(-1)
    shifts = np.where(g.row_cols >= 0, g.row_shifts, 0).astype(np.int32).reshape(-1)
    return kernel, g, cols, shifts


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def ldpc_decode_pallas_v2(
    llrs,
    bg: BaseGraph,
    z: int,
    nof_iterations: int = 6,
    scaling_factor: float = 0.8,
    b_tile: int = DEFAULT_B_TILE,
):
    """Drop-in equivalent of ldpc_decode / ldpc_decode_pallas."""
    dev0 = jax.devices()[0]
    if (dev0.platform == "tpu" or "TPU" in str(dev0)) and z % 128 != 0:
        # Mosaic lane rotations are only correct for whole-vreg lane counts
        # (see decode_pallas._tpu_roll_safe); use the bit-exact XLA program.
        from .decode import ldpc_decode as _xla_decode

        return _xla_decode(llrs, bg, z, nof_iterations=nof_iterations,
                           scaling_factor=scaling_factor)
    kernel, g, cols, shifts = _make_kernel(bg, z, nof_iterations, float(scaling_factor), b_tile)
    b = llrs.shape[0]
    pad = (-b) % b_tile
    if pad:
        llrs = jnp.concatenate([llrs, jnp.zeros((pad, llrs.shape[1]), llrs.dtype)], 0)
    bp = llrs.shape[0]
    x = jnp.transpose(llrs.reshape(bp, g.n_full - 2, z), (1, 0, 2))

    dev = jax.devices()[0]
    interpret = not (dev.platform == "tpu" or "TPU" in str(dev))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bp // b_tile,),
        in_specs=[pl.BlockSpec((g.n_full - 2, b_tile, z), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g.kb, b_tile, z), lambda i, *_: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((g.n_full + 1, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
            pltpu.VMEM((g.m, b_tile, z), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g.kb, bp, z), jnp.int8),
        interpret=interpret,
    )(jnp.asarray(cols), jnp.asarray(shifts), x)
    soft_info = jnp.transpose(out, (1, 0, 2)).reshape(bp, g.kb * z)[:b]
    hard = (soft_info <= 0).astype(jnp.uint8)
    return hard, soft_info
