#!/usr/bin/env python3
"""Layout experiment: MMSE 2x4 weights+apply, S-last unrolled vs current."""
import os, sys, time
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=20):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/reps*1e3:8.3f} ms", flush=True)


B, S, P, L, T = 8, 3276, 4, 2, 13
rng = np.random.default_rng(0)

# --- current layout ---------------------------------------------------------
from srsran_projectvtlmo_tpu.ops.equalization import mmse_weights, apply_weights
h = jnp.asarray(rng.normal(size=(B, S, P, L, 2)).astype(np.float32))
nv = jnp.asarray(np.abs(rng.normal(size=(B, P))).astype(np.float32) + 0.01)
y = jnp.asarray(rng.normal(size=(B, T, S, P, 2)).astype(np.float32))

@jax.jit
def cur(h, nv, y):
    w, pv = mmse_weights(h, nv)
    return apply_weights(w, y), pv

timeit("current mmse+apply", cur, h, nv, y)

# --- S-last, unrolled P/L, split re/im --------------------------------------
# h2: (P, L, 2, B, S); y2: (P, 2, B, T, S); out: (L, 2, B, T, S)
h2 = jnp.asarray(np.moveaxis(np.asarray(h), (2, 3, 4), (0, 1, 2)))
y2 = jnp.asarray(np.moveaxis(np.asarray(y), (3, 4), (0, 1)))

@jax.jit
def lanes(h2, nv, y2):
    hr = [[h2[p, l, 0] for l in range(L)] for p in range(P)]  # (B,S) each
    hi = [[h2[p, l, 1] for l in range(L)] for p in range(P)]
    ninv = [1.0 / jnp.maximum(nv[:, p], 1e-38) for p in range(P)]  # (B,)

    # A = H^H N^-1 H + I  (2x2 hermitian): a00,a11 real (B,S); a01 complex.
    def acc(f):
        return sum(f(p) for p in range(P))
    a00 = 1.0 + acc(lambda p: (hr[p][0]**2 + hi[p][0]**2) * ninv[p][:, None])
    a11 = 1.0 + acc(lambda p: (hr[p][1]**2 + hi[p][1]**2) * ninv[p][:, None])
    a01r = acc(lambda p: (hr[p][0]*hr[p][1] + hi[p][0]*hi[p][1]) * ninv[p][:, None])
    a01i = acc(lambda p: (hr[p][0]*hi[p][1] - hi[p][0]*hr[p][1]) * ninv[p][:, None])
    det = jnp.maximum(a00*a11 - (a01r**2 + a01i**2), 1e-30)
    idet = 1.0 / det
    i00, i11 = a11*idet, a00*idet
    i01r, i01i = -a01r*idet, -a01i*idet
    # W = A^-1 H^H N^-1 : w[l][p] complex (B,S)
    wr = [[None]*P for _ in range(L)]
    wi = [[None]*P for _ in range(L)]
    for p in range(P):
        bhr0, bhi0 = hr[p][0]*ninv[p][:, None], -hi[p][0]*ninv[p][:, None]
        bhr1, bhi1 = hr[p][1]*ninv[p][:, None], -hi[p][1]*ninv[p][:, None]
        wr[0][p] = i00*bhr0 + (i01r*bhr1 - i01i*bhi1)
        wi[0][p] = i00*bhi0 + (i01r*bhi1 + i01i*bhr1)
        wr[1][p] = (i01r*bhr0 + i01i*bhi0) + i11*bhr1
        wi[1][p] = (i01r*bhi0 - i01i*bhr0) + i11*bhi1
    d0 = jnp.clip(i00, 1e-9, 1.0 - 1e-9)
    d1 = jnp.clip(i11, 1e-9, 1.0 - 1e-9)
    g0, g1 = 1.0/(1.0 - d0), 1.0/(1.0 - d1)
    outs = []
    for l, g in ((0, g0), (1, g1)):
        orr = sum(wr[l][p][:, None]*y2[p, 0] - wi[l][p][:, None]*y2[p, 1]
                  for p in range(P)) * g[:, None]
        oi = sum(wr[l][p][:, None]*y2[p, 1] + wi[l][p][:, None]*y2[p, 0]
                 for p in range(P)) * g[:, None]
        outs.append(jnp.stack([orr, oi]))
    nv0, nv1 = d0*g0, d1*g1
    return jnp.stack(outs), jnp.stack([nv0, nv1])

timeit("lanes mmse+apply", lanes, h2, nv, y2)

# cross-check numerics
o1, pv1 = jax.block_until_ready(cur(h, nv, y))
o2, pv2 = jax.block_until_ready(lanes(h2, nv, y2))
o1c = np.asarray(o1)  # (B,T,S,L,2)
o2c = np.moveaxis(np.asarray(o2), (0, 1), (3, 4))  # (B,T,S,L,2)
print("max|dout|", np.abs(o1c - o2c).max(),
      "max|dnv|", np.abs(np.asarray(pv1)[:, :, 0] - np.asarray(pv2)[0].T[:, None, :].transpose(1,0,2)).max() if False else "-")
