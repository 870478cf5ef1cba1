"""Gather layout A/B: column gather (minor axis) vs row gather (major axis
+ transposes) at MSM shapes, plus scatter-add (bucket counts) variants.

The padded engine's slot gather moves ~2.9M indices x 64 rows; this probe
decides the cheapest formulation on the actual chip.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from msm_zprize_tpu.utils.sync import sync

R = 64          # rows (2 coords x 32 limbs)
B = 1 << 17     # source points
S = 2_883_584   # slot count at 2^16 c=12
K, L = 11, 2048

rng = np.random.default_rng(0)
stacked = jnp.asarray(rng.integers(0, 4096, (R, B), dtype=np.int32))
src = jnp.asarray(rng.integers(0, B, (S,), dtype=np.int32))


def timed(name, fn, args, inner=4, reps=3):
    @jax.jit
    def jf(*a):
        acc = jnp.int32(0)
        for i in range(inner):
            out = fn(*a)
            acc = acc + out.ravel()[i].astype(jnp.int32)
        return acc

    sync(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(jf(*args))
        ts.append(time.time() - t0)
    t = min(ts) / inner
    print(f"{name:48s} {t*1e3:8.1f} ms  ({t*1e9/S:.2f} ns/slot)", flush=True)
    return t


# A: current — column gather on the minor axis
timed("col gather take(stacked(R,B), src, -1)",
      lambda st, ix: jnp.take(st, ix, axis=-1), (stacked, src))

# B: row gather on the major axis of the TRANSPOSED table (+ output stays
# row-major (S, R) — kernels would need this layout end-to-end)
stackedT = jnp.asarray(np.ascontiguousarray(np.asarray(stacked).T))
timed("row gather take(stackedT(B,R), src, 0)",
      lambda st, ix: jnp.take(st, ix, axis=0), (stackedT, src))

# C: row gather + transpose back to (R, S)
timed("row gather + transpose to (R,S)",
      lambda st, ix: jnp.take(st, ix, axis=0).T, (stackedT, src))

# D: counts scatter-add 2D (current) vs 1D flat
ids = jnp.asarray(rng.integers(0, L + 1, (K, 2 * B), dtype=np.int32))
rows = jnp.arange(K, dtype=jnp.int32)[:, None]


def counts2d(idv):
    z = jnp.zeros((K, L + 2), jnp.int32)
    return z.at[rows, idv].add(jnp.ones_like(idv))


def counts1d(idv):
    z = jnp.zeros((K * (L + 2),), jnp.int32)
    flat = (idv + rows * (L + 2)).reshape(-1)
    return z.at[flat].add(1).reshape(K, L + 2)


timed("counts scatter-add 2D (current)", counts2d, (ids,))
timed("counts scatter-add 1D flat", counts1d, (ids,))

# E: counts via sorted-run subtraction (no scatter): given SORTED ids,
# count[l] = searchsorted... emulate with cummax fill of run starts
sids = jnp.sort(ids, axis=1)


def counts_sortfill(sv):
    Bs = sv.shape[1]
    iota = jnp.arange(Bs, dtype=jnp.int32)[None, :]
    first = jnp.concatenate(
        [jnp.ones((K, 1), bool), sv[:, 1:] != sv[:, :-1]], axis=1
    )
    # scatter run-start positions (min) into the grid — ONE scatter of B
    grid = jnp.full((K, L + 2), 1 << 30, jnp.int32)
    pos = jnp.where(first, iota, 1 << 30)
    grid = grid.at[rows, sv].min(pos)
    # fill empties from the right, then diff
    filled = jax.lax.cummin(grid[:, ::-1], axis=1)[:, ::-1]
    ends = jnp.concatenate([filled[:, 1:], jnp.full((K, 1), Bs, jnp.int32)], axis=1)
    return jnp.minimum(ends, Bs) - jnp.minimum(filled, Bs)


timed("counts via run-start scatter-min + fill", counts_sortfill, (sids,))
