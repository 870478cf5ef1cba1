"""Benchmark gather strategies on the real TPU.

The MSM engine's dominant cost on TPU is not field arithmetic but data
movement: reordering points into bucket-sorted order and the per-level
pair gathers. XLA:TPU lowers arbitrary minor-dim gathers to slow
per-element loops, so the choice of gather formulation sets the
performance ceiling of the whole pipeline. This script measures every
candidate on hardware; results drive the engine design.

Run: python scripts/gather_bench.py
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 1 << 17          # table size (2N at 2^16)
M = 1 << 17          # number of indices (one window's reorder)
ROWS = 64            # limb rows moved per point (x+y affine, 32 limbs each)

rng = np.random.default_rng(0)
idx = jnp.asarray(rng.permutation(B).astype(np.int32)[:M])
tab_rm = jnp.asarray(rng.integers(0, 4096, (ROWS, B), dtype=np.int32))   # rows-major
tab_cm = jnp.asarray(tab_rm.T)                                            # (B, ROWS)


def timed(name, fn, *args, reps=3):
    jf = jax.jit(lambda *a: jax.tree_util.tree_reduce(
        lambda s, l: s + l.sum(), fn(*a), jnp.int32(0)))
    try:
        jax.device_get(jf(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name}: {best*1e3:8.1f} ms   ({best/M*1e9:6.1f} ns/idx)", flush=True)


# ---- 1. baseline: take_along_axis on minor axis ----------------------------
timed("take minor-dim (ROWS,B)", lambda t, i: jnp.take(t, i, axis=1), tab_rm, idx)

# ---- 2. transposed: take rows of (B, ROWS) ---------------------------------
timed("take major-dim (B,ROWS)", lambda t, i: jnp.take(t, i, axis=0), tab_cm, idx)

# ---- 3. fewer rows: scaling in ROWS ----------------------------------------
timed("take minor-dim 8 rows", lambda t, i: jnp.take(t, i, axis=1), tab_rm[:8], idx)
timed("take minor-dim 1 row ", lambda t, i: jnp.take(t, i, axis=1), tab_rm[:1], idx)
timed("take major-dim 8 cols", lambda t, i: jnp.take(t, i, axis=0), tab_cm[:, :8], idx)

# ---- 4. sort-based permutation apply ----------------------------------------
# y[i] = x[perm[i]]  <=>  sort (rank, x) by rank where rank = argsort(perm)
def sort_apply(t, i):
    rank = jnp.argsort(i)  # inverse permutation
    ops = [rank] + [t[r] for r in range(t.shape[0])]
    out = jax.lax.sort(ops, num_keys=1)
    return out[1]

timed("lax.sort payload 64 rows", sort_apply, tab_rm, idx)
timed("lax.sort payload 8 rows ", sort_apply, tab_rm[:8], idx)


# ---- 5. Pallas scalar-prefetch gather: 1 column per grid step ---------------
def pallas_gather_cm(t, i, cols_per_step=1):
    """t: (B, ROWS) contiguous rows; one (cols_per_step, ROWS) DMA per step."""
    m = i.shape[0]

    def kern(idx_ref, t_ref, o_ref):
        o_ref[...] = t_ref[...]

    grid = (m // cols_per_step,)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((cols_per_step, t.shape[1]),
                             lambda g, idx_ref: (idx_ref[g], 0)),
            ],
            out_specs=pl.BlockSpec((cols_per_step, t.shape[1]),
                                   lambda g, idx_ref: (g, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, t.shape[1]), t.dtype),
    )(i, t)

timed("pallas prefetch-gather (B,64)", pallas_gather_cm, tab_cm, idx)
timed("pallas prefetch-gather (B,8)", pallas_gather_cm, tab_cm[:, :8], idx)


# ---- 6. Pallas gather, 8 sublane-columns per DMA via 8 specs ----------------
def pallas_gather8(t, i):
    """8 independent single-column DMAs per grid step (pipelined)."""
    m = i.shape[0]
    G = m // 8

    def kern(idx_ref, *refs):
        t_refs, o_ref = refs[:-1], refs[-1]
        for k in range(8):
            o_ref[k, :] = t_refs[k][0, :]

    specs = [
        pl.BlockSpec((1, t.shape[1]),
                     functools.partial(lambda k, g, idx_ref: (idx_ref[8 * g + k], 0), k))
        for k in range(8)
    ]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(G,),
            in_specs=[s for s in specs],
            out_specs=pl.BlockSpec((8, t.shape[1]), lambda g, idx_ref: (g, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m, t.shape[1]), t.dtype),
    )(i, *([t] * 8))

timed("pallas 8-way gather (B,64)", pallas_gather8, tab_cm, idx)

# ---- 7. dynamic_slice scan (the XLA-loop shape, explicit) --------------------
def dynslice_scan(t, i):
    def body(_, ij):
        return None, jax.lax.dynamic_slice(t, (ij, 0), (1, t.shape[1]))[0]
    _, out = jax.lax.scan(body, None, i)
    return out

timed("dyn-slice scan (B,64)", dynslice_scan, tab_cm, idx)

# ---- 8. one-hot matmul gather (small table) ---------------------------------
def onehot_gather(t, i, L):
    oh = jax.nn.one_hot(i, L, dtype=jnp.float32)  # (M, L)
    return jnp.dot(oh, t.astype(jnp.float32), preferred_element_type=jnp.float32)

SMALL = 1 << 12
timed(f"one-hot matmul tab={SMALL} 64c",
      lambda t, i: onehot_gather(t, i, SMALL), tab_cm[:SMALL], idx % SMALL)
