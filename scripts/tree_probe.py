"""Isolate padded-engine phase costs: big proj_add, tree_reduce, glv_prep,
spread, sort, counts — each timed as its own jitted program on the chip.

Run: python scripts/tree_probe.py [log_n] [c]
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

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.curves.weierstrass import AffinePoints, ProjectivePoints
from msm_zprize_tpu.msm.batched_affine import glv_prep
from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket, window_size
from msm_zprize_tpu.parallel.api import Weierstrass

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N
curve = Weierstrass.create(BLS12_377)
W, S = curve.ops, curve.scalar
F = W.F
c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size("batched-affine", LOG_N)
L = 1 << (c - 1)
K = -(-(S.max_bits + 1) // c)
B = 2 * N
M = max(2 * (B // L), 2)
print(f"N=2^{LOG_N} c={c} K={K} L={L} B={B} M={M}", flush=True)

rng = np.random.default_rng(0)
sc = curve.random_scalars(N, seed=0)
px = jnp.asarray(rng.integers(0, 4096, (F.n, N), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 4096, (F.n, N), dtype=np.int32))
pinf = jnp.zeros((N,), dtype=np.int32)
pts = AffinePoints(px, py, pinf)


def red(x):
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "sum")]
    return sum((l.sum(dtype=jnp.int32) for l in leaves), jnp.int32(0))


def timed(name, jf, args, reps=3):
    t0 = time.time()
    jax.device_get(jf(*args))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args))
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)*1e3:9.1f} ms   (compile+1st {tc:.1f}s)", flush=True)
    return min(ts)


# --- phase inputs (random limb data, representative shapes) -------------------
T = M * K * L  # slot count
X1 = jnp.asarray(rng.integers(0, 4096, (F.n, T // 2), dtype=np.int32))
Y1 = jnp.asarray(rng.integers(0, 4096, (F.n, T // 2), dtype=np.int32))
Z1 = jnp.asarray(rng.integers(0, 4096, (F.n, T // 2), dtype=np.int32))

# 1. one wide proj_add at level-1 width (T/2 lanes)
addf = jax.jit(lambda a, b, cc, d, e, f_: red(
    W.proj_add(ProjectivePoints(a, b, cc), ProjectivePoints(d, e, f_))))
t = timed(f"proj_add @ {T//2} lanes", addf, (X1, Y1, Z1, Y1, Z1, X1))
print(f"    -> {t*1e9/(T//2):.2f} ns/lane", flush=True)

# 2. full tree reduce M -> 1 (slot-major), as in the engine
def tree(x, y, z):
    m = M
    cur = tuple(a.reshape(a.shape[:-1] + (M, K * L)) for a in (x, y, z))
    while m > 1:
        half = m // 2
        a = ProjectivePoints(*(t[..., :half, :] for t in cur))
        b = ProjectivePoints(*(t[..., half:, :] for t in cur))
        cur = tuple(W.proj_add(a, b))
        m = half
    return red(cur)

XT = jnp.asarray(rng.integers(0, 4096, (F.n, T), dtype=np.int32))
YT = jnp.asarray(rng.integers(0, 4096, (F.n, T), dtype=np.int32))
ZT = jnp.asarray(rng.integers(0, 4096, (F.n, T), dtype=np.int32))
t = timed(f"tree reduce {M}->1 ({T} slots)", jax.jit(tree), (XT, YT, ZT))
print(f"    -> {t*1e9/(T-K*L):.2f} ns/pair-lane", flush=True)

# 3. glv_prep alone
t = timed("glv_prep (decompose+endo+slice)",
          jax.jit(lambda s, x, y, i: red(glv_prep(W, S, s, AffinePoints(x, y, i), c))),
          (sc, px, py, pinf))

# 4. + spread-ids
def spread(s, x, y, i):
    pts2, mags, signs, K_, L_ = glv_prep(W, S, s, AffinePoints(x, y, i), c)
    ids = jnp.where(mags == 0, L, mags - 1).astype(jnp.int32)
    max_id = jnp.max(jnp.where(ids == L, 0, ids), axis=1)
    tt = L // (max_id + 1)
    for sh in (1, 2, 4, 8, 16):
        tt = tt | (tt >> sh)
    Sv = (tt - (tt >> 1)).astype(jnp.int32)[:, None]
    return red((ids, Sv, signs))

t = timed("+ spread ids", jax.jit(spread), (sc, px, py, pinf))

# 5. sort alone on representative ids
ids0 = jnp.asarray(rng.integers(0, L + 1, (K, B), dtype=np.int32))
def just_sort(ids):
    order, sids = sort_by_bucket(ids)
    return red((order, sids))
t = timed(f"lax.sort ({K}x{B})", jax.jit(just_sort), (ids0,))

# 6. sort + counts
def sort_counts(ids):
    order, sids = sort_by_bucket(ids)
    return red(bucket_counts(sids, L + 1))
t = timed("sort + counts", jax.jit(sort_counts), (ids0,))

# 7. the big slot gather alone (random src into stacked x,y)
src0 = jnp.asarray(rng.integers(0, B, (T,), dtype=np.int32))
stacked = jnp.concatenate([XT[:, :B], YT[:, :B]], axis=0)
def big_gather(st, src):
    return red(jnp.take(st, src, axis=-1))
t = timed(f"flat gather {T} idx x {2*F.n} rows", jax.jit(big_gather), (stacked, src0))
print(f"    -> {t*1e9/T:.2f} ns/slot", flush=True)

# 8. same gather but from SORTED positions (sequential-ish locality)
src_seq = jnp.sort(src0)
t = timed("flat gather (sorted idx)", jax.jit(big_gather), (stacked, src_seq))
print(f"    -> {t*1e9/T:.2f} ns/slot", flush=True)
