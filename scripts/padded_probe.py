"""Prefix-timing inside accumulate_buckets_padded (real digits, real TPU).

Stages: prep+spread+sort+counts | +gather | +prepare | +tree | full accum.
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
from msm_zprize_tpu.msm import engine
from msm_zprize_tpu.msm.batched_affine import accumulate_glv_projective, glv_prep
from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket, window_size
from msm_zprize_tpu.parallel.api import Weierstrass

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N
curve = Weierstrass.create(BLS12_377)
W, S = curve.ops, curve.scalar
F = W.F
c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size("batched-affine", LOG_N)
L = 1 << (c - 1)

rng = np.random.default_rng(0)
px = jnp.asarray(rng.integers(0, 4096, (F.n, N), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 4096, (F.n, N), dtype=np.int32))
pinf = jnp.zeros((N,), dtype=np.int32)
sc = curve.random_scalars(N, seed=0)


def red(x):
    leaves = jax.tree_util.tree_leaves(x)
    return sum((l.sum(dtype=jnp.int32) for l in leaves), jnp.int32(0))


def timed(name, fn, reps=3):
    jf = jax.jit(lambda s, x, y, i: red(fn(s, AffinePoints(x, y, i))))
    t0 = time.time()
    jax.device_get(jf(sc, px, py, pinf))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(sc, px, py, pinf))
        ts.append(time.time() - t0)
    print(f"{name:40s} {min(ts)*1e3:9.1f} ms   (compile+1st {tc:.1f}s)", flush=True)
    return min(ts)


def spread_sort(s, pts):
    pts2, mags, signs, K, L_ = glv_prep(W, S, s, pts, c)
    B = mags.shape[-1]
    ids = jnp.where(mags == 0, L, mags - 1).astype(jnp.int32)
    max_id = jnp.max(jnp.where(ids == L, 0, ids), axis=1)
    t = L // (max_id + 1)
    for sh in (1, 2, 4, 8, 16):
        t = t | (t >> sh)
    Sv = (t - (t >> 1)).astype(jnp.int32)[:, None]
    iota = jnp.arange(B, dtype=jnp.int32)[None, :]
    virt = ids * Sv + (iota & (Sv - 1))
    ids = jnp.where(ids == L, L, virt)
    order, sorted_ids = sort_by_bucket(ids)
    counts = bucket_counts(sorted_ids, L + 1)[:, :L]
    return pts2, signs, order, counts, Sv, K, B


def p_sort(s, pts):
    pts2, signs, order, counts, Sv, K, B = spread_sort(s, pts)
    return order, counts


def make_layout(order, counts, K, B):
    M = max(2 * (B // L), 2)
    offsets = jnp.cumsum(counts, axis=-1) - counts
    ends = offsets + counts
    order_flat = order.reshape(-1)
    kbase = jnp.broadcast_to(
        (jnp.arange(K, dtype=jnp.int32) * B)[:, None, None], (K, L, M)
    ).reshape(-1)
    j = jnp.arange(M, dtype=jnp.int32)[None, None, :]
    pos = offsets[:, :, None] + j
    valid = (pos < ends[:, :, None]).reshape(-1)
    flat = (jnp.clip(pos, 0, B - 1)).reshape(-1) + kbase
    src = jnp.take(order_flat, flat)
    return src, valid, kbase, M


def p_gather(s, pts):
    pts2, signs, order, counts, Sv, K, B = spread_sort(s, pts)
    src, valid, kbase, M = make_layout(order, counts, K, B)
    stacked, splits, pt_type = engine._stack((pts2.x, pts2.y))
    g = jnp.take(stacked, src, axis=-1)
    sg = jnp.take(signs.reshape(-1), src + kbase)
    return g, sg


def p_prepare(s, pts):
    pts2, signs, order, counts, Sv, K, B = spread_sort(s, pts)
    src, valid, kbase, M = make_layout(order, counts, K, B)
    stacked, splits, pt_type = engine._stack((pts2.x, pts2.y))
    g = jnp.take(stacked, src, axis=-1)
    sg = jnp.take(signs.reshape(-1), src + kbase)
    x, y = engine._unstack(g, splits, pt_type)
    y = F.cneg(y, sg)
    one = F.ones_mont(*y.shape[1:])
    x = jnp.where(valid, x, jnp.zeros_like(x))
    y = jnp.where(valid, y, one)
    z = jnp.where(valid, one, jnp.zeros_like(one))
    return x, y, z


def p_tree(s, pts):
    x, y, z = p_prepare(s, pts)
    K = 11
    M = x.shape[-1] // (K * L)
    cur = tuple(a.reshape(a.shape[:-1] + (K * L, M)) for a in (x, y, z))
    m = M
    while m > 1:
        half = m // 2
        a = ProjectivePoints(*(t[..., :half] for t in cur))
        b = ProjectivePoints(*(t[..., half:] for t in cur))
        cur = tuple(W.proj_add(a, b))
        m = half
    return cur


def p_accum(s, pts):
    return accumulate_glv_projective(W, S, s, pts, c)


timed("prep+spread+sort+counts", p_sort)
timed("+ layout + gather", p_gather)
timed("+ prepare", p_prepare)
timed("+ tree levels", p_tree)
timed("accumulate_glv_projective (full)", p_accum)
