"""Bisect the 770 ms inside accumulate_buckets_padded (2^16, c=12).

Times each sub-computation as its own jitted program (scalar-reduced
output), amortized over R reps chained with a data dependency.
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
from msm_zprize_tpu.curves.weierstrass import ProjectivePoints
from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket
from msm_zprize_tpu.parallel.api import Weierstrass

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N
c = 12
K = 11
L = 1 << (c - 1)
B = 2 * N
mean = B // L
M = max(2 * mean, 2)

curve = Weierstrass.create(BLS12_377)
W = curve.ops
F = W.F
n = F.n

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, L, (K, B), dtype=np.int32))
stacked = jnp.asarray(rng.integers(0, 4096, (2 * n, B), dtype=np.int32))
signs = jnp.asarray(rng.integers(0, 2, (K, B), dtype=np.int32))


def timed(name, fn, *args, reps=3, R=2):
    jf = jax.jit(fn, static_argnames=("R",))
    t0 = time.time()
    jax.device_get(jf(*args, R=R))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args, R=R))
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)/R*1e3:9.1f} ms/op  (compile {tc:.0f}s)", flush=True)


def red(x):
    if isinstance(x, (tuple, list)):
        return sum((red(a) for a in x), jnp.int32(0))
    return x.sum(dtype=jnp.int32)


# 1. sort alone
def f_sort(ids, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        order, sids = sort_by_bucket((ids + r) % L)
        acc += red((order, sids))
    return acc


# 2. sort + scatter-add counts
def f_counts(ids, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        order, sids = sort_by_bucket((ids + r) % L)
        counts = bucket_counts(sids, L + 1)
        acc += red((order, counts))
    return acc


# 3. big composed gather (src via order, then stacked take)
def f_gather(ids, stacked, R=1):
    order, sids = sort_by_bucket(ids)
    order_flat = order.reshape(-1)
    kbase = jnp.broadcast_to(
        (jnp.arange(K, dtype=jnp.int32) * B)[:, None, None], (K, L, M)
    ).reshape(-1)
    j = jnp.arange(M, dtype=jnp.int32)[None, None, :]
    pos = jnp.zeros((K, L, 1), jnp.int32) + j
    acc = jnp.int32(0)
    for r in range(R):
        flat = (jnp.clip(pos + r, 0, B - 1)).reshape(-1) + kbase
        src = jnp.take(order_flat, flat)
        g = jnp.take(stacked, src, axis=-1)
        acc += red(g)
    return acc


# 4. prepare (elementwise select to x,y,z) on a (KLM,) batch
def f_prepare(stacked, R=1):
    g = stacked[:, :1]
    gx = jnp.broadcast_to(g[:n], (n, K * L * M))
    gy = jnp.broadcast_to(g[n:], (n, K * L * M))
    acc = jnp.int32(0)
    one = F.ones_mont(K * L * M)
    for r in range(R):
        x = jnp.where(True, gx + r, 0)
        y = F.cneg(gy + r, jnp.ones((K * L * M,), jnp.int32))
        z = one
        acc += red((x, y, z))
    return acc


# 5. tree_reduce: log2(M) levels of proj_add on (K*L*M,) down to (K*L,)
def f_tree(stacked, R=1):
    gx = jnp.broadcast_to(stacked[:n, :1], (n, K * L * M))
    gy = jnp.broadcast_to(stacked[n:, :1], (n, K * L * M))
    gz = F.ones_mont(K * L * M)
    acc = jnp.int32(0)
    for r in range(R):
        cur = (gx + r, gy, gz)
        m = M
        while m > 1:
            pairs = tuple(a.reshape(a.shape[:-1] + (-1, 2)) for a in cur)
            a = ProjectivePoints(*(t[..., 0] for t in pairs))
            b = ProjectivePoints(*(t[..., 1] for t in pairs))
            cur = tuple(W.proj_add(a, b))
            m //= 2
        acc += red(cur)
    return acc


timed("sort (K,B)", f_sort, ids)
timed("sort + scatter counts", f_counts, ids)
timed("composed gather (2n rows, KLM idx)", f_gather, ids, stacked)
timed("prepare elementwise", f_prepare, stacked)
timed("tree_reduce log2(M) proj_add levels", f_tree, stacked)
