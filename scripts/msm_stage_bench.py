"""Per-stage timing of the flagship MSM on real TPU.

Each stage boundary is measured by jitting a PREFIX of the pipeline with a
scalar-reduced output and timing the second run (first run pays compile);
stage cost = difference of consecutive prefixes. This sidesteps both the
axon tunnel's non-blocking block_until_ready and its large-readback cost.

Run: python scripts/msm_stage_bench.py [log_n] [c]
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
from msm_zprize_tpu.msm.batched_affine import (
    accumulate_glv_projective, finalize_projective_buckets, glv_prep,
)
from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket, window_size
from msm_zprize_tpu.parallel.api import Weierstrass

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N

curve = Weierstrass.create(BLS12_377)
W, S = curve.ops, curve.scalar
c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size("batched-affine", LOG_N)

rng = np.random.default_rng(0)
px = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
pinf = jnp.zeros((N,), dtype=np.int32)
sc = curve.random_scalars(N, seed=0)
pts = AffinePoints(px, py, pinf)


def reduce_tree(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree) if hasattr(l, "sum")]
    return sum((l.sum(dtype=jnp.int32) for l in leaves), jnp.int32(0))


def timed(name, fn, reps=2):
    jf = jax.jit(lambda s, x, y, i: reduce_tree(fn(s, AffinePoints(x, y, i))))
    t0 = time.time()
    jax.device_get(jf(sc, px, py, pinf))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(sc, px, py, pinf))
        ts.append(time.time() - t0)
    print(f"{name:34s} {min(ts)*1e3:9.1f} ms   (compile+1st {tc:.1f}s)", flush=True)
    return min(ts)


# stage prefixes ---------------------------------------------------------------

def p0_prep(s, pts):
    return glv_prep(W, S, s, pts, c)


def p1_sort(s, pts):
    pts2, mags, signs, K, L = glv_prep(W, S, s, pts, c)
    ids = jnp.where(mags == 0, L, mags - 1).astype(jnp.int32)
    order, sorted_ids = sort_by_bucket(ids)
    return order, sorted_ids


def p2_gather(s, pts):
    pts2, mags, signs, K, L = glv_prep(W, S, s, pts, c)
    B = mags.shape[-1]
    ids = jnp.where(mags == 0, L, mags - 1).astype(jnp.int32)
    order, sorted_ids = sort_by_bucket(ids)
    rows = jnp.arange(K, dtype=jnp.int32)[:, None]
    sorted_signs = jnp.take(signs.reshape(-1), (order + rows * B).reshape(-1))
    P = engine._take_flat(pts2, order.reshape(-1))
    return W.from_affine(W.affine_cneg(P, sorted_signs))


def p3_accum(s, pts):
    return accumulate_glv_projective(W, S, s, pts, c)


def p4_full(s, pts):
    sums, _ = accumulate_glv_projective(W, S, s, pts, c)
    return finalize_projective_buckets(W, sums, c)


print(f"N = 2^{LOG_N}, c = {c}", flush=True)
t0 = timed("glv_prep (decompose+slice)", p0_prep)
t1 = timed("+ sort", p1_sort)
t2 = timed("+ point gather", p2_gather)
t3 = timed("+ halving levels (accumulate)", p3_accum)
t4 = timed("+ reduce + horner (full)", p4_full)
print(f"\nstage deltas: sort {t1-t0:.2f}s  gather {t2-t1:.2f}s  "
      f"levels {t3-t2:.2f}s  reduce+horner {t4-t3:.2f}s", flush=True)
