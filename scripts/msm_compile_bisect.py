"""Bisect MSM-program compile time phase by phase on the TPU backend.

Usage: python scripts/msm_compile_bisect.py [log_n] [c]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.curves.weierstrass import AffinePoints, ProjectivePoints
from msm_zprize_tpu.msm import engine
from msm_zprize_tpu.msm.batched_affine import (
    _ProjAcc,
    accumulate_glv_projective,
    finalize_projective_buckets,
    glv_prep,
)
from msm_zprize_tpu.msm.common import window_size
from msm_zprize_tpu.parallel.api import Weierstrass
from msm_zprize_tpu.utils.sync import sync

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
N = 1 << LOG_N


def timed(label, fn, *args):
    t0 = time.time()
    out = jax.jit(fn)(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    sync(leaf[..., :1])
    print(f"[bisect] {label}: {time.time()-t0:.1f}s", flush=True)
    return out


def main():
    curve = Weierstrass.create(BLS12_377)
    W, S = curve.ops, curve.scalar
    c = int(sys.argv[2]) if len(sys.argv) > 2 else window_size(
        "batched-affine", LOG_N
    )
    print(f"[bisect] N=2^{LOG_N} c={c}", flush=True)
    points = curve.random_points_fast(N, seed=1)
    scalars = curve.random_scalars(N, seed=7)
    sync(points.inf[:1])
    print("[bisect] inputs ready", flush=True)

    # phase 1: GLV prep (decompose + endo + digit slicing)
    from msm_zprize_tpu.msm.common import default_windows

    K = default_windows(S.max_bits, c)
    L = 1 << (c - 1)
    pts2, mags, signs, _K, _L = timed(
        "glv_prep", lambda s, px, py, pi: glv_prep(
            W, S, s, AffinePoints(px, py, pi), c
        )[:3] + (0, 0), scalars, points.x, points.y, points.inf
    )
    print(f"[bisect] K={K} L={L}", flush=True)

    # phase 2: sort + counts
    from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket

    def sort_fn(mags):
        ids = jnp.where(mags == 0, L, mags - 1).astype(jnp.int32)
        order, sorted_ids = sort_by_bucket(ids)
        counts = bucket_counts(sorted_ids, L + 1)[:, :L]
        return order, sorted_ids, counts

    order, sorted_ids, counts = timed("sort+counts", sort_fn, mags)

    # phase 3: ONE halving level at the first quantized width
    from msm_zprize_tpu.curves.weierstrass import ProjectivePoints as PP

    prj = W.from_affine(pts2)
    P0 = type(prj)(*(jnp.broadcast_to(a[..., None, :], a.shape[:-1] + (K, a.shape[-1])) for a in prj))

    def level_fn(X, Y, Z, counts):
        P = PP(X, Y, Z)
        offsets = jnp.cumsum(counts, axis=-1) - counts
        from msm_zprize_tpu.msm.common import halving_layout

        B2 = X.shape[-1]
        bucket, rank, valid, next_counts = halving_layout(counts, B2 // 2)
        base = jnp.take_along_axis(offsets, bucket, axis=-1)
        cnt = jnp.take_along_axis(counts, bucket, axis=-1)
        pos0 = jnp.clip(base + 2 * rank, 0, B2 - 1)
        pos1 = jnp.clip(base + 2 * rank + 1, 0, B2 - 1)
        has = (2 * rank + 1 < cnt) & valid
        P0_ = engine._take2(P, pos0)
        P1_ = engine._take2(P, pos1)
        return W.proj_add(P0_, P1_, mask=has)

    timed("one_level(B->B/2)", level_fn, *P0, counts)

    # phase 4: full accumulate
    sums, empty = timed(
        "accumulate", lambda s, px, py, pi: accumulate_glv_projective(
            W, S, s, AffinePoints(px, py, pi), c
        ), scalars, points.x, points.y, points.inf
    )

    # phase 5: reduce + horner
    timed(
        "finalize", lambda X, Y, Z: finalize_projective_buckets(
            W, PP(X, Y, Z), c
        ), sums.X, sums.Y, sums.Z
    )
    print("[bisect] done", flush=True)


if __name__ == "__main__":
    main()
