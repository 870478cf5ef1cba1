"""Disk cache for benchmark input points.

The reference harness keeps fixed points across timed runs
(`scripts/msm-weierstrass.ts:20-48`); generating them is setup, not MSM.
On this environment the axon backend cannot reuse in-process compiled
state across bench processes, so `random_points_fast`'s generator program
re-runs per process (~60-100 s at 2^16-2^20, dominated by trace+compile).
Caching the GENERATED POINTS (plain int32 limb arrays, keyed by
curve/N/seed) makes bench setup a ~1 s np.load; loaded points are
spot-checked on-curve before use.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

CACHE_DIR = os.environ.get(
    "MSM_TPU_POINT_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "..", ".bench_cache"),
)


def cached_random_points(curve, N: int, seed: int):
    """random_points_fast with a transparent npz disk cache + validation."""
    from ..curves.edwards import ExtPoints
    from ..curves.weierstrass import AffinePoints

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"pts_{curve.label}_{N}_{seed}.npz")
    pt_type = AffinePoints if hasattr(curve.ops, "affine_is_on_curve") else ExtPoints

    if os.path.exists(path):
        # validation inside the same guard: a stale cache with an
        # incompatible limb scheme/shape must fall through to regeneration,
        # not crash. The on-curve spot check runs on the HOST via the bigint
        # oracle — a device-side check compiles a whole kernel chain, which
        # on this backend costs ~60 s and silently defeated the cache.
        try:
            data = np.load(path)
            leaves_np = [data[f"arr_{i}"] for i in range(len(data.files))]
            # validate BEFORE any device transfer (a device_get readback of
            # the full arrays through the axon tunnel takes minutes)
            head = pt_type(*(a[..., :8] for a in leaves_np))
            if pt_type is AffinePoints:
                ok = all(
                    p is None or curve.oracle_affine.is_on_curve(p)
                    for p in curve.ops.unpack_affine(head)
                )
            else:
                ok = all(
                    curve.oracle.is_on_curve(p)
                    for p in curve.ops.unpack(head)
                )
            if ok:
                return pt_type(*(jnp.asarray(a) for a in leaves_np))
            # stale cache (e.g. limb scheme changed): fall through, refresh
        except Exception:
            pass

    import jax

    pts = curve.random_points_fast(N, seed=seed)
    jax.block_until_ready(pts)
    np.savez(path, *[np.asarray(a) for a in pts])
    return pts
