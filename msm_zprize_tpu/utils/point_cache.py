"""Benchmark input points: deterministic on-device regeneration.

The reference harness keeps fixed points across timed runs
(`scripts/msm-weierstrass.ts:20-48`); generating them is setup, not MSM.
Round-4 cached the GENERATED POINTS as npz — but writing that cache reads
the full arrays back through the axon tunnel (~3.4 MB/s measured), which
at 2^21 is ~550 MB ≈ minutes, and the real cost turned out to be XLA
compile of the generator program (111.8 s at 2^16; execution is 4 ms).
Round 5 instead AOT-caches the generator itself (`random_points_fast` uses
`utils.aot_cache`), so regeneration per process is ~1 s host table build +
AOT load + ms-scale execution, points never leave the device, and the
fixed seed keeps them deterministic across processes.

A legacy npz cache (if present from an earlier round) is still honored —
loading is cheap; only writing was pathological — but new caches are not
written.
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
    """Deterministic benchmark points for (curve, N, seed); device-resident."""
    from ..curves.edwards import ExtPoints
    from ..curves.weierstrass import AffinePoints

    path = os.path.join(CACHE_DIR, f"pts_{curve.label}_{N}_{seed}.npz")
    pt_type = AffinePoints if hasattr(curve.ops, "affine_is_on_curve") else ExtPoints

    if os.path.exists(path):
        # legacy npz from an earlier round: validate a head slice on the
        # HOST via the bigint oracle (a stale cache with an incompatible
        # limb scheme must fall through to regeneration, not crash)
        try:
            data = np.load(path)
            leaves_np = [data[f"arr_{i}"] for i in range(len(data.files))]
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
        except Exception:
            pass

    import jax

    pts = curve.random_points_fast(N, seed=seed)
    jax.block_until_ready(pts)
    return pts
