"""Multi-chip MSM: shard_map over a device mesh.

TPU-native replacement for the reference's thread pool + SharedArrayBuffer
runtime (`src/threads/threads.ts`, SURVEY.md §2.7): points and scalars are
sharded over the mesh's data axis, each chip runs the full accumulation
pipeline on its slice (the SPMD analog of `pool.parallelize`), per-chip
bucket sums are combined with a log-tree of curve adds (replacing the
main-thread chunk-sum loop, `msm-batched-affine.ts:299-327`), and the cheap
reduction/horner tail runs replicated (the analog of main-thread stage 3).

The pipeline is split into two jitted programs (sharded accumulate /
combine+finalize) — keeping the SPMD partitioner's job trivial and letting
the tail reuse its compilation across mesh sizes.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.edwards import EdwardsOps, ExtPoints
from ..curves.weierstrass import AffinePoints, ProjectivePoints, WeierstrassOps
from ..fields.scalar import GlvScalar
from ..msm.basic import accumulate_edwards, finalize_edwards
from ..msm.batched_affine import (
    accumulate_batched_affine,
    accumulate_glv_projective,
    finalize_projective_buckets,
)
from ..msm.common import window_size

__all__ = ["make_mesh", "msm_batched_affine_sharded", "msm_edwards_sharded"]

AXIS = "dp"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh(
        (len(devs),),
        (AXIS,),
        devices=devs,
        axis_types=(jax.sharding.AxisType.Auto,),
    )


def _tree_reduce_axis0(add_fn, pts):
    """Log-tree combine over a leading (device) axis of point leaves.

    Leaves arrive as (d, n, *batch); curve ops expect limbs-first, so the
    device axis is moved to the END (a trailing batch axis) and halved."""
    pts = type(pts)(*(jnp.moveaxis(a, 0, -1) for a in pts))
    d = pts[0].shape[-1]
    while d > 1:
        half = d // 2
        left = type(pts)(*(a[..., :half] for a in pts))
        right = type(pts)(*(a[..., half : 2 * half] for a in pts))
        merged = add_fn(left, right)
        if d % 2:
            odd = type(pts)(*(a[..., -1:] for a in pts))
            first = add_fn(type(merged)(*(a[..., :1] for a in merged)), odd)
            merged = type(merged)(
                *(
                    jnp.concatenate([f, m[..., 1:]], axis=-1)
                    for f, m in zip(first, merged)
                )
            )
        pts = merged
        d = half
    return type(pts)(*(a[..., 0] for a in pts))


@lru_cache(maxsize=None)
def _sharded_affine_fns(
    W: WeierstrassOps, S: GlvScalar, mesh: Mesh, c: int, safe: bool, mode: str
):
    def local_accumulate(s, px, py, pinf):
        pts = AffinePoints(px, py, pinf)
        if mode == "projective":
            sums, _empty = accumulate_glv_projective(W, S, s, pts, c)
            return sums.X[None], sums.Y[None], sums.Z[None]
        sums, empty = accumulate_batched_affine(W, S, s, pts, c, safe)
        # affine bucket sums -> projective. NOTE: the identity must be the
        # canonical (0 : 1 : 0) — the RCB complete formulas are only valid
        # for points on the curve, and (x_garbage, y, 0) is not one.
        F = W.F
        batch = sums.x.shape[1:]
        one = F.ones_mont(*batch)
        zero = F.zeros(*batch)
        is_id = empty | sums.inf.astype(bool)
        x = jnp.where(is_id, zero, sums.x)
        y = jnp.where(is_id, one, sums.y)
        z = jnp.where(is_id, zero, one)
        # leading device axis of size 1 per shard
        return x[None], y[None], z[None]

    specs_in = (P(None, AXIS), P(None, AXIS), P(None, AXIS), P(AXIS))
    specs_out = (P(AXIS), P(AXIS), P(AXIS))
    acc = jax.jit(
        jax.shard_map(
            local_accumulate,
            mesh=mesh,
            in_specs=specs_in,
            out_specs=specs_out,
            check_vma=False,
        )
    )

    def combine(gx, gy, gz):
        pts = ProjectivePoints(gx, gy, gz)
        total = _tree_reduce_axis0(lambda a, b: W.proj_add(a, b), pts)
        return finalize_projective_buckets(W, total, c)

    return acc, jax.jit(combine)


def msm_batched_affine_sharded(
    W: WeierstrassOps,
    S: GlvScalar,
    mesh: Mesh,
    scalars,
    points: AffinePoints,
    c: int | None = None,
    safe: bool = True,
    mode: str = "affine",
) -> ProjectivePoints:
    """Flagship MSM over a device mesh; N must divide by the mesh size.

    scalars: (n_scalar, N); points: affine (N). Returns a projective result
    with batch 1.
    """
    N = points.x.shape[-1]
    n_dev = mesh.devices.size
    assert N % n_dev == 0, "pad N to a multiple of the mesh size"
    if c is None:
        c = window_size("batched-affine", max(N.bit_length() - 1, 1))
    acc, combine = _sharded_affine_fns(W, S, mesh, c, safe, mode)
    gx, gy, gz = acc(scalars, points.x, points.y, points.inf)  # (d, n, K, L)
    # pull per-chip partials onto one device for the cheap tail (the analog
    # of the reference's main-thread-only stage 3) — keeps the tail's
    # compilation single-device instead of invoking the SPMD partitioner
    dev0 = jax.sharding.SingleDeviceSharding(mesh.devices.flat[0])
    gx, gy, gz = (jax.device_put(a, dev0) for a in (gx, gy, gz))
    return combine(gx, gy, gz)


def msm_edwards_sharded(
    E: EdwardsOps,
    mesh: Mesh,
    scalars,
    points: ExtPoints,
    scalar_bits: int,
    c: int | None = None,
) -> ExtPoints:
    N = points.X.shape[-1]
    n_dev = mesh.devices.size
    assert N % n_dev == 0
    if c is None:
        c = window_size("edwards", max(N.bit_length() - 1, 1))

    acc, combine = _sharded_edwards_fns(E, mesh, scalar_bits, c)
    leaves = acc(scalars, *points)
    dev0 = jax.sharding.SingleDeviceSharding(mesh.devices.flat[0])
    leaves = tuple(jax.device_put(a, dev0) for a in leaves)
    return combine(*leaves)


@lru_cache(maxsize=None)
def _sharded_edwards_fns(E: EdwardsOps, mesh: Mesh, scalar_bits: int, c: int):
    def local_accumulate(s, X, Y, Z, T):
        pts = ExtPoints(X, Y, Z, T)
        sums, _empty = accumulate_edwards(E, s, pts, scalar_bits, c)
        return tuple(a[None] for a in sums)

    specs_in = tuple([P(None, AXIS)] * 5)
    specs_out = tuple([P(AXIS)] * 4)
    acc = jax.jit(
        jax.shard_map(
            local_accumulate,
            mesh=mesh,
            in_specs=specs_in,
            out_specs=specs_out,
            check_vma=False,
        )
    )

    def combine(*leaves):
        pts = ExtPoints(*leaves)
        total = _tree_reduce_axis0(lambda a, b: E.add(a, b), pts)
        K, L = total.X.shape[-2], total.X.shape[-1]
        empty = jnp.zeros((K, L), dtype=bool)
        return finalize_edwards(E, total, empty, c)

    return acc, jax.jit(combine)
