"""Multi-chip MSM: shard_map over a device mesh with ICI collectives.

TPU-native replacement for the reference's thread pool + SharedArrayBuffer
runtime (`src/threads/threads.ts`, SURVEY.md §2.7): points and scalars are
sharded over the mesh's data axis and each chip runs the full accumulation
pipeline on its slice (the SPMD analog of `pool.parallelize`).

Cross-chip combination is the analog of the reference's main-thread
chunk-sum loop (`msm-batched-affine.ts:299-327`), redesigned as in-program
collectives so partial bucket sums ride the ICI instead of round-tripping
through the host:

1. `all_to_all` over the WINDOW axis redistributes bucket partials so chip
   j owns all d chips' partials for its window slice (a reduce-scatter in
   bucket space — comm volume 1x the partial-sum data, vs d x for an
   all-gather).
2. Each chip tree-adds its d partials (log2(d) curve adds over its
   (K/d, L) slice) and runs the weighted bucket reduction for its windows
   only — the 15%-of-runtime reduction phase is now divided by d, like the
   reference's `splitBuckets` work split (`msm-common.ts:88-188`).
3. Per-window sums leave the shard_map sharded over windows (a few KB);
   the final Horner over K windows is O(K*c) curve ops and runs as a tiny
   single-device program (the analog of the reference's main-thread-only
   stage 3).

The window axis is padded to a multiple of the mesh size with identity
windows; identity window sums flow through Horner harmlessly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..curves.edwards import EdwardsOps, ExtPoints
from ..curves.weierstrass import AffinePoints, ProjectivePoints, WeierstrassOps
from ..fields.scalar import GlvScalar
from ..msm import engine
from ..msm.basic import _EdAcc, accumulate_edwards
from ..msm.batched_affine import (
    _ProjAcc,
    accumulate_batched_affine,
    accumulate_glv_projective,
)
from ..msm.common import window_size

__all__ = ["make_mesh", "make_mesh2", "msm_batched_affine_sharded", "msm_edwards_sharded"]

AXIS = "dp"
AXIS_DCN = "dcn"
AXIS_ICI = "ici"


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


def make_mesh2(dcn: int, ici: int) -> Mesh:
    """2-D (hosts x chips-per-host) mesh: the outer "dcn" axis maps to the
    slow inter-host network, the inner "ici" axis to the chip interconnect.
    The sharded MSM combines bucket partials hierarchically: full-volume
    reduce-scatter over ICI within each host, then a 1/ici-volume exchange
    over DCN across hosts (the tree the reference's flat worker pool cannot
    express, SURVEY.md §5.8). jax.make_mesh orders devices so the inner
    axis gets the physically-adjacent ones."""
    devs = jax.devices()
    assert dcn * ici <= len(devs), (dcn, ici, len(devs))
    return jax.make_mesh(
        (dcn, ici),
        (AXIS_DCN, AXIS_ICI),
        devices=devs[: dcn * ici],
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )


def _mesh_axes(mesh: Mesh) -> tuple:
    """Mesh axis names ordered outer -> inner."""
    return tuple(mesh.axis_names)


def _pad_windows(leaves, Kp: int, identity_like):
    """Pad the window axis (axis -2 of (.., K, L) leaves) to Kp with
    identity points. identity_like(k, L) -> identity leaves (.., k, L)."""
    K, L = leaves[0].shape[-2], leaves[0].shape[-1]
    if Kp == K:
        return leaves
    pad = engine.pvary_like(identity_like(Kp - K, L), engine.vma_of(*leaves))
    return tuple(
        jnp.concatenate([a, z], axis=-2) for a, z in zip(leaves, pad)
    )


def _redistribute_windows(leaves, d: int, axis: str = AXIS):
    """all_to_all bucket partials over the window axis: (.., Kp, L) per chip
    -> (.., Kp/d, d, L) where the new axis indexes SOURCE chips' partials
    for this chip's window slice (within this chip's ``axis`` group)."""
    out = []
    for a in leaves:
        r = jax.lax.all_to_all(a, axis, split_axis=a.ndim - 2,
                               concat_axis=a.ndim - 1, tiled=True)
        # received pieces are concatenated source-major on the bucket axis
        out.append(r.reshape(r.shape[:-1] + (d, r.shape[-1] // d)))
    return tuple(out)


def _hierarchical_combine(leaves, mesh: Mesh, add_fn, pt_type, identity_like):
    """Reduce-scatter bucket partials over the window axis, innermost mesh
    axis first: full-volume exchange + log-tree over ICI within a host,
    then the (1/ici)-volume exchange + tree over DCN across hosts. For a
    1-D mesh this is the single-tier combine. Returns this chip's fully
    combined (.., K_loc, L) slice."""
    K, L = leaves[0].shape[-2], leaves[0].shape[-1]
    sizes = [mesh.shape[ax] for ax in _mesh_axes(mesh)]
    prod = 1
    for s in sizes:
        prod *= s
    Kp = -(-K // prod) * prod
    leaves = _pad_windows(leaves, Kp, identity_like)
    for ax, d in reversed(list(zip(_mesh_axes(mesh), sizes))):
        if d == 1:
            continue
        leaves = _redistribute_windows(leaves, d, ax)
        leaves = tuple(_tree_add_sources(add_fn, pt_type, leaves))
    return pt_type(*leaves)


def _tree_add_sources(add_fn, pt_type, leaves):
    """Log-tree combine over the source-chip axis (axis -2 of each leaf)."""
    cur = pt_type(*leaves)
    dd = cur[0].shape[-2]
    while dd > 1:
        half = dd // 2
        left = pt_type(*(a[..., :half, :] for a in cur))
        right = pt_type(*(a[..., half : 2 * half, :] for a in cur))
        merged = add_fn(left, right)
        if dd % 2:
            odd = pt_type(*(a[..., -1:, :] for a in cur))
            first = add_fn(pt_type(*(a[..., :1, :] for a in merged)), odd)
            merged = pt_type(
                *(
                    jnp.concatenate([f, m[..., 1:, :]], axis=-2)
                    for f, m in zip(first, merged)
                )
            )
        cur = merged
        dd = half
    return pt_type(*(a[..., 0, :] for a in cur))


@lru_cache(maxsize=None)
def _sharded_affine_fns(
    W: WeierstrassOps, S: GlvScalar, mesh: Mesh, c: int, safe: bool, mode: str
):
    acc_ops = _ProjAcc(W)

    def proj_identity(k, L):
        return (W.coord_zeros(k, L), W.coord_ones(k, L), W.coord_zeros(k, L))

    def local_pipeline(s, px, py, pinf):
        pts = AffinePoints(px, py, pinf)
        if mode == "projective":
            sums, _empty = accumulate_glv_projective(W, S, s, pts, c)
            leaves = tuple(sums)
        else:
            F = W.F
            sums, empty = accumulate_batched_affine(W, S, s, pts, c, safe)
            # affine bucket sums -> projective. NOTE: the identity must be
            # the canonical (0 : 1 : 0) — the RCB complete formulas are only
            # valid for points on the curve, and (x_garbage, y, 0) is not one.
            batch = sums.x.shape[1:]
            one = F.ones_mont(*batch)
            zero = F.zeros(*batch)
            is_id = empty | sums.inf.astype(bool)
            x = jnp.where(is_id, zero, sums.x)
            y = jnp.where(is_id, one, sums.y)
            z = jnp.where(is_id, zero, one)
            leaves = (x, y, z)

        L = leaves[0].shape[-1]
        # reduce-scatter the bucket space over the window axis — ICI tier
        # within a host, then the 1/ici-volume DCN tier across hosts
        mine = _hierarchical_combine(
            leaves, mesh, lambda a, b: W.proj_add(a, b), ProjectivePoints,
            proj_identity,
        )
        # weighted bucket reduction for THIS chip's window slice only
        c0 = max((c - 1) // 2, 1)
        per_window = engine.reduce_buckets_log(mine, c0, acc_ops)
        return tuple(per_window)  # leaves (n, K_loc)

    axes = _mesh_axes(mesh)
    specs_in = (P(None, axes), P(None, axes), P(None, axes), P(axes))
    # the hierarchical combine splits the window axis innermost-axis FIRST,
    # so the first-split (inner) axis is MAJOR in the final ownership order —
    # the out spec must list axes inner-first or the reassembled window axis
    # is permuted
    axes_out = tuple(reversed(axes))
    specs_out = tuple([P(None, axes_out)] * 3)  # per-window sums, window-sharded
    acc = jax.jit(
        jax.shard_map(
            local_pipeline, mesh=mesh, in_specs=specs_in, out_specs=specs_out
        )
    )

    def horner(*leaves):
        return engine.horner(
            ProjectivePoints(*leaves), c, acc_ops.add, acc_ops.double, None,
            double_k=acc_ops.double_k
        )

    return acc, jax.jit(horner)


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
    acc, horner = _sharded_affine_fns(W, S, mesh, c, safe, mode)
    per_window = acc(scalars, points.x, points.y, points.inf)  # (n, Kp) leaves
    # the Horner tail is O(K*c) curve ops on a few-KB array: run it as a
    # tiny single-device program (the analog of main-thread-only stage 3)
    dev0 = jax.sharding.SingleDeviceSharding(mesh.devices.flat[0])
    per_window = tuple(jax.device_put(a, dev0) for a in per_window)
    return horner(*per_window)


@lru_cache(maxsize=None)
def _sharded_edwards_fns(
    E: EdwardsOps, mesh: Mesh, scalar_bits: int, c: int, mode: str
):
    F = E.F
    acc_ops = _EdAcc(E)

    def ed_identity(k, L):
        return (F.zeros(k, L), F.ones_mont(k, L), F.ones_mont(k, L), F.zeros(k, L))

    def local_pipeline(s, X, Y, Z, T):
        pts = ExtPoints(X, Y, Z, T)
        if mode == "padded":
            from ..msm.basic import accumulate_edwards_padded

            sums, _empty = accumulate_edwards_padded(E, s, pts, scalar_bits, c)
        else:
            sums, _empty = accumulate_edwards(E, s, pts, scalar_bits, c)
        leaves = tuple(sums)
        L = leaves[0].shape[-1]
        mine = _hierarchical_combine(
            leaves, mesh, lambda a, b: E.add(a, b), ExtPoints, ed_identity
        )
        c0 = max((c - 1) // 2, 1)
        per_window = engine.reduce_buckets_log(mine, c0, acc_ops)
        return tuple(per_window)

    axes = _mesh_axes(mesh)
    specs_in = tuple([P(None, axes)] * 5)
    axes_out = tuple(reversed(axes))  # inner axis splits windows first (major)
    specs_out = tuple([P(None, axes_out)] * 4)
    acc = jax.jit(
        jax.shard_map(
            local_pipeline, mesh=mesh, in_specs=specs_in, out_specs=specs_out
        )
    )

    def horner(*leaves):
        return engine.horner(
            ExtPoints(*leaves), c, acc_ops.add, acc_ops.double, None,
            double_k=acc_ops.double_k
        )

    return acc, jax.jit(horner)


def msm_edwards_sharded(
    E: EdwardsOps,
    mesh: Mesh,
    scalars,
    points: ExtPoints,
    scalar_bits: int,
    c: int | None = None,
    mode: str | None = None,
) -> ExtPoints:
    N = points.X.shape[-1]
    n_dev = mesh.devices.size
    assert N % n_dev == 0
    if c is None:
        c = window_size("edwards", max(N.bit_length() - 1, 1))
    if mode is None:
        mode = "padded" if jax.default_backend() in ("tpu", "axon") else "basic"
    acc, horner = _sharded_edwards_fns(E, mesh, scalar_bits, c, mode)
    per_window = acc(scalars, *points)
    dev0 = jax.sharding.SingleDeviceSharding(mesh.devices.flat[0])
    per_window = tuple(jax.device_put(a, dev0) for a in per_window)
    return horner(*per_window)
