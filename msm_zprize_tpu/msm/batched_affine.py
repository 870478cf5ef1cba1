"""Flagship MSM: GLV + signed digits + batched-affine bucket accumulation.

Capability parity with `src/msm-batched-affine.ts:50-588` (the reference's
ZPrize pipeline, SURVEY.md §3.2), TPU-native:

* GLV decompose doubles the point count at half the window count
  (prep-1, `:338-409`) — here a batched decompose + endomorphism map.
* signed digits halve the bucket count (`:177-200`) — `signed_digits`.
* counting sort (`:444-490`) -> argsort + derived layouts.
* batchAddNew halving rounds (`:226-270`) -> per-level wide batched-affine
  adds with ONE shared batch inversion across all windows.
* reduceBucketsColumnProjective (`:544-571`) -> block triangle/rows.
"""

from __future__ import annotations

import os as _os
from typing import NamedTuple

import jax.numpy as jnp

from ..curves.weierstrass import AffinePoints, ProjectivePoints, WeierstrassOps
from ..fields.scalar import GlvScalar, signed_digits
from . import engine
from .common import default_windows, window_size

__all__ = ["msm_batched_affine"]


class _AffineAcc(NamedTuple):
    """Projective accumulators fed by affine bucket points (mixed adds)."""

    W: WeierstrassOps

    def zero(self, *batch):
        F = self.W.F
        return ProjectivePoints(F.zeros(*batch), F.ones_mont(*batch), F.zeros(*batch))

    def add_point(self, acc, pt: AffinePoints, mask):
        return self.W.proj_add_affine(acc, pt)

    def add(self, a, b):
        return self.W.proj_add(a, b)

    def double(self, a):
        return self.W.proj_double(a)

    def double_k(self, a, k):
        return self.W.proj_double_k(a, k)


def glv_prep(W: WeierstrassOps, S: GlvScalar, scalars, points: AffinePoints, c: int):
    """Stages prep-1/prep-2: GLV decompose + endomorphism expansion (2N
    points) and signed-digit slicing of both scalar halves. Returns
    (pts2, mags, signs, K, L)."""
    K = default_windows(S.max_bits, c)
    L = 1 << (c - 1)

    # --- prep 1+2: GLV decompose + signed-digit slicing of both halves ---
    # (one fused Pallas pass on TPU; jnp reference path elsewhere — the two
    # are bit-identical and cross-checked in tests/test_pallas_scalar.py)
    from ..fields.fp import _montmul_impl

    endo = W.endomorphism(points)
    pts2 = AffinePoints(
        jnp.concatenate([points.x, endo.x], axis=-1),
        jnp.concatenate([points.y, endo.y], axis=-1),
        jnp.concatenate([points.inf, endo.inf], axis=-1),
    )
    if _montmul_impl() == "pallas" and isinstance(S, GlvScalar):
        # the fused Pallas prep kernel implements the lattice (GlvScalar)
        # algebra; other scalar modules (e.g. GlvScalarSpecialMsm) take the
        # bit-identical jnp path
        from ..fields.pallas_scalar import glv_digits_pallas

        mags, signs = glv_digits_pallas(S, scalars, c, K)
    else:
        sg0, u0, sg1, u1 = S.decompose(scalars)
        m0, s0 = signed_digits(u0, c, K, S.w, scalar_sign=sg0)
        m1, s1 = signed_digits(u1, c, K, S.w, scalar_sign=sg1)
        mags = jnp.concatenate([m0, m1], axis=-1)  # (K, 2N)
        signs = jnp.concatenate([s0, s1], axis=-1)

    # points with infinity flag never contribute: zero their digits
    inf2 = pts2.inf.astype(bool)[None, :]
    mags = jnp.where(inf2, 0, mags)
    return pts2, mags, signs, K, L


def accumulate_batched_affine(
    W: WeierstrassOps,
    S: GlvScalar,
    scalars,
    points: AffinePoints,
    c: int,
    safe: bool = True,
):
    """Stages prep-1/prep-2/accumulation: returns affine bucket sums
    (leaves (.., K, L)) plus the empty-bucket mask (K, L)."""
    pts2, mags, signs, K, L = glv_prep(W, S, scalars, points, c)

    # --- stage 1: batched-affine bucket accumulation ---
    def prepare(P, flag):
        return W.affine_cneg(P, flag)

    def pair_add(P0, P1, has_partner, valid):
        summed = W.batch_add(P0, P1, safe=safe, active=has_partner)
        return engine._select(has_partner, summed, P0)

    def zero_like(K_, L_):
        F = W.F
        return AffinePoints(
            F.zeros(K_, L_), F.zeros(K_, L_), jnp.ones((K_, L_), dtype=jnp.int32)
        )

    sums, empty = engine.accumulate_buckets(pts2, mags, signs, L, pair_add, prepare, zero_like)
    return sums, empty


def accumulate_glv_halving(
    W: WeierstrassOps,
    S: GlvScalar,
    scalars,
    points: AffinePoints,
    c: int,
):
    """GLV + signed-digit bucket accumulation with COMPLETE projective adds
    (Renes-Costello-Batina) over the halving engine: O(log) rounds even for
    adversarial digit distributions, but ~2 data-dependent gathers per
    halving level. Kept for worst-case-robust use and as the A/B baseline
    for the padded path below. Returns projective bucket sums (identity =
    Z=0 encodes emptiness)."""
    pts2, mags, signs, K, L = glv_prep(W, S, scalars, points, c)

    def prepare(A, flag):
        # affine points are gathered (2 coords + flag, not 3) and converted
        # to projective AFTER the big reorder — the gather moves 1/3 less
        return W.from_affine(W.affine_cneg(A, flag))

    def pair_add(P0, P1, has_partner, valid):
        return W.proj_add(P0, P1, mask=has_partner)

    def zero_like(K_, L_):
        F = W.F
        return ProjectivePoints(F.zeros(K_, L_), F.ones_mont(K_, L_), F.zeros(K_, L_))

    sums, empty = engine.accumulate_buckets(pts2, mags, signs, L, pair_add, prepare, zero_like)
    return sums, empty


def accumulate_glv_projective(
    W: WeierstrassOps,
    S: GlvScalar,
    scalars,
    points: AffinePoints,
    c: int,
):
    """GLV + signed-digit bucket accumulation, padded-bucket engine.

    Complete projective adds (Renes-Costello-Batina): no inversions, no
    edge-case masks, always safe — and, unlike the halving engine, only ONE
    data-dependent gather for the whole accumulation (engine.
    accumulate_buckets_padded; gathers dominate MSM time on TPU). The
    reference's batched-affine trick trades ~2x multiplies for a shared
    batch inversion per level — a CPU economy (`doc/zprize22.md:338`); on
    TPU the inversion's ~400-deep sequential multiply chain is latency, so
    the branch-free 12-mul complete add wins. Returns projective bucket
    sums (identity = Z=0 encodes emptiness) plus an all-False empty mask.
    """
    pts2, mags, signs, K, L = glv_prep(W, S, scalars, points, c)

    def prepare(leaves, flag, valid):
        x, y = leaves
        y = W.coord_cneg(y, flag)
        one = W.coord_ones(*y.shape[1:])
        # exact identity (0 : 1 : 0) on invalid lanes — RCB completeness
        # requires inputs to be curve points, and clamped-gather garbage
        # with Z=0 is not one
        x = jnp.where(valid, x, jnp.zeros_like(x))
        y = jnp.where(valid, y, one)
        z = jnp.where(valid, one, jnp.zeros_like(one))
        return (x, y, z)

    def pair_add(a, b):
        out = W.proj_add(ProjectivePoints(*a), ProjectivePoints(*b))
        return tuple(out)

    def zero_like(K_, L_):
        return (
            W.coord_zeros(K_, L_),
            W.coord_ones(K_, L_),
            W.coord_zeros(K_, L_),
        )

    def pair_level1(a, b, sa, sb, va, vb):
        return tuple(W.aff_pair_add(a[0], a[1], sa, va, b[0], b[1], sb, vb))

    # stream the window axis when the (M, K, L) slot buffers would blow
    # HBM: chunk count sized so one chunk's slots stay under MSM_TPU_MAX_SLOTS
    # lanes (~8M slots ~= 5 GB of gather+tree buffers on the native track)
    B2 = mags.shape[-1]
    M = engine.slot_count(B2, L)
    max_slots = int(_os.environ.get("MSM_TPU_MAX_SLOTS", str(8 << 20)))
    chunks = max(1, -(-(M * K * L) // max_slots))

    # per-window occupancy equalization is handled inside the engine
    # (data-derived spread factors; see accumulate_buckets_padded)
    sums = engine.accumulate_buckets_padded(
        (pts2.x, pts2.y), mags, signs, L, pair_add, prepare, zero_like,
        pair_level1=pair_level1, window_chunks=chunks,
    )
    empty = jnp.zeros((K, L), dtype=bool)  # Z=0 encodes emptiness
    return ProjectivePoints(*sums), empty


def finalize_affine_buckets(W: WeierstrassOps, sums, empty, c: int) -> ProjectivePoints:
    """Stages 2+3: bucket reduction (projective accumulators fed by affine
    buckets via mixed adds) + horner. Returns a (.., 1)-batched projective
    point."""
    acc = _AffineAcc(W)
    c0 = max((c - 1) // 2, 1)
    per_window = engine.reduce_buckets(sums, empty, c0, acc)
    return engine.horner(per_window, c, acc.add, acc.double, None, double_k=acc.double_k)


class _ProjAcc(NamedTuple):
    """Projective accumulators fed by projective bucket points (used on the
    multi-chip path, where cross-chip combination leaves buckets projective).
    Representation-agnostic: works for native and 51x5 coordinate storage."""

    W: WeierstrassOps

    def zero(self, *batch):
        W = self.W
        return ProjectivePoints(
            W.coord_zeros(*batch), W.coord_ones(*batch), W.coord_zeros(*batch)
        )

    def add_point(self, acc, pt, mask):
        return self.W.proj_add(acc, pt)

    def add(self, a, b):
        return self.W.proj_add(a, b)

    def double(self, a):
        return self.W.proj_double(a)

    def double_k(self, a, k):
        return self.W.proj_double_k(a, k)


def finalize_projective_buckets(W: WeierstrassOps, sums_proj, c: int) -> ProjectivePoints:
    """Reduction + horner when bucket sums are already projective (identity
    encoded as Z=0, so no separate empty mask is needed)."""
    acc = _ProjAcc(W)
    c0 = max((c - 1) // 2, 1)
    per_window = engine.reduce_buckets_log(sums_proj, c0, acc)
    return engine.horner(per_window, c, acc.add, acc.double, None, double_k=acc.double_k)


def msm_batched_affine(
    W: WeierstrassOps,
    S: GlvScalar,
    scalars,
    points: AffinePoints,
    c: int | None = None,
    safe: bool = True,
    mode: str = "affine",
) -> ProjectivePoints:
    """scalars: (n_scalar, N) plain limbs in [0, q); points: affine batch (N).

    Returns the MSM result as a single projective point (batch size 1).
    safe=False is the msmUnsafe contract: all effective points distinct
    (only meaningful for mode="affine"; projective adds are always complete).
    mode: "affine" = batched-affine adds with shared batch inversion per
    halving level (the reference's flagship economy); "projective" =
    complete 12-mul adds via the padded-bucket engine (one gather total,
    the TPU default); "halving" = complete adds over the halving engine
    (O(log) rounds even for adversarial digit distributions).
    """
    N = points.x.shape[-1]
    if c is None:
        c = window_size("batched-affine", max(N.bit_length() - 1, 1))
    if mode == "projective":
        sums, _empty = accumulate_glv_projective(W, S, scalars, points, c)
        return finalize_projective_buckets(W, sums, c)
    if mode == "halving":
        sums, _empty = accumulate_glv_halving(W, S, scalars, points, c)
        return finalize_projective_buckets(W, sums, c)
    sums, empty = accumulate_batched_affine(W, S, scalars, points, c, safe)
    return finalize_affine_buckets(W, sums, empty, c)
