"""Generic MSM over any complete/unified curve group — msm-basic analog.

Capability parity with `src/msm-basic.ts:45-223`: works for projective
Weierstrass and twisted-Edwards extended points (anything with a complete
add), using signed-digit windows WITHOUT GLV. The heavy lifting lives in
`engine.py`; this module supplies the point-ops adapters.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..curves.edwards import EdwardsOps, ExtPoints
from ..curves.weierstrass import ProjectivePoints, WeierstrassOps
from ..fields.scalar import SimpleScalar, signed_digits
from . import engine
from .common import default_windows, window_size


class _ProjAcc(NamedTuple):
    """acc_ops adapter for projective-Weierstrass accumulators."""

    W: WeierstrassOps

    def zero(self, *batch):
        F = self.W.F
        return ProjectivePoints(F.zeros(*batch), F.ones_mont(*batch), F.zeros(*batch))

    def add_point(self, acc, pt, mask):
        # pt is projective with identity encoded as Z=0; complete add handles it
        return self.W.proj_add(acc, pt)

    def add(self, a, b):
        return self.W.proj_add(a, b)

    def double(self, a):
        return self.W.proj_double(a)

    def double_k(self, a, k):
        return self.W.proj_double_k(a, k)


class _EdAcc(NamedTuple):
    E: EdwardsOps

    def zero(self, *batch):
        F = self.E.F
        return ExtPoints(
            F.zeros(*batch), F.ones_mont(*batch), F.ones_mont(*batch), F.zeros(*batch)
        )

    def add_point(self, acc, pt, mask):
        return self.E.add(acc, pt)

    def add(self, a, b):
        return self.E.add(a, b)

    def double(self, a):
        return self.E.double(a)

    def double_k(self, a, k):
        return self.E.double_k(a, k)


def msm_basic_projective(
    W: WeierstrassOps, scalars, points: ProjectivePoints, scalar_bits: int, c: int | None = None
) -> ProjectivePoints:
    """MSM over projective Weierstrass points; scalars (n, B) plain limbs."""
    B = points.X.shape[-1]
    if c is None:
        c = window_size("projective", max(B.bit_length() - 1, 1))
    K = default_windows(scalar_bits, c)
    L = 1 << (c - 1)
    mags, signs = signed_digits(scalars, c, K, 12)

    acc = _ProjAcc(W)

    def prepare(P, flag):
        return ProjectivePoints(P.X, W.F.cneg(P.Y, flag), P.Z)

    def pair_add(P0, P1, has_partner, valid):
        summed = W.proj_add(P0, P1)
        return engine._select(has_partner, summed, P0)

    def zero_like(K_, L_):
        return acc.zero(K_, L_)

    sums, empty = engine.accumulate_buckets(
        points, mags, signs, L, pair_add, prepare, zero_like
    )
    c0 = max((c - 1) // 2, 1)
    per_window = engine.reduce_buckets_log(sums, c0, acc)
    return engine.horner(per_window, c, acc.add, acc.double, None, double_k=acc.double_k)


def accumulate_edwards(
    E: EdwardsOps, scalars, points: ExtPoints, scalar_bits: int, c: int
):
    """Bucket accumulation for twisted Edwards; returns ext-point bucket sums
    (identity encodes emptiness — unified adds need no mask)."""
    K = default_windows(scalar_bits, c)
    L = 1 << (c - 1)
    mags, signs = signed_digits(scalars, c, K, 12)
    acc = _EdAcc(E)

    def pair_add(P0, P1, has_partner, valid):
        summed = E.add(P0, P1)
        return engine._select(has_partner, summed, P0)

    sums, empty = engine.accumulate_buckets(
        points, mags, signs, L, pair_add, E.cneg, lambda K_, L_: acc.zero(K_, L_)
    )
    return sums, empty


def finalize_edwards(E: EdwardsOps, sums, empty, c: int) -> ExtPoints:
    # bucket sums are accumulator-typed with identity at empty buckets
    # (accumulate_buckets selects the identity; the padded engine encodes
    # it) — the log-depth weighted reduction applies
    acc = _EdAcc(E)
    c0 = max((c - 1) // 2, 1)
    per_window = engine.reduce_buckets_log(sums, c0, acc)
    return engine.horner(per_window, c, acc.add, acc.double, None, double_k=acc.double_k)


def accumulate_edwards_padded(
    E: EdwardsOps, scalars, points: ExtPoints, scalar_bits: int, c: int
):
    """Padded-layout bucket accumulation for twisted Edwards (the TPU
    default): normalize to affine (Z = 1, like the reference's
    batchNormalize'd TE points), gather only (x, y) per slot, and fuse
    sign/identity/T-reconstruction + the first tree level into the unit-Z
    hwcd kernel. ONE data-dependent gather per round (cf. the halving
    engine's ~2 per level)."""
    import os as _os

    K = default_windows(scalar_bits, c)
    L = 1 << (c - 1)
    from ..fields.fp import _montmul_impl

    if _montmul_impl() == "pallas":
        from ..fields.pallas_scalar import simple_digits_pallas

        mags, signs = simple_digits_pallas(scalars, c, K)
    else:
        mags, signs = signed_digits(scalars, c, K, 12)
    F = E.F
    pts = E.batch_normalize(points)  # Z == 1 everywhere (identity stays id)

    def prepare(leaves, sg, valid):
        x, y = leaves
        one = F.ones_mont(*y.shape[1:])
        xs = jnp.where(valid, F.cneg(x, sg), jnp.zeros_like(x))
        ys = jnp.where(valid, y, one)
        z = jnp.broadcast_to(one, xs.shape)
        t = F.montmul(xs, ys)
        return (xs, ys, z, t)

    def pair_add(a, b):
        return tuple(E.add(ExtPoints(*a), ExtPoints(*b)))

    def pair_level1(a, b, sa, sb, va, vb):
        return tuple(E.ed_pair_add(a[0], a[1], sa, va, b[0], b[1], sb, vb))

    def zero_like(K_, L_):
        return (
            F.zeros(K_, L_), F.ones_mont(K_, L_),
            F.ones_mont(K_, L_), F.zeros(K_, L_),
        )

    B2 = mags.shape[-1]
    M = engine.slot_count(B2, L)
    max_slots = int(_os.environ.get("MSM_TPU_MAX_SLOTS", str(8 << 20)))
    chunks = max(1, -(-(M * K * L) // max_slots))

    sums = engine.accumulate_buckets_padded(
        (pts.X, pts.Y), mags, signs, L, pair_add, prepare, zero_like,
        pair_level1=pair_level1, window_chunks=chunks,
    )
    empty = jnp.zeros((K, L), dtype=bool)  # identity encodes emptiness
    return ExtPoints(*sums), empty


def msm_basic_edwards(
    E: EdwardsOps, scalars, points: ExtPoints, scalar_bits: int, c: int | None = None,
    mode: str | None = None,
) -> ExtPoints:
    """MSM over twisted-Edwards extended points (the reference's production
    path for ed-on-bls12-377, `src/parallel.ts:179-289` msm via msmBasic).

    mode: "padded" (ONE gather per round + fused unit-Z level-1 kernel; the
    TPU default) or "basic" (halving engine; CPU default, worst-case O(log)
    rounds)."""
    import jax as _jax

    B = points.X.shape[-1]
    if c is None:
        c = window_size("edwards", max(B.bit_length() - 1, 1))
    if mode is None:
        mode = (
            "padded"
            if _jax.default_backend() in ("tpu", "axon")
            else "basic"
        )
    if mode == "padded":
        sums, empty = accumulate_edwards_padded(E, scalars, points, scalar_bits, c)
    else:
        sums, empty = accumulate_edwards(E, scalars, points, scalar_bits, c)
    return finalize_edwards(E, sums, empty, c)
