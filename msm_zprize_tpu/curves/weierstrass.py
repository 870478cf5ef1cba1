"""Vectorized short-Weierstrass curve ops (a = 0) over limb-vector fields.

TPU-native re-design of the reference's pointer-based curve layer
(`src/curve-affine.ts:63-727`, `src/curve-projective.ts:13-454`,
`src/wasm/curve.ts:26-225`): points live in struct-of-limb-arrays form
(each coordinate an ``(n, B)`` int32 array, batch in the lane dimension),
every operation processes the whole batch, and edge cases are handled with
masks instead of branches.

Coordinates are Montgomery-form field elements in [0, 2p).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..bigint.weierstrass import WeierstrassParams
from ..fields.fp import MontgomeryFp, make_field
from ..fields.limbs import DTYPE

__all__ = ["AffinePoints", "ProjectivePoints", "WeierstrassOps", "take", "select"]


class AffinePoints(NamedTuple):
    """(x, y) with an explicit infinity flag, like the reference's
    [x, y, isNonZero] layout (`curve-affine.ts:66-77`) — but flag==1 means
    *infinity* here. x: (n, B), y: (n, B), inf: (B,) int32."""

    x: jnp.ndarray
    y: jnp.ndarray
    inf: jnp.ndarray


class ProjectivePoints(NamedTuple):
    """(X, Y, Z); identity encoded as Z == 0 (canonically (0, 1, 0))."""

    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray


def take(pts, idx):
    """Gather points along the batch (last) axis by integer indices."""
    return type(pts)(*(jnp.take(a, idx, axis=-1) for a in pts))


def select(mask, a, b):
    """Per-lane select between two point batches. mask: (B,) bool."""
    return type(a)(*(jnp.where(mask, fa, fb) for fa, fb in zip(a, b)))


class WeierstrassOps:
    """Batched curve arithmetic for y^2 = x^3 + b, a = 0.

    Hot ops (proj_add / proj_double / proj_add_affine) dispatch to fused
    Pallas kernels on TPU backends for large batches (one kernel per CURVE
    op, `curves/pallas_curve.py`); elsewhere (CPU tests, tiny batches like
    the Horner tail) they run as inline jnp field ops.
    """

    def __init__(self, params: WeierstrassParams, w: int = 12):
        self.params = params
        self.F: MontgomeryFp = make_field(params.modulus, w)
        F = self.F
        self.b_mont = params.b * F.R % params.modulus
        self.b3_mont = 3 * params.b * F.R % params.modulus  # RCB formulas use 3b
        self.beta_mont = (
            params.beta * F.R % params.modulus if params.beta is not None else None
        )
        self._kernels = None

    # ---- fused-kernel dispatch -------------------------------------------

    @property
    def kernels(self):
        if self._kernels is None:
            from .pallas_curve import CurveKernels

            b3 = 3 * self.params.b
            self._kernels = CurveKernels(
                self.params.modulus, self.F.w, self.F.n, self.b3_mont, b3
            )
        return self._kernels

    @staticmethod
    def _batch_elems(*arrs):
        shape = jnp.broadcast_shapes(*(a.shape[1:] for a in arrs))
        n = 1
        for d in shape:
            n *= d
        return n

    def _use_kernels(self, *arrs) -> bool:
        """On TPU, ALWAYS dispatch curve ops to the fused kernels — even for
        tiny batches (one padded block). An inline jnp curve op traces ~4k
        HLO ops; a handful of unrolled ones (bucket-reduction tree, Horner)
        made whole-MSM XLA compiles take tens of minutes, while the fused
        kernel is one custom call with an already-compiled Mosaic body."""
        from ..fields.fp import _montmul_impl

        return _montmul_impl() == "pallas"

    # ---- representation hooks (overridden by the 51x5 storage variant) ---

    def coord_zeros(self, *batch):
        """Zero field element in this ops object's coordinate storage."""
        return self.F.zeros(*batch)

    def coord_ones(self, *batch):
        """Montgomery one in coordinate storage."""
        return self.F.ones_mont(*batch)

    def coord_cneg(self, y, flag):
        """Conditional negation in coordinate storage."""
        return self.F.cneg(y, flag)

    # ---- constructors ----------------------------------------------------

    def affine_zeros(self, B: int) -> AffinePoints:
        F = self.F
        return AffinePoints(F.zeros(B), F.zeros(B), jnp.ones(B, dtype=DTYPE))

    def proj_zeros(self, B: int) -> ProjectivePoints:
        F = self.F
        return ProjectivePoints(F.zeros(B), F.ones_mont(B), F.zeros(B))

    def pack_affine(self, points) -> AffinePoints:
        """List of oracle affine points (None = infinity) -> batch."""
        F = self.F
        xs = [0 if P is None else P[0] for P in points]
        ys = [1 if P is None else P[1] for P in points]
        inf = [1 if P is None else 0 for P in points]
        import numpy as np

        return AffinePoints(
            jnp.asarray(F.pack(xs)),
            jnp.asarray(F.pack(ys)),
            jnp.asarray(np.array(inf, dtype=np.int32)),
        )

    def unpack_affine(self, pts: AffinePoints):
        F = self.F
        xs = F.unpack(pts.x)
        ys = F.unpack(pts.y)
        inf = [int(v) for v in pts.inf]
        return [None if f else (x, y) for x, y, f in zip(xs, ys, inf)]

    def pack_projective(self, points) -> ProjectivePoints:
        F = self.F
        return ProjectivePoints(
            jnp.asarray(F.pack([P[0] for P in points])),
            jnp.asarray(F.pack([P[1] for P in points])),
            jnp.asarray(F.pack([P[2] for P in points])),
        )

    def unpack_projective(self, pts: ProjectivePoints):
        F = self.F
        return list(zip(F.unpack(pts.X), F.unpack(pts.Y), F.unpack(pts.Z)))

    # ---- projective arithmetic (complete via masks) ----------------------

    def proj_is_zero(self, P: ProjectivePoints):
        return self.F.is_zero(P.Z)

    def proj_neg(self, P: ProjectivePoints) -> ProjectivePoints:
        return ProjectivePoints(P.X, self.F.neg(P.Y), P.Z)

    def proj_double_k(self, P: ProjectivePoints, k: int) -> ProjectivePoints:
        """k chained complete doublings. On TPU this is ONE fused kernel
        invocation — the Horner tail's c-doublings-per-window otherwise pay
        ~60 us of per-invocation overhead each on tiny batches (measured
        ~8 ms of the 2^16 MSM)."""
        if k <= 0:
            return P
        if self._use_kernels(*P):
            return ProjectivePoints(*self.kernels.proj_double_k(*P, k))
        for _ in range(k):
            P = self.proj_double(P)
        return P

    def proj_double(self, P: ProjectivePoints) -> ProjectivePoints:
        """Complete doubling, Renes-Costello-Batina Alg. 9 (a = 0): 8 muls,
        branchless — handles the identity (0:1:0) without masks. Valid on
        the odd-order subgroup (exceptional cases involve 2-torsion only),
        which is the MSM domain. Replaces dbl-1998-cmo-2
        (`curve-projective.ts:202-253`) for a branch-free SIMD formulation."""
        if self._use_kernels(*P):
            return ProjectivePoints(*self.kernels.proj_double(*P))
        F = self.F
        X1, Y1, Z1 = P
        b3 = self._const(self.b3_mont, X1)
        t0 = F.montsquare(Y1)
        Z3 = F.add(t0, t0)
        Z3 = F.add(Z3, Z3)
        Z3 = F.add(Z3, Z3)
        t1 = F.montmul(Y1, Z1)
        t2 = F.montsquare(Z1)
        t2 = F.montmul(b3, t2)
        X3 = F.montmul(t2, Z3)
        Y3 = F.add(t0, t2)
        Z3 = F.montmul(t1, Z3)
        t1 = F.add(t2, t2)
        t2 = F.add(t1, t2)
        t0 = F.sub(t0, t2)
        Y3 = F.montmul(t0, Y3)
        Y3 = F.add(X3, Y3)
        t1 = F.montmul(X1, Y1)
        X3 = F.montmul(t0, t1)
        X3 = F.add(X3, X3)
        return ProjectivePoints(X3, Y3, Z3)

    def proj_add(
        self, P: ProjectivePoints, Q: ProjectivePoints, mask=None
    ) -> ProjectivePoints:
        """Complete add, Renes-Costello-Batina Alg. 7 (a = 0): 12 muls,
        fully branchless — identity, doubling, and cancellation all flow
        through the same code path (no masks, no is_zero checks). Replaces
        the masked add-1998-cmo-2 (`curve-projective.ts:51-160`).

        With ``mask`` (per-lane bool), lanes where mask==0 return P
        unchanged (folded into the fused kernel on TPU)."""
        if self._use_kernels(*P, *Q):
            return ProjectivePoints(*self.kernels.proj_add(*P, *Q, mask=mask))
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        b3 = self._const(self.b3_mont, X1)
        t0 = F.montmul(X1, X2)
        t1 = F.montmul(Y1, Y2)
        t2 = F.montmul(Z1, Z2)
        t3 = F.add(X1, Y1)
        t4 = F.add(X2, Y2)
        t3 = F.montmul(t3, t4)
        t4 = F.add(t0, t1)
        t3 = F.sub(t3, t4)
        t4 = F.add(Y1, Z1)
        X3 = F.add(Y2, Z2)
        t4 = F.montmul(t4, X3)
        X3 = F.add(t1, t2)
        t4 = F.sub(t4, X3)
        X3 = F.add(X1, Z1)
        Y3 = F.add(X2, Z2)
        X3 = F.montmul(X3, Y3)
        Y3 = F.add(t0, t2)
        Y3 = F.sub(X3, Y3)
        X3 = F.add(t0, t0)
        t0 = F.add(X3, t0)
        t2 = F.montmul(b3, t2)
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = F.montmul(b3, Y3)
        X3 = F.montmul(t4, Y3)
        t2 = F.montmul(t3, t1)
        X3 = F.sub(t2, X3)
        Y3 = F.montmul(Y3, t0)
        t1 = F.montmul(t1, Z3)
        Y3 = F.add(t1, Y3)
        t0 = F.montmul(t0, t3)
        Z3 = F.montmul(Z3, t4)
        Z3 = F.add(Z3, t0)
        out = ProjectivePoints(X3, Y3, Z3)
        if mask is not None:
            out = select(mask, out, P)
        return out

    def proj_sub(self, P, Q):
        return self.proj_add(P, self.proj_neg(Q))

    def proj_add_affine(self, P: ProjectivePoints, Q: AffinePoints) -> ProjectivePoints:
        """Complete mixed add, Renes-Costello-Batina Alg. 8 (a = 0, Z2 = 1):
        11 muls branchless in P; the only mask is Q = infinity (affine points
        carry an explicit flag). Replaces the masked mixed add."""
        if self._use_kernels(*P, Q.x, Q.y):
            return ProjectivePoints(
                *self.kernels.proj_add_mixed(*P, Q.x, Q.y, Q.inf)
            )
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2 = Q.x, Q.y
        b3 = self._const(self.b3_mont, X1)
        t0 = F.montmul(X1, X2)
        t1 = F.montmul(Y1, Y2)
        t3 = F.add(X2, Y2)
        t4 = F.add(X1, Y1)
        t3 = F.montmul(t3, t4)
        t4 = F.add(t0, t1)
        t3 = F.sub(t3, t4)
        t4 = F.montmul(Y2, Z1)
        t4 = F.add(t4, Y1)
        Y3 = F.montmul(X2, Z1)
        Y3 = F.add(Y3, X1)
        X3 = F.add(t0, t0)
        t0 = F.add(X3, t0)
        t2 = F.montmul(b3, Z1)
        Z3 = F.add(t1, t2)
        t1 = F.sub(t1, t2)
        Y3 = F.montmul(b3, Y3)
        X3 = F.montmul(t4, Y3)
        t2 = F.montmul(t3, t1)
        X3 = F.sub(t2, X3)
        Y3 = F.montmul(Y3, t0)
        t1 = F.montmul(t1, Z3)
        Y3 = F.add(t1, Y3)
        t0 = F.montmul(t0, t3)
        Z3 = F.montmul(Z3, t4)
        Z3 = F.add(Z3, t0)
        out = ProjectivePoints(X3, Y3, Z3)
        return select(Q.inf.astype(bool), P, out)

    def aff_pair_add(self, x1, y1, s1, v1, x2, y2, s2, v2) -> ProjectivePoints:
        """Complete add of two SIGNED affine slots: operand i is
        ((-1)^si * (xi, yi)) when vi, else the identity. The MSM padded
        engine's fused level-1 op — on TPU one 9-mul unit-Z kernel
        (`pallas_curve.rcb7_unitz`), folding the sign/identity encoding
        that the engine's ``prepare`` step would otherwise materialize."""
        if self._use_kernels(x1, y1, x2, y2):
            return ProjectivePoints(
                *self.kernels.aff_pair_add(x1, y1, s1, v1, x2, y2, s2, v2)
            )
        F = self.F

        def prep(x, y, s, v):
            one = F.ones_mont(*x.shape[1:])
            yv = F.cneg(y, s)
            X = jnp.where(v, x, jnp.zeros_like(x))
            Y = jnp.where(v, yv, one)
            Z = jnp.where(v, one, jnp.zeros_like(one))
            return ProjectivePoints(X, Y, Z)

        return self.proj_add(prep(x1, y1, s1, v1), prep(x2, y2, s2, v2))

    def proj_scale_const(self, k: int, P: ProjectivePoints) -> ProjectivePoints:
        """k*P for a static Python-int k (double-and-add, unrolled)."""
        R = None
        Q = P
        while k > 0:
            if k & 1:
                R = Q if R is None else self.proj_add(R, Q)
            k >>= 1
            if k:
                Q = self.proj_double(Q)
        if R is None:
            B = P.X.shape[-1]
            return self.proj_zeros(B)
        return R

    def proj_scale_dyn(self, k_limbs, P: ProjectivePoints) -> ProjectivePoints:
        """k*P for a RUNTIME scalar (the reference's `scale`,
        `curve-projective.ts:268`): masked double-and-add as ONE lax.scan
        over the limb vector's bits, LSB-first, branch-free."""
        import jax

        from ..utils.vma import pvary_like, vma_of

        n_k = k_limbs.shape[0]
        w = 12
        bits = n_k * w
        idx = jnp.arange(bits, dtype=jnp.int32)
        limb_ix = idx // w
        bit_ix = idx % w

        def body(carry, iw):
            acc, Q = carry
            li, bi = iw
            bit = ((k_limbs[li] >> bi) & 1).astype(bool)
            stepped = self.proj_add(acc, Q)
            acc = select(bit, stepped, acc)
            Q = self.proj_double(Q)
            return (acc, Q), None

        zero = self.proj_zeros(*P.X.shape[1:]) if P.X.ndim > 1 else self.proj_zeros(1)
        init = pvary_like((zero, P), vma_of(*P, k_limbs))
        (acc, _), _ = jax.lax.scan(body, init, (limb_ix, bit_ix))
        return acc

    def _scale_static_bits(self, k: int, P: ProjectivePoints) -> ProjectivePoints:
        """k*P for a STATIC k via a scan over its baked bit array — O(1)
        trace size (vs proj_scale_const's unrolled double-and-add), for
        big constants like the subgroup order or cofactor."""
        import jax
        import numpy as np

        from ..utils.vma import pvary_like, vma_of

        bits = jnp.asarray(
            np.array([(k >> i) & 1 for i in range(max(k.bit_length(), 1))],
                     dtype=np.int32)
        )

        def body(carry, bit):
            acc, Q = carry
            stepped = self.proj_add(acc, Q)
            acc = select(bit.astype(bool), stepped, acc)
            Q = self.proj_double(Q)
            return (acc, Q), None

        zero = self.proj_zeros(*P.X.shape[1:])
        init = pvary_like((zero, P), vma_of(*P))
        (acc, _), _ = jax.lax.scan(body, init, bits)
        return acc

    def is_in_subgroup(self, P: ProjectivePoints):
        """order * P == identity (`curve-projective.ts:286-320`), on device."""
        return self.proj_is_zero(self._scale_static_bits(self.params.order, P))

    def to_subgroup(self, P: ProjectivePoints) -> ProjectivePoints:
        """Cofactor-clear (`curve-affine.ts:111-139` toSubgroupInPlace)."""
        return self._scale_static_bits(self.params.cofactor, P)

    def proj_eq(self, P, Q):
        """Equality across representatives (cross-multiplied)."""
        F = self.F
        both_zero = F.is_zero(P.Z) & F.is_zero(Q.Z)
        one_zero = F.is_zero(P.Z) ^ F.is_zero(Q.Z)
        ex = F.is_equal(F.montmul(P.X, Q.Z), F.montmul(Q.X, P.Z))
        ey = F.is_equal(F.montmul(P.Y, Q.Z), F.montmul(Q.Y, P.Z))
        return both_zero | (~one_zero & ex & ey)

    def proj_is_on_curve(self, P):
        """Y^2 Z == X^3 + b Z^3 (identity lanes pass)."""
        F = self.F
        X, Y, Z = P
        lhs = F.montmul(F.montsquare(Y), Z)
        z2 = F.montsquare(Z)
        b = self._const(self.b_mont, X)
        rhs = F.add(F.montmul(F.montsquare(X), X), F.montmul(F.montmul(b, z2), Z))
        return F.is_equal(lhs, rhs) | F.is_zero(Z)

    def _const(self, mont_value: int, ref):
        import numpy as np

        c = np.array(self.F.scheme.to_limbs(mont_value), dtype=np.int32)
        c = jnp.asarray(c.reshape((self.F.n,) + (1,) * (ref.ndim - 1)))
        return jnp.broadcast_to(c, ref.shape).astype(DTYPE)

    # ---- affine <-> projective ------------------------------------------

    def to_affine(self, P: ProjectivePoints) -> AffinePoints:
        """Batch-normalize: one shared batch inversion of Z
        (`curve-affine.ts:310-342` batchNormalize)."""
        F = self.F
        inf = F.is_zero(P.Z)
        z_safe = jnp.where(inf, F.ones_mont(*P.Z.shape[1:]), P.Z)
        zi = F.batch_inverse(z_safe)
        return AffinePoints(
            F.montmul(P.X, zi), F.montmul(P.Y, zi), inf.astype(DTYPE)
        )

    def from_affine(self, P: AffinePoints) -> ProjectivePoints:
        F = self.F
        one = F.ones_mont(*P.x.shape[1:])
        z = jnp.where(P.inf.astype(bool), F.zeros(*P.x.shape[1:]), one)
        return ProjectivePoints(P.x, P.y, z)

    # ---- affine kernels (the MSM hot path) ------------------------------

    def affine_neg(self, P: AffinePoints) -> AffinePoints:
        return AffinePoints(P.x, self.F.neg(P.y), P.inf)

    def affine_cneg(self, P: AffinePoints, flag) -> AffinePoints:
        """Conditional negation per lane (sign application for signed digits)."""
        return AffinePoints(P.x, self.F.cneg(P.y, flag), P.inf)

    def endomorphism(self, P: AffinePoints) -> AffinePoints:
        """(x, y) -> (beta x, y) (`src/wasm/curve.ts:90-103`)."""
        beta = self._const(self.beta_mont, P.x)
        return AffinePoints(self.F.montmul(P.x, beta), P.y, P.inf)

    def batch_add(
        self, P: AffinePoints, Q: AffinePoints, safe: bool = True, active=None
    ) -> AffinePoints:
        """Batched affine addition R_i = P_i + Q_i with ONE shared batch
        inversion — the TPU analog of `curve-affine.ts:376-458` (batchAddNew)
        and the `addAffine` WASM kernel (`src/wasm/curve.ts:32-58`).

        safe=True handles all edge cases (doubling, cancellation, infinities)
        with masks; safe=False assumes x1 != x2 wherever both lanes are
        finite (the msmUnsafe contract, `curve-affine.ts:463-522`).

        ``active`` (B,) bool optionally marks lanes whose content is
        meaningful; inactive lanes get denominator 1 so they can never poison
        the shared inversion (their output is unspecified).
        """
        F = self.F
        x1, y1 = P.x, P.y
        x2, y2 = Q.x, Q.y
        p_inf = P.inf.astype(bool)
        q_inf = Q.inf.astype(bool)

        if safe:
            x_eq = F.is_equal(x1, x2)
            y_eq = F.is_equal(y1, y2)
            is_dbl = x_eq & y_eq & ~p_inf & ~q_inf
            is_cancel = x_eq & ~y_eq & ~p_inf & ~q_inf
            denom = jnp.where(is_dbl, F.add(y1, y1), F.sub_positive(x2, x1))
            need_inv = ~(p_inf | q_inf | is_cancel)
            if active is not None:
                need_inv = need_inv & active
            denom = jnp.where(need_inv, denom, F.ones_mont(*x1.shape[1:]))
            d = F.batch_inverse(denom)
            xx = F.montsquare(x1)
            num_dbl = F.add(F.add(xx, xx), xx)  # 3 x1^2
            num_add = F.sub_positive(y2, y1)
            num = jnp.where(is_dbl, num_dbl, num_add)
            m = F.montmul(num, d)
        else:
            denom = F.sub_positive(x2, x1)
            invalid = p_inf | q_inf
            if active is not None:
                invalid = invalid | ~active
            denom = jnp.where(invalid, F.ones_mont(*x1.shape[1:]), denom)
            d = F.batch_inverse(denom)
            m = F.montmul(F.sub_positive(y2, y1), d)
            is_cancel = jnp.zeros_like(p_inf)

        x3 = F.sub(F.sub(F.montsquare(m), x1), x2)
        y3 = F.sub(F.montmul(m, F.sub_positive(x1, x3)), y1)
        out = AffinePoints(x3, y3, jnp.zeros_like(P.inf))
        # edge-case selects
        out = select(p_inf, Q, out)
        out = select(q_inf & ~p_inf, P, out)
        inf_lane = is_cancel | (p_inf & q_inf)
        out = AffinePoints(
            out.x, out.y, jnp.where(inf_lane, 1, out.inf).astype(DTYPE)
        )
        return out

    def affine_is_on_curve(self, P: AffinePoints):
        F = self.F
        b = self._const(self.b_mont, P.x)
        rhs = F.add(F.montmul(F.montsquare(P.x), P.x), b)
        return F.is_equal(F.montsquare(P.y), rhs) | P.inf.astype(bool)
