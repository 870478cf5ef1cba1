"""Vectorized twisted-Edwards curve ops (a = -1), extended coordinates.

TPU-native re-design of `src/curve-twisted-edwards.ts:25-570`: the
strongly-unified add-2008-hwcd-3 formula is completely branchless — ideal
for SIMD lanes — so no masks are needed anywhere (identity = (0,1,1,0)
flows through the same code path).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..bigint.edwards import EdwardsParams
from ..fields.fp import MontgomeryFp, make_field
from ..fields.limbs import DTYPE

__all__ = ["ExtPoints", "EdwardsOps"]


class ExtPoints(NamedTuple):
    """Extended coordinates (X, Y, Z, T), each (n, B); x=X/Z, y=Y/Z, T=XY/Z."""

    X: jnp.ndarray
    Y: jnp.ndarray
    Z: jnp.ndarray
    T: jnp.ndarray


class EdwardsOps:
    def __init__(self, params: EdwardsParams, w: int = 12):
        self.params = params
        self.F: MontgomeryFp = make_field(params.modulus, w)
        F = self.F
        self.k_mont = 2 * params.d * F.R % params.modulus  # k = 2d
        self._kernels = None

    @property
    def kernels(self):
        if self._kernels is None:
            from .pallas_curve import EdwardsKernels

            self._kernels = EdwardsKernels(
                self.params.modulus, self.F.w, self.F.n, self.k_mont
            )
        return self._kernels

    def _use_kernels(self) -> bool:
        """On TPU, always run the unified add as a fused Pallas kernel (one
        custom call) instead of ~4k inline HLO ops — see
        `weierstrass.WeierstrassOps._use_kernels` for the rationale."""
        from ..fields.fp import _montmul_impl

        return _montmul_impl() == "pallas"

    def _const(self, mont_value: int, ref):
        c = np.array(self.F.scheme.to_limbs(mont_value), dtype=np.int32)
        c = jnp.asarray(c.reshape((self.F.n,) + (1,) * (ref.ndim - 1)))
        return jnp.broadcast_to(c, ref.shape).astype(DTYPE)

    def zeros(self, B: int) -> ExtPoints:
        F = self.F
        return ExtPoints(F.zeros(B), F.ones_mont(B), F.ones_mont(B), F.zeros(B))

    def pack(self, points) -> ExtPoints:
        """Oracle extended tuples (X, Y, Z, T) -> batch."""
        F = self.F
        return ExtPoints(*(jnp.asarray(F.pack([P[i] for P in points])) for i in range(4)))

    def unpack(self, pts: ExtPoints):
        F = self.F
        return list(
            zip(F.unpack(pts.X), F.unpack(pts.Y), F.unpack(pts.Z), F.unpack(pts.T))
        )

    def neg(self, P: ExtPoints) -> ExtPoints:
        F = self.F
        return ExtPoints(F.neg(P.X), P.Y, P.Z, F.neg(P.T))

    def cneg(self, P: ExtPoints, flag) -> ExtPoints:
        F = self.F
        return ExtPoints(F.cneg(P.X, flag), P.Y, P.Z, F.cneg(P.T, flag))

    def add(self, P: ExtPoints, Q: ExtPoints, mask=None) -> ExtPoints:
        """Strongly-unified add-2008-hwcd-3, k = 2d: 8M + 1 const-M, no
        branches, valid for doubling and identities
        (`curve-twisted-edwards.ts:84-165`). With ``mask``, lanes where
        mask==0 return P unchanged (folded into the fused kernel on TPU)."""
        if self._use_kernels():
            return ExtPoints(*self.kernels.ed_add(*P, *Q, mask=mask))
        F = self.F
        A = F.montmul(F.sub_positive(P.Y, P.X), F.sub_positive(Q.Y, Q.X))
        B_ = F.montmul(F.add(P.Y, P.X), F.add(Q.Y, Q.X))
        k = self._const(self.k_mont, P.T)
        C = F.montmul(F.montmul(P.T, k), Q.T)
        ZZ = F.montmul(P.Z, Q.Z)
        D = F.add(ZZ, ZZ)
        E = F.sub(B_, A)
        Fc = F.sub(D, C)
        G = F.add(D, C)
        H = F.add(B_, A)
        out = ExtPoints(
            F.montmul(E, Fc), F.montmul(G, H), F.montmul(Fc, G), F.montmul(E, H)
        )
        if mask is not None:
            out = ExtPoints(*(jnp.where(mask, o, a) for o, a in zip(out, P)))
        return out

    def add_mixed(self, P: ExtPoints, Q: ExtPoints) -> ExtPoints:
        """Mixed add assuming Q.Z == 1 (normalized table/base points):
        saves the Z1*Z2 multiplication (`curve-twisted-edwards.ts` mixed
        variant). On TPU the full fused-kernel add is used instead (the
        one extra multiply is cheaper than an inline HLO formula)."""
        if self._use_kernels():
            return ExtPoints(*self.kernels.ed_add(*P, *Q))
        F = self.F
        A = F.montmul(F.sub_positive(P.Y, P.X), F.sub_positive(Q.Y, Q.X))
        B_ = F.montmul(F.add(P.Y, P.X), F.add(Q.Y, Q.X))
        k = self._const(self.k_mont, P.T)
        C = F.montmul(F.montmul(P.T, k), Q.T)
        D = F.add(P.Z, P.Z)
        E = F.sub(B_, A)
        Fc = F.sub(D, C)
        G = F.add(D, C)
        H = F.add(B_, A)
        return ExtPoints(
            F.montmul(E, Fc), F.montmul(G, H), F.montmul(Fc, G), F.montmul(E, H)
        )

    def ed_pair_add(self, x1, y1, s1, v1, x2, y2, s2, v2) -> ExtPoints:
        """Fused MSM level-1 op: two SIGNED affine TE slots (Z=1; T
        reconstituted) -> extended sum; invalid slots act as the identity.
        Kernel on TPU (`pallas_curve.hwcd3_unitz`), jnp composition off it."""
        if self._use_kernels():
            return ExtPoints(*self.kernels.ed_pair_add(x1, y1, s1, v1, x2, y2, s2, v2))
        F = self.F

        def prep(x, y, s, v):
            one = F.ones_mont(*x.shape[1:])
            xs = jnp.where(v, F.cneg(x, s), jnp.zeros_like(x))
            ys = jnp.where(v, y, one)
            t = F.montmul(xs, ys)
            return ExtPoints(xs, ys, jnp.broadcast_to(one, xs.shape), t)

        return self.add(prep(x1, y1, s1, v1), prep(x2, y2, s2, v2))

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def double(self, P):
        return self.add(P, P)

    def double_k(self, P: ExtPoints, k: int) -> ExtPoints:
        """k chained unified doublings — ONE fused kernel invocation on TPU
        (see `WeierstrassOps.proj_double_k` for the launch-overhead
        rationale; the Edwards Horner tail has ~2x the window count)."""
        if k <= 0:
            return P
        if self._use_kernels():
            return ExtPoints(*self.kernels.ed_double_k(*P, k))
        for _ in range(k):
            P = self.double(P)
        return P

    def scale_const(self, k: int, P: ExtPoints) -> ExtPoints:
        R = None
        Q = P
        while k > 0:
            if k & 1:
                R = Q if R is None else self.add(R, Q)
            k >>= 1
            if k:
                Q = self.double(Q)
        if R is None:
            return self.zeros(P.X.shape[-1])
        return R

    def _scale_bits(self, bits, P: ExtPoints) -> ExtPoints:
        """Masked double-and-add over a bit array (LSB-first) as ONE
        lax.scan — O(1) trace for big constants and runtime scalars."""
        import jax

        from ..utils.vma import pvary_like, vma_of

        def body(carry, bit):
            acc, Q = carry
            stepped = self.add(acc, Q)
            acc = ExtPoints(
                *(jnp.where(bit.astype(bool), s, a) for s, a in zip(stepped, acc))
            )
            Q = self.double(Q)
            return (acc, Q), None

        zero = self.zeros(P.X.shape[-1])
        init = pvary_like((zero, P), vma_of(*P))
        (acc, _), _ = jax.lax.scan(body, init, bits)
        return acc

    def scale_dyn(self, k_limbs, P: ExtPoints) -> ExtPoints:
        """k*P for a RUNTIME scalar limb vector (`curve-twisted-edwards.ts`
        scale): per-bit masked double-and-add, branch-free."""
        w = 12
        n_k = k_limbs.shape[0]
        idx = jnp.arange(n_k * w, dtype=jnp.int32)
        bits = (k_limbs[idx // w] >> (idx % w)[:, None]) & 1  # (bits, B)
        return self._scale_bits(bits, P)

    def _static_bits(self, k: int):
        return jnp.asarray(
            np.array([(k >> i) & 1 for i in range(max(k.bit_length(), 1))],
                     dtype=np.int32)
        )

    def is_in_subgroup(self, P: ExtPoints):
        """order * P == identity, on device (cofactor ops were previously
        oracle-only; cf. `curve-twisted-edwards.ts:232-262`)."""
        return self.is_zero(self._scale_bits(self._static_bits(self.params.order), P))

    def to_subgroup(self, P: ExtPoints) -> ExtPoints:
        """Cofactor-clear on device."""
        return self._scale_bits(self._static_bits(self.params.cofactor), P)

    def is_zero(self, P):
        F = self.F
        return F.is_zero(P.X) & F.is_equal(P.Y, P.Z)

    def eq(self, P, Q):
        F = self.F
        ex = F.is_equal(F.montmul(P.X, Q.Z), F.montmul(Q.X, P.Z))
        ey = F.is_equal(F.montmul(P.Y, Q.Z), F.montmul(Q.Y, P.Z))
        return ex & ey

    def is_on_curve(self, P):
        """-X^2 + Y^2 == Z^2 + d T^2 and T Z == X Y."""
        F = self.F
        d_mont = self.params.d * F.R % F.p
        d = self._const(d_mont, P.X)
        lhs = F.sub(F.montsquare(P.Y), F.montsquare(P.X))
        rhs = F.add(F.montsquare(P.Z), F.montmul(d, F.montsquare(P.T)))
        return F.is_equal(lhs, rhs) & F.is_equal(
            F.montmul(P.T, P.Z), F.montmul(P.X, P.Y)
        )

    def batch_normalize(self, P: ExtPoints) -> ExtPoints:
        """Scale to Z = 1 with one shared batch inversion
        (`curve-twisted-edwards.ts:314-339`)."""
        F = self.F
        zi = F.batch_inverse(P.Z)
        one = F.ones_mont(*P.Z.shape[1:])
        return ExtPoints(
            F.montmul(P.X, zi), F.montmul(P.Y, zi), one, F.montmul(P.T, zi)
        )
