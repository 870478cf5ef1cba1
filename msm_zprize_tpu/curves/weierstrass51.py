"""Short-Weierstrass curve ops over 51x5 pair-row coordinate storage.

The device-side 51x5 track (BASELINE config #5): points live in the
reference's 5 x 51-bit limb representation — here as (10, B) int32
(26, 25)-bit pair rows, `fields/fma51_pallas.Fma51Codec` — end to end
through the MSM. All curve arithmetic runs in the fused Pallas kernels of
`curves/pallas_curve.py` parameterized with the codec: coordinates are
decoded to the hardware-exact w=12 digit form at the kernel boundary and
re-encoded on write (the "split until products are exact" discipline of
the reference's no-FMA 51x5 variants, `src/51x5/fma.ts:618-707`, with the
TPU's 24-bit multiplier setting the split width).

Valid for p < 2^255 - 2^206 (`src/51x5/field.ts:15-18`) — i.e. the Pallas
curve and other <255-bit fields; BLS12-377/381 stay on the native track.

Implements exactly the surface `msm.batched_affine`'s projective pipeline
needs (glv_prep / accumulate_glv_projective / finalize), so
`Weierstrass.msm(..., mode="fma51")` can run the flagship MSM with 51x5
point storage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.field import montgomery_params
from ..bigint.weierstrass import WeierstrassParams
from ..fields.fma51_pallas import Fma51Codec
from ..fields.pallas_field import FieldCtx
from .pallas_curve import CurveKernels
from .weierstrass import AffinePoints, ProjectivePoints

__all__ = ["Fma51WeierstrassOps", "PackedWeierstrassOps"]


class Fma51WeierstrassOps:
    """Curve ops with row-codec coordinate storage; kernel-only compute.

    Default codec is the 51x5 pair layout (`Fma51Codec`); pass any row
    codec — `PackedWeierstrassOps` below instantiates the dense 31-bit-row
    variant that works for every field size."""

    def __init__(self, params: WeierstrassParams, w: int = 12,
                 interpret: bool | None = None, codec=None):
        p = params.modulus
        self.params = params
        self.codec = Fma51Codec(p) if codec is None else codec
        mp = montgomery_params(p, w, 4)
        self.w, self.n = w, mp.n
        self.ctx = FieldCtx(p, w, mp.n)
        self.R = mp.R
        self.p = p
        self.b3_mont = 3 * params.b * mp.R % p
        self.beta_mont = (
            params.beta * mp.R % p if params.beta is not None else None
        )
        if interpret is None:
            # interpret-mode kernels off-TPU so the same path runs in tests
            interpret = jax.default_backend() not in ("tpu", "axon")
        self.kernels = CurveKernels(
            p, w, mp.n, self.b3_mont, 3 * params.b,
            interpret=interpret, codec=self.codec,
        )
        self._one_rows = np.asarray(self.codec.pack([mp.R_mod_p]))  # (10, 1)
        self._beta_rows = (
            np.asarray(self.codec.pack([self.beta_mont]))
            if self.beta_mont is not None
            else None
        )

    # ---- representation hooks (same contract as WeierstrassOps) ----------

    def coord_zeros(self, *batch):
        return jnp.zeros((self.codec.rows,) + tuple(batch), dtype=jnp.int32)

    def coord_ones(self, *batch):
        one = jnp.asarray(self._one_rows).reshape(
            (self.codec.rows,) + (1,) * len(batch)
        )
        return jnp.broadcast_to(one, (self.codec.rows,) + tuple(batch))

    def coord_cneg(self, y, flag):
        """XLA-level conditional negation on pair rows (glue path only; the
        hot path folds negation into the aff_pair kernel): via digits."""
        d = self.codec.to_digits(self.ctx, y)
        tp = jnp.asarray(
            np.array(
                [(2 * self.p >> (self.w * i)) & self.ctx.mask for i in range(self.n)],
                dtype=np.int32,
            ).reshape((self.n,) + (1,) * (y.ndim - 1))
        )
        # 2p - y (y < 2p): sequential borrow-free since 2p >= y
        cols = tp - d
        out, carry = [], jnp.zeros_like(d[0])
        for i in range(self.n):
            t = cols[i] + carry
            out.append(t & self.ctx.mask)
            carry = t >> self.w
        neg = jnp.stack(out, axis=0)
        negp = self.codec.from_digits(self.ctx, neg, 2 * self.p - 1)
        # y == 0 negates to itself (2p - 0 = 2p would be one past the
        # [0, 2p) storage contract); unreachable for subgroup points but
        # keeps the bound claim sound
        is_zero = ~jnp.any(d != 0, axis=0)
        return jnp.where(flag & ~is_zero, negp, y)

    # ---- native-layout interop ------------------------------------------

    def from_native(self, digits, vmax: int | None = None):
        """(n, *batch) canonical w-bit digit planes -> (10, *batch) pairs."""
        return self.codec.from_digits(
            self.ctx, digits, 2 * self.p - 1 if vmax is None else vmax
        )

    def to_native(self, pairs):
        """(10, *batch) pairs -> (n, *batch) canonical digit planes."""
        return self.codec.to_digits(self.ctx, pairs)

    # ---- curve ops (kernel-only) -----------------------------------------

    def proj_add(self, P: ProjectivePoints, Q: ProjectivePoints, mask=None):
        return ProjectivePoints(*self.kernels.proj_add(*P, *Q, mask=mask))

    def proj_double(self, P: ProjectivePoints):
        return ProjectivePoints(*self.kernels.proj_double(*P))

    def proj_double_k(self, P: ProjectivePoints, k: int):
        """k chained doublings in one kernel (launch-overhead fix for the
        Horner tail; see WeierstrassOps.proj_double_k)."""
        if k <= 0:
            return P
        return ProjectivePoints(*self.kernels.proj_double_k(*P, k))

    def proj_add_affine(self, P: ProjectivePoints, Q: AffinePoints):
        return ProjectivePoints(
            *self.kernels.proj_add_mixed(*P, Q.x, Q.y, Q.inf)
        )

    def aff_pair_add(self, x1, y1, s1, v1, x2, y2, s2, v2) -> ProjectivePoints:
        return ProjectivePoints(
            *self.kernels.aff_pair_add(x1, y1, s1, v1, x2, y2, s2, v2)
        )

    def endomorphism(self, P: AffinePoints) -> AffinePoints:
        """(x, y) -> (beta*x, y): ONE Montgomery mul by the baked constant,
        via the 51x5 mul kernel."""
        from ..fields.fma51_pallas import montmul51_pallas

        beta = jnp.asarray(self._beta_rows)
        bx = montmul51_pallas(
            self.p, P.x, beta, interpret=self.kernels.interpret,
            codec=self.codec,
        )
        return AffinePoints(bx, P.y, P.inf)

    # ---- I/O -------------------------------------------------------------

    def pack_affine(self, points) -> AffinePoints:
        """Oracle affine points (None = infinity) -> 51x5 pair batch
        (Montgomery form, canonical [0, p))."""
        xs = [0 if P is None else P[0] * self.R % self.p for P in points]
        ys = [1 if P is None else P[1] * self.R % self.p for P in points]
        inf = np.array([1 if P is None else 0 for P in points], dtype=np.int32)
        return AffinePoints(
            jnp.asarray(self.codec.pack(xs)),
            jnp.asarray(self.codec.pack(ys)),
            jnp.asarray(inf),
        )

    def unpack_projective(self, pts: ProjectivePoints):
        r_inv = pow(self.R, -1, self.p)

        def un(a):
            return [v * r_inv % self.p for v in self.codec.unpack(a)]

        return list(zip(un(pts.X), un(pts.Y), un(pts.Z)))


class PackedWeierstrassOps(Fma51WeierstrassOps):
    """Curve ops over the dense 31-bit-row storage (`PackedCodec`): the
    minimum-HBM-bandwidth format, valid for every field size (13 rows for
    377-bit coordinates vs 32 native digit planes). Same fused kernels,
    decode/encode at the kernel boundary."""

    def __init__(self, params: WeierstrassParams, w: int = 12,
                 interpret: bool | None = None):
        from ..fields.fma51_pallas import PackedCodec

        super().__init__(
            params, w, interpret=interpret, codec=PackedCodec(params.modulus)
        )
