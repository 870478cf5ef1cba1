"""Top-level curve API — the analog of `src/parallel.ts` + `src/concrete/*.ts`.

`Weierstrass.create(params)` / `TwistedEdwards.create(params)` assemble the
field engine, scalar modules, vectorized curve ops, and MSM pipelines into
one object with the reference's `Parallel` surface
(`parallel.ts:135-145, 251-259`): msm / msmUnsafe / msmProjective /
randomPointsFast / randomScalars / point+scalar I/O. Instead of
startThreads(n), multi-chip execution is requested per call by passing a
`jax.sharding.Mesh` (see `parallel.mesh`).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.edwards import EdwardsCurve, EdwardsParams
from ..bigint.weierstrass import AffineCurve, ProjectiveCurve, WeierstrassParams
from ..curves.edwards import EdwardsOps, ExtPoints
from ..curves.weierstrass import AffinePoints, ProjectivePoints, WeierstrassOps
from ..fields import limbs as L
from ..fields.scalar import SimpleScalar, make_glv_scalar
from ..msm.basic import msm_basic_edwards, msm_basic_projective
from ..msm.batched_affine import msm_batched_affine
from . import mesh as mesh_mod

__all__ = ["Weierstrass", "TwistedEdwards"]

import os as _os


def _default_mode() -> str:
    """Flagship accumulation mode: "affine" (batched-affine + shared batch
    inversion, the reference's CPU economy, `doc/zprize22.md:338-341`) or
    "projective" (complete 12-mul adds via fused Pallas kernels, zero
    inversions). On TPU backends projective wins: the batch inversion's
    ~400-deep sequential multiply chain per halving level is pure latency,
    while the complete adds run at VPU throughput. Overridable via
    MSM_TPU_MODE for benchmarking."""
    env = _os.environ.get("MSM_TPU_MODE")
    if env:
        return env
    return "projective" if jax.default_backend() in ("tpu", "axon") else "affine"


class Weierstrass:
    """Full curve module for a short-Weierstrass curve with GLV endomorphism."""

    def __init__(self, params: WeierstrassParams, w: int = 12):
        self.params = params
        self.ops = WeierstrassOps(params, w)
        self.scalar = make_glv_scalar(params.order, params.lambda_, w)
        self.simple_scalar = SimpleScalar(params.order, w)
        self.oracle_affine = AffineCurve(params)
        self.oracle_projective = ProjectiveCurve(params)
        self.label = params.label
        self._jit_cache: dict = {}

    _instances: dict = {}

    @classmethod
    def create(cls, params: WeierstrassParams, w: int = 12) -> "Weierstrass":
        key = (params.label, w)
        if key not in cls._instances:
            cls._instances[key] = cls(params, w)
        return cls._instances[key]

    # ---- I/O (pointsFromBytes / scalarsFromBytes analogs) ----------------

    def scalars_from_ints(self, scalars) -> jnp.ndarray:
        return jnp.asarray(self.scalar.pack(scalars))

    def points_from_ints(self, points) -> AffinePoints:
        """points: list of (x, y) int tuples or None for infinity."""
        return self.ops.pack_affine(points)

    def result_to_int(self, res: ProjectivePoints):
        """Projective device result -> affine (x, y) int tuple or None."""
        [p] = self.ops.unpack_projective(res)
        return self.oracle_projective.to_affine(p)

    # ---- MSM -------------------------------------------------------------

    def _pad(self, scalars, points: AffinePoints, multiple: int = 1):
        """Pad N up to a power of two (>= 8, and a multiple of ``multiple``)
        so compiled shapes are reused across nearby sizes; padding points are
        infinity with zero scalars (no contribution)."""
        N = points.x.shape[-1]
        target = max(8, multiple)
        while target < N:
            target *= 2
        while target % multiple:
            target *= 2
        if target == N:
            return scalars, points
        pad = target - N
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
        points = AffinePoints(
            jnp.pad(points.x, ((0, 0), (0, pad))),
            jnp.pad(points.y, ((0, 0), (0, pad))),
            jnp.pad(points.inf, (0, pad), constant_values=1),
        )
        return scalars, points

    @property
    def ops51(self):
        """51x5-storage curve ops (only for p < 2^255 - 2^206; BASELINE
        config #5 — the Pallas curve's float-limb track on device)."""
        if getattr(self, "_ops51", None) is None:
            from ..curves.weierstrass51 import Fma51WeierstrassOps

            self._ops51 = Fma51WeierstrassOps(self.params)
        return self._ops51

    @property
    def ops_packed(self):
        """Dense 31-bit-row storage curve ops (any field size): the MSM
        engine's gather/tree transfers move ~2.5x less HBM than native
        digit planes (mode="packed")."""
        if getattr(self, "_ops_packed", None) is None:
            from ..curves.weierstrass51 import PackedWeierstrassOps

            self._ops_packed = PackedWeierstrassOps(self.params)
        return self._ops_packed

    def _codec_ops(self, mode: str):
        return self.ops51 if mode == "fma51" else self.ops_packed

    def _jitted_msm(self, c: int | None, safe: bool, mode: str):
        key = ("msm", c, safe, mode)
        if key not in self._jit_cache:
            if mode in ("fma51", "packed"):
                Wc = self._codec_ops(mode)

                def fn(s, px, py, pinf):
                    pts = AffinePoints(
                        Wc.from_native(px), Wc.from_native(py), pinf
                    )
                    res = msm_batched_affine(
                        Wc, self.scalar, s, pts, c, safe=safe, mode="projective"
                    )
                    return ProjectivePoints(
                        *(Wc.to_native(a) for a in res)
                    )

            else:

                def fn(s, px, py, pinf):
                    return msm_batched_affine(
                        self.ops, self.scalar, s, AffinePoints(px, py, pinf), c,
                        safe=safe, mode=mode,
                    )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def msm(
        self,
        scalars,
        points: AffinePoints,
        c: int | None = None,
        mesh=None,
        mode: str | None = None,
    ):
        """Safe MSM (handles duplicate points). scalars (n, N) limb array."""
        mode = mode or _default_mode()
        mult = mesh.devices.size if mesh is not None else 1
        scalars, points = self._pad(scalars, points, mult)
        if mesh is not None:  # mesh path manages its own (cached) jits
            return self._mesh_msm(scalars, points, c, True, mode, mesh)
        fn = self._jitted_msm(c, True, mode)
        return fn(scalars, points.x, points.y, points.inf)

    def _mesh_msm(self, scalars, points, c, safe, mode, mesh):
        if mode in ("fma51", "packed"):
            Wc = self._codec_ops(mode)
            ptsc = AffinePoints(
                Wc.from_native(points.x), Wc.from_native(points.y), points.inf
            )
            res = mesh_mod.msm_batched_affine_sharded(
                Wc, self.scalar, mesh, scalars, ptsc, c,
                safe=safe, mode="projective",
            )
            return ProjectivePoints(*(Wc.to_native(a) for a in res))
        return mesh_mod.msm_batched_affine_sharded(
            self.ops, self.scalar, mesh, scalars, points, c, safe=safe, mode=mode
        )

    def msm_unsafe(
        self,
        scalars,
        points: AffinePoints,
        c: int | None = None,
        mesh=None,
        mode: str | None = None,
    ):
        """Fast path assuming all effective points distinct
        (`msmUnsafe`, `msm-batched-affine.ts:74-82`). With mode="projective"
        the complete formulas make this identical to the safe path."""
        mode = mode or _default_mode()
        mult = mesh.devices.size if mesh is not None else 1
        scalars, points = self._pad(scalars, points, mult)
        if mesh is not None:
            return self._mesh_msm(scalars, points, c, False, mode, mesh)
        fn = self._jitted_msm(c, False, mode)
        return fn(scalars, points.x, points.y, points.inf)

    def msm_projective(self, scalars, points: ProjectivePoints, c: int | None = None):
        """Generic-curve MSM on projective inputs (`msmProjective`,
        `parallel.ts:69-87`): no GLV, no batched-affine — robustness baseline."""
        return msm_basic_projective(
            self.ops, scalars, points, self.simple_scalar.bits, c
        )

    def msm_bigint(self, scalars, points, c: int | None = None):
        """Convenience: Python ints in, affine int point out (analog of
        `msmBigint`, `msm-batched-affine-single-thread.ts:143-169`)."""
        s = self.scalars_from_ints(scalars)
        p = self.points_from_ints(points)
        return self.result_to_int(self.msm(s, p, c))

    # ---- random inputs (curve-random.ts analogs) -------------------------

    def random_scalars(self, N: int, seed: int = 0) -> jnp.ndarray:
        """Uniform scalars in [0, q) via vectorized host-side rejection
        sampling (`createRandomScalars`, `curve-random.ts:151-194`)."""
        from ..fields.bytes_codec import random_uniform_limbs

        rng = np.random.default_rng(seed)
        return jnp.asarray(
            random_uniform_limbs(rng, self.params.order, N, self.scalar.scheme)
        )

    def random_points_fast(self, N: int, seed: int = 0, entropy_bits: int = 64, c: int = 8) -> AffinePoints:
        """Fast non-hiding random points (`createRandomPointsFast`,
        `curve-random.ts:14-92`): K = ceil(entropy/c) random base points, a
        2^c-entry multiple table per base, each output point a sum of one
        entry per table, batch-normalized.

        The multiple tables are built host-side with the bigint oracle (the
        setup is O(K*2^c) cheap bigint adds, like the reference's JS-driven
        table build — c=8 keeps that under a second); the device program is
        just flat gathers + K-way mixed add + batch normalization."""
        import random as _random

        rng = _random.Random(seed ^ 0x9E3779B9)
        K = -(-entropy_bits // c)
        Lt = 1 << c
        W = self.ops
        A = self.oracle_affine
        bases = [A.random(rng) for _ in range(K)]
        # host tables: row k = [0, B_k, 2*B_k, ..., (Lt-1)*B_k]
        rows = []
        for b in bases:
            row = [None]
            for _ in range(1, Lt):
                row.append(A.add(row[-1], b))
            rows.append(row)
        flat = [p for row in rows for p in row]
        at = W.pack_affine(flat)  # leaves (n, K*Lt) / (K*Lt,)
        idx = jax.random.randint(jax.random.PRNGKey(seed), (K, N), 0, Lt)
        idx = idx + (jnp.arange(K, dtype=idx.dtype) * Lt)[:, None]  # flat ids

        key = ("rpf", K, c, N)
        if key not in self._jit_cache:

            def fn(tx, ty, tinf, idx):
                # ONE flat gather per coordinate: (n, K*N)
                fi = idx.reshape(-1)
                gx = jnp.take(tx, fi, axis=-1).reshape(tx.shape[:-1] + (K, N))
                gy = jnp.take(ty, fi, axis=-1).reshape(ty.shape[:-1] + (K, N))
                ginf = jnp.take(tinf, fi).reshape(K, N)
                # fold the K tables' picks (K is tiny): proj acc += affine pick
                acc = W.from_affine(
                    AffinePoints(gx[..., 0, :], gy[..., 0, :], ginf[0])
                )
                for k in range(1, K):
                    acc = W.proj_add_affine(
                        acc, AffinePoints(gx[..., k, :], gy[..., k, :], ginf[k])
                    )
                pts = W.to_affine(acc)
                return pts.x, pts.y, pts.inf

            # XLA compile of this program is ~110 s and was the dominant
            # point-generation cost (r5 probe: compile 111.8 s, execute
            # 4 ms at 2^16); jax.export AOT-caches it across processes
            from ..utils.aot_cache import exported_fn

            self._jit_cache[key] = exported_fn(
                f"rpf_{self.label}_{N}_{K}_{c}", fn,
                (at.x, at.y, at.inf, idx),
            )
        return AffinePoints(*self._jit_cache[key](at.x, at.y, at.inf, idx))


class TwistedEdwards:
    """Full curve module for a twisted-Edwards curve (a = -1)."""

    def __init__(self, params: EdwardsParams, w: int = 12):
        self.params = params
        self.ops = EdwardsOps(params, w)
        self.scalar = SimpleScalar(params.order, w)
        self.oracle = EdwardsCurve(params)
        self.label = params.label
        self._jit_cache: dict = {}

    _instances: dict = {}

    @classmethod
    def create(cls, params: EdwardsParams, w: int = 12) -> "TwistedEdwards":
        key = (params.label, w)
        if key not in cls._instances:
            cls._instances[key] = cls(params, w)
        return cls._instances[key]

    def scalars_from_ints(self, scalars) -> jnp.ndarray:
        return jnp.asarray(self.scalar.pack(scalars))

    def points_from_ints(self, points) -> ExtPoints:
        """points: list of affine (x, y) int tuples."""
        return self.ops.pack([self.oracle.from_affine(p) for p in points])

    def result_to_int(self, res: ExtPoints):
        [p] = self.ops.unpack(res)
        return self.oracle.to_affine(p)

    def _pad(self, scalars, points: ExtPoints, multiple: int = 1):
        """Pad N to a power of two (>= 8); padding points are the identity
        (0,1,1,0) with zero scalars."""
        N = points.X.shape[-1]
        target = max(8, multiple)
        while target < N:
            target *= 2
        while target % multiple:
            target *= 2
        if target == N:
            return scalars, points
        pad = target - N
        zero = self.ops.zeros(pad)
        scalars = jnp.pad(scalars, ((0, 0), (0, pad)))
        points = ExtPoints(
            *(
                jnp.concatenate([a, z], axis=-1)
                for a, z in zip(points, zero)
            )
        )
        return scalars, points

    def msm(self, scalars, points: ExtPoints, c: int | None = None, mesh=None):
        mult = mesh.devices.size if mesh is not None else 1
        scalars, points = self._pad(scalars, points, mult)
        if mesh is not None:  # mesh path manages its own (cached) jits
            return mesh_mod.msm_edwards_sharded(
                self.ops, mesh, scalars, points, self.scalar.bits, c
            )
        key = ("msm", c)
        if key not in self._jit_cache:

            def fn(s, X, Y, Z, T):
                return msm_basic_edwards(
                    self.ops, s, ExtPoints(X, Y, Z, T), self.scalar.bits, c
                )

            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](scalars, *points)

    def msm_unsafe(self, scalars, points: ExtPoints, c: int | None = None, mesh=None):
        """API-parity alias: the reference registers msmUnsafe on both curve
        families (`src/parallel.ts:251-259`). The unified hwcd-3 add is
        already complete (handles duplicates/identity), so the safe path IS
        the fast path here — no separate unsafe pipeline exists."""
        return self.msm(scalars, points, c, mesh)

    def msm_bigint(self, scalars, points, c: int | None = None):
        s = self.scalars_from_ints(scalars)
        p = self.points_from_ints(points)
        return self.result_to_int(self.msm(s, p, c))

    def random_scalars(self, N: int, seed: int = 0) -> jnp.ndarray:
        from ..fields.bytes_codec import random_uniform_limbs

        rng = np.random.default_rng(seed)
        return jnp.asarray(
            random_uniform_limbs(rng, self.params.order, N, self.scalar.scheme)
        )

    def random_points_fast(self, N: int, seed: int = 0, entropy_bits: int = 64, c: int = 8) -> ExtPoints:
        """Host-side oracle table build (cheap bigint setup, like the
        reference's JS-driven tables) + ONE small device program: flat
        gathers, K-way unified add, batch normalization."""
        import random as _random

        rng = _random.Random(seed ^ 0x9E3779B9)
        K = -(-entropy_bits // c)
        Lt = 1 << c
        E = self.ops
        O = self.oracle
        rows = []
        for _ in range(K):
            b = O.random(rng)
            row = [O.zero]
            for _ in range(1, Lt):
                row.append(O.add(row[-1], b))
            rows.append(row)
        table = E.pack([p for row in rows for p in row])  # leaves (n, K*Lt)
        idx = jax.random.randint(jax.random.PRNGKey(seed), (K, N), 0, Lt)
        idx = idx + (jnp.arange(K, dtype=idx.dtype) * Lt)[:, None]

        key = ("rpf", K, c, N)
        if key not in self._jit_cache:

            def fn(tX, tY, tZ, tT, idx):
                fi = idx.reshape(-1)
                picked = ExtPoints(
                    *(
                        jnp.take(a, fi, axis=-1).reshape(a.shape[:-1] + (K, N))
                        for a in (tX, tY, tZ, tT)
                    )
                )
                acc = ExtPoints(*(a[..., 0, :] for a in picked))
                for k in range(1, K):
                    acc = E.add(acc, ExtPoints(*(a[..., k, :] for a in picked)))
                return tuple(E.batch_normalize(acc))

            # AOT-cached: XLA compile dominates generation cost (see the
            # Weierstrass twin above)
            from ..utils.aot_cache import exported_fn

            self._jit_cache[key] = exported_fn(
                f"rpf_{self.label}_{N}_{K}_{c}", fn, (*table, idx)
            )
        return ExtPoints(*self._jit_cache[key](*table, idx))
