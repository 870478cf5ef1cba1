"""Fused Pallas TPU kernels for whole curve operations.

Each kernel computes an entire curve-point formula (a dozen Montgomery
multiplies plus deferred-carry add/sub glue) for a block of lanes in one
Pallas call, with all intermediates in registers/VMEM. This is the
TPU-native analog of the reference's runtime-generated WASM curve ops
(`src/wasm/curve.ts:26-103`) — but where the reference pays one WASM call
per field op and composes in JS, here the composition itself is fused:
one XLA op per CURVE op. That keeps MSM programs small (fast XLA compiles)
and avoids HBM round-trips between field ops.

Formulas (all complete / strongly unified — branch-free lanes):
* ``proj_add``       — Renes-Costello-Batina Alg. 7 (complete, a=0), 12 muls
* ``proj_double``    — RCB Alg. 9 (complete, a=0), 8 muls
* ``proj_add_mixed`` — RCB Alg. 8 (Z2=1) + infinity-flag select, 11 muls
* ``ed_add``         — 2008-hwcd-3 strongly unified extended add (a=-1),
                       9 muls (cf. `src/curve-twisted-edwards.ts:84-165`)

The 3b curve constant is multiplied via limbwise small-integer products when
3b is tiny (BLS12-377: b=1 -> 3b=3; BLS12-381: 12; Pallas: 15), which costs
one vector op per limb instead of a full Montgomery multiply.

Every kernel takes an optional per-lane ``mask`` input: lanes where mask==0
pass the first operand through unchanged — this folds the `has_partner` /
`active` selects of the MSM engine into the kernel.

Field values in memory follow the storage contract of
`fields/pallas_field.py`: limbs in [-1, 2^w], value in [0, 2p).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import pallas_field as pf
from ..fields.pallas_field import FV, FieldCtx

__all__ = ["CurveKernels", "EdwardsKernels", "LANES", "SUBLANES", "BLOCK"]

LANES = 128
SUBLANES = int(os.environ.get("MSM_TPU_SUBLANES", "16"))
BLOCK = SUBLANES * LANES

_SMALL_3B_LIMIT = 1 << 8  # use limbwise small-mul for 3b below this


def _read(ctx: FieldCtx, ref) -> FV:
    return pf.fv_stored(ctx, ref[...])


def _write(ctx: FieldCtx, ref, x: FV):
    x = pf.f_relax(ctx, x)
    assert x.vmax < pf.STORE_VMAX_P * ctx.p, (
        f"storage value bound violated: {x.vmax / ctx.p}"
    )
    ref[...] = x.arr


def _pad_flat(arrs, n_limbs, block):
    """Flatten (n, *batch) leaves to (n, B), pad B to a block multiple,
    reshape to (n, B/LANES, LANES). Scalar (batch,) masks get a leading
    1-sized limb axis. Returns (reshaped arrays, batch shape, true size)."""
    batch = jnp.broadcast_shapes(
        *(a.shape[1:] if a.ndim > 1 else a.shape for a in arrs)
    )
    size = int(np.prod(batch)) if batch else 1
    pad = (-size) % block
    out = []
    for a in arrs:
        if a.ndim == 1 or a.shape[0] != n_limbs:  # mask: (batch,)
            a = a.reshape(1, -1)
        else:
            a = a.reshape(n_limbs, -1)
        a = jnp.broadcast_to(a, (a.shape[0], size))
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        out.append(a.reshape(a.shape[0], (size + pad) // LANES, LANES))
    return out, batch, size


def _unflatten(arrs, n_limbs, batch, size):
    out = []
    for a in arrs:
        a = a.reshape(n_limbs, -1)[:, :size]
        out.append(a.reshape((n_limbs,) + batch))
    return out


class _ValRef:
    """Minimal Ref shim for direct (non-pallas) kernel-body evaluation.

    Used when an interpret-mode kernel runs inside shard_map with
    check_vma=True: the HLO interpreter replays the kernel jaxpr through the
    vma checker, which rejects the replicated scalar constants every kernel
    bakes in. The kernel bodies are pure elementwise jnp (no program_id, no
    scratch), so evaluating them directly on whole arrays is bit-identical
    and lets normal tracing insert the pvary casts."""

    def __init__(self, val):
        self.val = val

    def __getitem__(self, idx):
        return self.val[idx]

    def __setitem__(self, idx, v):
        if idx is Ellipsis:
            self.val = v
        else:
            self.val = self.val.at[idx].set(v)


@functools.partial(
    jax.jit,
    static_argnames=("fn", "n_out", "n", "interpret", "name"),
)
def _curve_call(*arrs, fn, n_out, n, interpret, name):
    """Generic blocked pallas_call: arrs are (k_i, nb, LANES) with k_i = n
    (limb arrays) or 1 (masks)."""
    nb = arrs[0].shape[1]
    grid = (nb // SUBLANES,)

    def spec(k):
        return pl.BlockSpec(
            (k, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    # varying-mesh-axes of the outputs = union over inputs; needed so the
    # kernels compose with shard_map's check_vma=True (outputs of a lane-
    # wise kernel vary exactly over the axes its inputs vary over)
    vma = frozenset().union(
        *(getattr(jax.typeof(a), "vma", frozenset()) for a in arrs)
    )

    if interpret and vma:
        refs = [_ValRef(a) for a in arrs]
        outs = [
            _ValRef(jnp.zeros((n, nb, LANES), jnp.int32)) for _ in range(n_out)
        ]
        fn(*refs, *outs)
        return tuple(o.val for o in outs)

    return pl.pallas_call(
        fn,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n, nb, LANES), jnp.int32, vma=vma)
            for _ in range(n_out)
        ),
        grid=grid,
        in_specs=[spec(a.shape[0]) for a in arrs],
        out_specs=tuple(spec(n) for _ in range(n_out)),
        interpret=interpret,
        name=name,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(*arrs)


class _KernelBase:
    codec = None  # storage codec (e.g. Fma51Codec); None = native w-bit limbs

    @property
    def rows(self) -> int:
        return self.codec.rows if self.codec is not None else self.ctx.n

    def _rd(self, ref, vmax: int | None = None):
        """Read a stored field value from a kernel ref -> FV."""
        if self.codec is not None:
            # ONE whole-block read, then static row indexing of the value:
            # per-row ref[i] reads lower to dynamic_slice in interpret mode,
            # which rejects mixed varying/unvarying operands under
            # shard_map's check_vma
            block = ref[...]
            rows = [block[i] for i in range(self.codec.rows)]
            return self.codec.decode(
                self.ctx, rows, 2 * self.ctx.p - 1 if vmax is None else vmax
            )
        return pf.fv_stored(self.ctx, ref[...], vmax=vmax)

    def _wr(self, ref, x):
        if self.codec is not None:
            rows = self.codec.encode(self.ctx, x)
            ref[...] = jnp.stack(rows, axis=0)
            return
        _write(self.ctx, ref, x)

    def _call(self, body, ins, n_out, name):
        n = self.rows
        flat, batch, size = _pad_flat(list(ins), n, BLOCK)
        outs = _curve_call(
            *flat, fn=body, n_out=n_out, n=n, interpret=self.interpret, name=name
        )
        return _unflatten(list(outs), n, batch, size)


class CurveKernels(_KernelBase):
    """Fused kernels for short-Weierstrass (a=0) curves; constants baked.

    Kernel bodies are built ONCE here: `_curve_call` is jitted with the body
    as a static argument, so the same function object must be reused across
    calls for the jit cache (and the XLA compile cache) to hit.
    """

    def __init__(self, p: int, w: int, n: int, b3_mont: int, b3_small: int | None,
                 interpret: bool = False, codec=None):
        """b3_small: plain-integer 3b if small (multiplication by a small
        integer is representation-agnostic: 3b*(xR) = (3b*x)R), else None and
        b3_mont (3b in Montgomery form) is used with a full constant mul.
        codec: optional storage codec (e.g. `fields.fma51_pallas.Fma51Codec`)
        — coordinates then live in the codec's row layout in HBM and are
        decoded/encoded at the kernel boundary."""
        self.ctx = FieldCtx(p, w, n)
        self.b3_mont = b3_mont
        self.b3_small = b3_small if (b3_small or 0) < _SMALL_3B_LIMIT else None
        if self.b3_small is not None and not self._b3_small_safe():
            # the limbwise small-mul inflates value bounds by 3b; for small
            # R/p ratios (or larger 3b, e.g. the Pallas curve's 15) the
            # interval arithmetic cannot prove the formulas stay inside the
            # storage contract — fall back to the constant Montgomery mul
            self.b3_small = None
        self.interpret = interpret
        self.codec = codec
        self._bodies = {
            "proj_add": self._proj_add_body(False),
            "proj_add_m": self._proj_add_body(True),
            "proj_dbl": self._proj_double_body(),
            "proj_madd": self._proj_add_mixed_body(),
            "aff_pair": self._aff_pair_add_body(),
        }

    # ---- the 3b constant multiply ------------------------------------------

    def _mul_b3(self, x: FV) -> FV:
        if self.b3_small is not None:
            return pf.f_small(self.ctx, x, self.b3_small)
        return pf.mont_mul_const(self.ctx, x, self.b3_mont)

    def _b3_small_safe(self) -> bool:
        """Trace every Weierstrass formula with storage-contract dummy
        inputs; the FV interval arithmetic's trace-time asserts ARE the
        proof obligation, so an AssertionError here means the small-mul
        bound chain overflows for this (p, 3b) and must not be used."""
        ctx = self.ctx
        arr = jnp.zeros((ctx.n, 1), jnp.int32)
        x = pf.fv_stored(ctx, arr)
        x2 = pf.fv_stored(ctx, arr, vmax=2 * ctx.p - 1)
        s = jnp.zeros((1,), jnp.int32)
        mul_b3 = lambda v: pf.f_small(ctx, v, self.b3_small)
        try:
            for out in (
                rcb7(ctx, mul_b3, x, x, x, x, x, x),
                rcb8(ctx, mul_b3, x, x, x, x2, x2),
                rcb9(ctx, mul_b3, x, x, x),
                rcb7_unitz(ctx, mul_b3, self.b3_mont,
                           x2, x2, s, s, x2, x2, s, s),
            ):
                for o in out:
                    assert pf.f_relax(ctx, o).vmax < pf.STORE_VMAX_P * ctx.p
        except AssertionError:
            return False
        return True

    # ---- kernel bodies ----------------------------------------------------

    def _proj_add_body(self, masked: bool):
        ctx = self.ctx

        def body(*refs):
            if masked:
                (x1r, y1r, z1r, x2r, y2r, z2r, mr, xo, yo, zo) = refs
            else:
                (x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo) = refs
            P1 = [self._rd(r) for r in (x1r, y1r, z1r)]
            P2 = [self._rd(r) for r in (x2r, y2r, z2r)]
            out = rcb7(ctx, self._mul_b3, *P1, *P2)
            if masked:
                m = mr[0]
                out = [pf.f_select(m, o, a) for o, a in zip(out, P1)]
            for r, o in zip((xo, yo, zo), out):
                self._wr(r, o)

        return body

    def _proj_double_body(self):
        ctx = self.ctx

        def body(x1r, y1r, z1r, xo, yo, zo):
            P1 = [self._rd(r) for r in (x1r, y1r, z1r)]
            out = rcb9(ctx, self._mul_b3, *P1)
            for r, o in zip((xo, yo, zo), out):
                self._wr(r, o)

        return body

    def _proj_double_k_body(self, k: int):
        """k chained complete doublings in ONE kernel invocation.

        The Horner tail does c doublings per window step on a tiny batch;
        per-invocation overhead (~60 us measured on v5e via the axon
        backend) dominates there, so c*(K-1) separate proj_double calls
        cost ~8 ms of the 2^16 MSM. Chaining in-kernel replays the exact
        store/load round trip between iterations (relax to the storage
        contract, then re-enter with storage bounds), so the interval
        proofs hold unchanged."""
        ctx = self.ctx

        def body(x1r, y1r, z1r, xo, yo, zo):
            P = [self._rd(r) for r in (x1r, y1r, z1r)]
            for _ in range(k):
                out = rcb9(ctx, self._mul_b3, *P)
                P = [pf.fv_stored(ctx, pf.f_relax(ctx, o).arr) for o in out]
            for r, o in zip((xo, yo, zo), P):
                self._wr(r, o)

        return body

    def proj_double_k(self, X1, Y1, Z1, k: int):
        name = f"proj_dbl{k}"
        if name not in self._bodies:
            self._bodies[name] = self._proj_double_k_body(k)
        return self._call(self._bodies[name], (X1, Y1, Z1), 3, name)

    def _proj_add_mixed_body(self):
        """(X1,Y1,Z1) + affine (x2, y2, inf2): RCB Alg. 8 + inf select."""
        ctx = self.ctx

        def body(x1r, y1r, z1r, x2r, y2r, infr, xo, yo, zo):
            P1 = [self._rd(r) for r in (x1r, y1r, z1r)]
            X2, Y2 = self._rd(x2r), self._rd(y2r)
            inf2 = infr[0]
            out = rcb8(ctx, self._mul_b3, *P1, X2, Y2)
            out = [pf.f_select(inf2, a, o) for o, a in zip(out, P1)]
            for r, o in zip((xo, yo, zo), out):
                self._wr(r, o)

        return body

    def _aff_pair_add_body(self):
        """Fused MSM level-1 kernel: two SIGNED affine slots -> projective sum.

        Folds the engine's ``prepare`` step (conditional negation by the
        digit sign + identity encoding of invalid slots) into a unit-Z
        specialization of RCB Alg. 7: with Z in {0, 1} the three Z-products
        degenerate to selects, leaving 9 Montgomery muls instead of 12 —
        and the prepared projective level-1 operands never round-trip
        through HBM."""
        ctx = self.ctx

        def body(x1r, y1r, s1r, v1r, x2r, y2r, s2r, v2r, xo, yo, zo):
            # inputs are RAW base-point coordinates: packed points are
            # canonical [0, p) and the endomorphism map emits [0, 2p) —
            # the tighter bound (vs the 4p storage contract) is what keeps
            # the specialized formula's X3 inside the output contract
            rd = lambda r: self._rd(r, vmax=2 * ctx.p - 1)
            P1 = (rd(x1r), rd(y1r), s1r[0], v1r[0])
            P2 = (rd(x2r), rd(y2r), s2r[0], v2r[0])
            out = rcb7_unitz(ctx, self._mul_b3, self.b3_mont, *P1, *P2)
            for r, o in zip((xo, yo, zo), out):
                self._wr(r, o)

        return body

    # ---- public entry points ----------------------------------------------

    def aff_pair_add(self, x1, y1, s1, v1, x2, y2, s2, v2):
        """(sign s1, valid v1) applied to affine (x1, y1), same for operand 2,
        then complete add -> projective (X3, Y3, Z3). Invalid slots act as
        the identity."""
        ins = (
            x1, y1, s1.astype(jnp.int32), v1.astype(jnp.int32),
            x2, y2, s2.astype(jnp.int32), v2.astype(jnp.int32),
        )
        return self._call(self._bodies["aff_pair"], ins, 3, "aff_pair")

    def proj_add(self, X1, Y1, Z1, X2, Y2, Z2, mask=None):
        """Complete projective add; with ``mask`` lanes where mask==0 return
        (X1, Y1, Z1) unchanged."""
        if mask is None:
            return self._call(
                self._bodies["proj_add"], (X1, Y1, Z1, X2, Y2, Z2), 3, "proj_add"
            )
        m = mask.astype(jnp.int32)
        return self._call(
            self._bodies["proj_add_m"], (X1, Y1, Z1, X2, Y2, Z2, m), 3, "proj_add_m"
        )

    def proj_double(self, X1, Y1, Z1):
        return self._call(self._bodies["proj_dbl"], (X1, Y1, Z1), 3, "proj_dbl")

    def proj_add_mixed(self, X1, Y1, Z1, x2, y2, inf2):
        return self._call(
            self._bodies["proj_madd"],
            (X1, Y1, Z1, x2, y2, inf2.astype(jnp.int32)),
            3,
            "proj_madd",
        )


class EdwardsKernels(_KernelBase):
    """Fused kernels for twisted-Edwards a=-1 extended coordinates."""

    def __init__(self, p: int, w: int, n: int, k_mont: int, interpret: bool = False):
        """k_mont = 2d in Montgomery form (the hwcd-3 constant)."""
        self.ctx = FieldCtx(p, w, n)
        self.k_mont = k_mont
        self.interpret = interpret
        self._bodies = {
            "ed_add": self._ed_add_body(False),
            "ed_add_m": self._ed_add_body(True),
            "ed_pair": self._ed_pair_add_body(),
        }

    def _ed_pair_add_body(self):
        """Fused MSM level-1 kernel for twisted Edwards: two SIGNED affine
        slots (x, y; Z = 1, T = x*y computed in-kernel so the slot gather
        moves 2 coords instead of 4) -> extended sum. Invalid slots become
        the exact identity (0, 1, 1, 0); the digit sign negates x (and
        thereby T). With Z1 = Z2 = 1 the hwcd-3 D-term degenerates to the
        constant 2."""
        ctx, kc = self.ctx, self.k_mont

        def body(x1r, y1r, s1r, v1r, x2r, y2r, s2r, v2r, xo, yo, zo, to):
            one = None

            def prep(xr, yr, sr, vr):
                x = self._rd(xr, vmax=2 * ctx.p - 1)
                y = self._rd(yr, vmax=2 * ctx.p - 1)
                o = pf.fv_const(ctx, ctx.one_mont, x)
                z = pf.fv_zero(ctx, x)
                xs = pf.f_select(vr[0], pf.f_cneg(ctx, x, sr[0]), z)
                ys = pf.f_select(vr[0], y, o)
                return xs, ys

            X1, Y1 = prep(x1r, y1r, s1r, v1r)
            X2, Y2 = prep(x2r, y2r, s2r, v2r)
            out = hwcd3_unitz(ctx, kc, X1, Y1, X2, Y2)
            for r, o in zip((xo, yo, zo, to), out):
                self._wr(r, o)

        return body

    def ed_pair_add(self, x1, y1, s1, v1, x2, y2, s2, v2):
        """(sign, valid)-encoded affine TE slots -> extended sum."""
        ins = (
            x1, y1, s1.astype(jnp.int32), v1.astype(jnp.int32),
            x2, y2, s2.astype(jnp.int32), v2.astype(jnp.int32),
        )
        return self._call(self._bodies["ed_pair"], ins, 4, "ed_pair")

    def _ed_add_body(self, masked: bool):
        ctx, kc = self.ctx, self.k_mont

        def body(*refs):
            if masked:
                (x1r, y1r, z1r, t1r, x2r, y2r, z2r, t2r, mr,
                 xo, yo, zo, to) = refs
            else:
                (x1r, y1r, z1r, t1r, x2r, y2r, z2r, t2r,
                 xo, yo, zo, to) = refs
            P1 = [self._rd(r) for r in (x1r, y1r, z1r, t1r)]
            P2 = [self._rd(r) for r in (x2r, y2r, z2r, t2r)]
            out = hwcd3(ctx, kc, *P1, *P2)
            if masked:
                m = mr[0]
                out = [pf.f_select(m, o, p1) for o, p1 in zip(out, P1)]
            for r, o in zip((xo, yo, zo, to), out):
                self._wr(r, o)

        return body

    def _ed_double_k_body(self, k: int):
        """k chained unified doublings (hwcd-3 with both operands equal) in
        ONE kernel invocation — the Horner-tail launch-overhead fix (see
        CurveKernels._proj_double_k_body)."""
        ctx, kc = self.ctx, self.k_mont

        def body(x1r, y1r, z1r, t1r, xo, yo, zo, to):
            P = [self._rd(r) for r in (x1r, y1r, z1r, t1r)]
            for _ in range(k):
                out = hwcd3(ctx, kc, *P, *P)
                P = [pf.fv_stored(ctx, pf.f_relax(ctx, o).arr) for o in out]
            for r, o in zip((xo, yo, zo, to), P):
                self._wr(r, o)

        return body

    def ed_double_k(self, X1, Y1, Z1, T1, k: int):
        name = f"ed_dbl{k}"
        if name not in self._bodies:
            self._bodies[name] = self._ed_double_k_body(k)
        return self._call(self._bodies[name], (X1, Y1, Z1, T1), 4, name)

    def ed_add(self, X1, Y1, Z1, T1, X2, Y2, Z2, T2, mask=None):
        if mask is None:
            return self._call(
                self._bodies["ed_add"], (X1, Y1, Z1, T1, X2, Y2, Z2, T2), 4, "ed_add"
            )
        m = mask.astype(jnp.int32)
        return self._call(
            self._bodies["ed_add_m"], (X1, Y1, Z1, T1, X2, Y2, Z2, T2, m), 4,
            "ed_add_m",
        )


# ---- formula bodies (pure FV math; also usable eagerly for tests) -----------


def rcb7(ctx, mul_b3, X1, Y1, Z1, X2, Y2, Z2):
    """Renes-Costello-Batina Alg. 7: complete add, a=0, 12 muls."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t2 = M(Z1, Z2)
    t3 = M(A(X1, Y1), A(X2, Y2))
    t3 = S(t3, A(t0, t1))
    t4 = M(A(Y1, Z1), A(Y2, Z2))
    t4 = S(t4, A(t1, t2))
    Y3 = M(A(X1, Z1), A(X2, Z2))
    Y3 = S(Y3, A(t0, t2))
    t0 = A(A(t0, t0), t0)
    t2 = mul_b3(t2)
    Z3 = A(t1, t2)
    t1 = S(t1, t2)
    Y3 = mul_b3(Y3)
    X3 = S(M(t3, t1), M(t4, Y3))
    Y3 = A(M(t1, Z3), M(Y3, t0))
    Z3 = A(M(Z3, t4), M(t0, t3))
    return X3, Y3, Z3


def rcb8(ctx, mul_b3, X1, Y1, Z1, X2, Y2):
    """RCB Alg. 8: mixed add (Z2=1), a=0, 11 muls."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t3 = M(A(X2, Y2), A(X1, Y1))
    t3 = S(t3, A(t0, t1))
    t4 = A(M(Y2, Z1), Y1)
    Y3 = A(M(X2, Z1), X1)
    t0 = A(A(t0, t0), t0)
    t2 = mul_b3(Z1)
    Z3 = A(t1, t2)
    t1 = S(t1, t2)
    Y3 = mul_b3(Y3)
    X3 = S(M(t3, t1), M(t4, Y3))
    Y3 = A(M(t1, Z3), M(Y3, t0))
    Z3 = A(M(Z3, t4), M(t0, t3))
    return X3, Y3, Z3


def rcb9(ctx, mul_b3, X1, Y1, Z1):
    """RCB Alg. 9: complete double, a=0, 8 muls (2 of them squares)."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    SQ = lambda a: pf.mont_square(ctx, a)
    t0 = SQ(Y1)
    Z3 = pf.f_small(ctx, t0, 8)
    t1 = M(Y1, Z1)
    t2 = mul_b3(SQ(Z1))
    X3 = M(t2, Z3)
    Y3 = A(t0, t2)
    Z3 = M(t1, Z3)
    t2 = pf.f_small(ctx, t2, 3)
    t0 = S(t0, t2)
    Y3 = A(X3, M(t0, Y3))
    t1 = M(X1, Y1)
    X3 = pf.f_double(ctx, M(t0, t1))
    return X3, Y3, Z3


def rcb7_unitz(ctx, mul_b3, b3_mont, x1, y1, s1, v1, x2, y2, s2, v2):
    """RCB Alg. 7 specialized to unit-Z operands (Z in {0, 1}).

    Operand i is the affine point (xi, (-1)^si * yi) when vi != 0 and the
    identity when vi == 0. With Zi = vi the three Z-involving products of
    the complete add degenerate:

        Z1*Z2                  -> select(v1 & v2, 1, 0)
        (Y1+Z1)(Y2+Z2)-t1-t2   =  Y1*Z2 + Z1*Y2 -> selects
        (X1+Z1)(X2+Z2)-t0-t2   =  X1*Z2 + Z1*X2 -> selects

    leaving 9 Montgomery muls (12 in the general form); 3b*Z1*Z2 becomes a
    select of the baked constant b3_mont (value < p, which keeps the bound
    chain to X3 inside the storage contract). Completeness is preserved:
    the identity encoding (0 : 1 : 0) is forced in-formula for invalid
    lanes, so inputs to the RCB algebra are always curve points.

    Input coordinates must be bounded by 2p (raw packed/endomorphism
    points), not the general 4p storage bound."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    one = pf.fv_const(ctx, ctx.one_mont, x1)
    zero = pf.fv_zero(ctx, x1)
    b3c = pf.fv_const(ctx, b3_mont, x1)
    X1 = pf.f_select(v1, x1, zero)
    Y1 = pf.f_select(v1, pf.f_cneg(ctx, y1, s1), one)
    X2 = pf.f_select(v2, x2, zero)
    Y2 = pf.f_select(v2, pf.f_cneg(ctx, y2, s2), one)
    both = v1 * v2

    t0 = M(X1, X2)
    t1 = M(Y1, Y2)
    t3 = M(A(X1, Y1), A(X2, Y2))
    t3 = S(t3, A(t0, t1))
    t4 = A(pf.f_select(v2, Y1, zero), pf.f_select(v1, Y2, zero))
    Y3 = A(pf.f_select(v2, X1, zero), pf.f_select(v1, X2, zero))
    t0 = A(A(t0, t0), t0)
    t2 = pf.f_select(both, b3c, zero)  # 3b * Z1 * Z2
    Z3 = A(t1, t2)
    t1 = S(t1, t2)
    Y3s = mul_b3(Y3)
    if Y3s.vmax > 16 * ctx.p:
        # large 3b (small fields): the limbwise small-mul bound would push
        # X3 past the storage contract — use a constant Montgomery mul
        Y3s = pf.mont_mul_const(ctx, Y3, b3_mont)
    Y3 = Y3s
    X3 = S(M(t3, t1), M(t4, Y3))
    Y3 = A(M(t1, Z3), M(Y3, t0))
    Z3 = A(M(Z3, t4), M(t0, t3))
    return X3, Y3, Z3


def hwcd3_unitz(ctx, k_mont, X1, Y1, X2, Y2):
    """2008-hwcd-3 unified add specialized to unit-Z extended operands:
    Zi = 1, Ti = Xi*Yi (affine TE points, incl. the identity (0, 1)).
    D = 2*Z1*Z2 degenerates to the constant 2 (Montgomery form); T-coords
    are reconstituted in-kernel (2 muls) so storage/gather carries only
    (x, y) — 10 muls total vs 9 for the general form but 2 coords of HBM
    traffic instead of 4 (cf. the reference's affine TE batch,
    `curve-twisted-edwards.ts:314-339` batchNormalize'd points)."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    T1 = M(X1, Y1)
    T2 = M(X2, Y2)
    Am = M(S(Y1, X1), S(Y2, X2))
    B = M(A(Y1, X1), A(Y2, X2))
    C = pf.mont_mul_const(ctx, M(T1, T2), k_mont)
    D = pf.fv_const(ctx, 2 * ctx.one_mont % ctx.p, X1)
    E = S(B, Am)
    F = S(D, C)
    G = A(D, C)
    H = A(B, Am)
    return M(E, F), M(G, H), M(F, G), M(E, H)


def hwcd3(ctx, k_mont, X1, Y1, Z1, T1, X2, Y2, Z2, T2):
    """2008-hwcd-3 strongly unified extended add (a=-1), k = 2d, 9 muls
    (cf. the reference's addOrSubtract, `curve-twisted-edwards.ts:84-165`)."""
    M, A, S = (
        lambda a, b: pf.mont_mul(ctx, a, b),
        lambda a, b: pf.f_add(ctx, a, b),
        lambda a, b: pf.f_sub(ctx, a, b),
    )
    Am = M(S(Y1, X1), S(Y2, X2))
    B = M(A(Y1, X1), A(Y2, X2))
    C = pf.mont_mul_const(ctx, M(T1, T2), k_mont)
    D = pf.f_double(ctx, M(Z1, Z2))
    E = S(B, Am)
    F = S(D, C)
    G = A(D, C)
    H = A(B, Am)
    return M(E, F), M(G, H), M(F, G), M(E, H)
