"""In-kernel field arithmetic DSL for fused Pallas TPU kernels.

The reference generates one WASM function per field op and composes curve
formulas in JS, paying a call per op (`src/wasm/curve.ts:26-58`). On TPU the
analogous decomposition (one XLA op per field op) makes MSM *programs*
enormous and loses fusion, so the design here inverts it: whole CURVE
operations become single Pallas kernels, and field ops are Python functions
traced *inside* the kernel body.

Three ideas carry the design (the first two are the TPU re-derivation of
the reference's deferred-carry discipline, `doc/zprize22.md:126-151`, where
the carry budget was the i64 accumulator; here it is the int32 VPU lane):

1. **Interval-tracked deferred carries.** Every value is an ``FV``: ONE
   stacked ``(n, *block)`` int32 array (limbs on the leading axis) plus
   exact Python-int bounds. add/sub/small-mul emit ONE vector op and no
   carry at all; carries are inserted lazily ("relaxed") only when an
   operation's emitted column sums could overflow int32 — the bound
   tracking is the overflow proof, computed at trace time.

2. **Relaxed (parallel) carry rounds.** Instead of an n-step sequential
   carry chain, a relax round splits every limb as ``d = c & mask;
   g = c >> w; e = d + shift(g)`` — a handful of data-parallel ops over the
   whole limb axis. Column magnitudes shrink from 2^30 to [-1, 2^w] in ~3
   rounds, so carry "propagation" costs O(1) dependent steps instead of
   O(n). Limbs are therefore REDUNDANT: stored values keep limbs in
   [-1, 2^w] (not [0, 2^w)); only I/O-boundary code canonicalizes.

3. **Stacked limbs.** Limbs live on the leading axis of one array, so every
   deferred op and every CIOS step is ONE vector op over all n limbs — the
   traced kernel body is ~30x smaller than a per-limb formulation (Mosaic
   compile time scales with statement count) and the VPU sees wider ops.

Montgomery multiplication is CIOS-interleaved (one reduction step per outer
limb, like the reference's `multiply-montgomery.ts:98-137`): n steps of
{broadcast-mul-add, quotient digit, broadcast-mul-add, shift} — ~10 vector
ops per step. Constants (p limb vector, mu = -p^-1 mod 2^w) are baked at
trace time — tracing is the codegen, exactly like the reference's
runtime-generated WASM.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax.numpy as jnp
import numpy as np

__all__ = [
    "FieldCtx", "FV",
    "fv_stored", "fv_const", "fv_zero",
    "f_add", "f_sub", "f_neg", "f_cneg", "f_select", "f_small",
    "f_double",
    "mont_mul", "mont_square", "mont_mul_const",
    "f_relax", "f_canonical", "f_is_zero", "f_is_equal",
    "STORE_LO", "STORE_VMAX_P",
]

# Storage contract for limbs leaving a kernel: limbs in [STORE_LO, 2^w],
# value in [0, 4p). The jnp-level field (fields/fp.py) and the host codec
# tolerate this redundant form (their carry scans handle signed limbs; the
# predicates canonicalize first).
STORE_LO = -1
STORE_VMAX_P = 4  # stored values < STORE_VMAX_P * p

_I32_LIMIT = (1 << 31) - 1


@dataclass(frozen=True)
class FieldCtx:
    """Static field constants baked into kernels as immediates."""

    p: int
    w: int
    n: int

    @cached_property
    def mask(self) -> int:
        return (1 << self.w) - 1

    @cached_property
    def R(self) -> int:
        return 1 << (self.n * self.w)

    @cached_property
    def mu(self) -> int:
        """-p^-1 mod 2^w (the per-step CIOS constant)."""
        return (-pow(self.p, -1, 1 << self.w)) % (1 << self.w)

    def limbs_of(self, x: int) -> tuple:
        assert 0 <= x < self.R
        return tuple((x >> (self.w * i)) & self.mask for i in range(self.n))

    def const_col(self, x: int, like: jnp.ndarray) -> jnp.ndarray:
        """(n, *block) constant column built from SCALAR immediates (Pallas
        kernels may not capture non-splat constant arrays; per-row scalar
        adds keep the limbs as immediates, like the reference's baked data
        segments). ``like``: a traced (n, *block) array for shape/zeros."""
        zero = jnp.zeros_like(like[:1])
        rows = [zero + int(v) for v in self.limbs_of(x)]
        return jnp.concatenate(rows, axis=0)

    @cached_property
    def p_ints(self) -> tuple:
        return self.limbs_of(self.p)

    @cached_property
    def one_mont(self) -> int:
        return self.R % self.p


@dataclass(frozen=True)
class FV:
    """A field value inside a kernel: stacked limb array + exact bounds.

    value = sum(arr[i] * 2^(w*i)), guaranteed in [0, vmax] (Python ints);
    body limbs (rows 0..n-2) in [lo, hi]; the top limb in [top_lo, top_hi].
    All bounds inclusive.
    """

    arr: jnp.ndarray  # (n, *block) int32
    lo: int
    hi: int
    top_lo: int
    top_hi: int
    vmax: int

    @property
    def abs_hi(self) -> int:
        return max(abs(self.lo), self.hi, abs(self.top_lo), self.top_hi)


# ---- constructors -----------------------------------------------------------


def fv_stored(ctx: FieldCtx, arr, vmax: int | None = None) -> FV:
    """Wrap a (n, *block) limb array read from storage (contract bounds)."""
    if isinstance(arr, (list, tuple)):
        arr = jnp.stack(list(arr), axis=0)
    assert arr.shape[0] == ctx.n
    vmax = STORE_VMAX_P * ctx.p - 1 if vmax is None else vmax
    hi = 1 << ctx.w
    return FV(arr, STORE_LO, hi, STORE_LO, hi, vmax)


def fv_const(ctx: FieldCtx, value: int, like) -> FV:
    """Broadcast a constant (plain int in [0, R), already in the desired
    form) shaped like ``like`` (an FV)."""
    ref_arr = like.arr if isinstance(like, FV) else like
    arr = ctx.const_col(value, ref_arr)
    ints = ctx.limbs_of(value)
    body_hi = max(ints[:-1]) if ctx.n > 1 else 0
    return FV(arr, 0, body_hi, ints[-1], ints[-1], value)


def fv_zero(ctx: FieldCtx, like) -> FV:
    shape = like.arr.shape[1:] if isinstance(like, FV) else like.shape
    return FV(jnp.zeros((ctx.n,) + tuple(shape), jnp.int32), 0, 0, 0, 0, 0)


# ---- deferred (carry-free) ops ---------------------------------------------


def f_add(ctx: FieldCtx, x: FV, y: FV) -> FV:
    return FV(
        x.arr + y.arr,
        x.lo + y.lo, x.hi + y.hi,
        x.top_lo + y.top_lo, x.top_hi + y.top_hi,
        x.vmax + y.vmax,
    )


def f_double(ctx: FieldCtx, x: FV) -> FV:
    return f_add(ctx, x, x)


def f_small(ctx: FieldCtx, x: FV, k: int) -> FV:
    """x * k for a small static non-negative integer k (one vector op;
    used for curve constants like 3b when b is tiny)."""
    assert k >= 0
    if k == 0:
        return fv_zero(ctx, x)
    if k == 1:
        return x
    return FV(x.arr * k, x.lo * k, x.hi * k, x.top_lo * k, x.top_hi * k,
              x.vmax * k)


def f_sub(ctx: FieldCtx, x: FV, y: FV) -> FV:
    """x - y + kp (k minimal so the value stays non-negative): ONE vector
    op plus a baked constant column — the deferred analog of
    subtractPositive (`field-arithmetic.ts:117`)."""
    kp = -(-y.vmax // ctx.p) * ctx.p
    assert kp < ctx.R, "subtrahend bound exceeds limb capacity; relax first"
    ints = ctx.limbs_of(kp)
    cvec = ctx.const_col(kp, x.arr)
    body_hi = max(ints[:-1]) if ctx.n > 1 else 0
    return FV(
        x.arr - y.arr + cvec,
        x.lo - y.hi + 0, x.hi - y.lo + body_hi,
        x.top_lo - y.top_hi + ints[-1], x.top_hi - y.top_lo + ints[-1],
        x.vmax + kp,
    )


def f_neg(ctx: FieldCtx, x: FV) -> FV:
    """kp - x."""
    return f_sub(ctx, fv_zero(ctx, x), x)


def f_select(mask, a: FV, b: FV) -> FV:
    """Per-lane select: a where mask, else b. mask broadcastable to block."""
    cond = mask != 0
    return FV(
        jnp.where(cond, a.arr, b.arr),
        min(a.lo, b.lo), max(a.hi, b.hi),
        min(a.top_lo, b.top_lo), max(a.top_hi, b.top_hi),
        max(a.vmax, b.vmax),
    )


def f_cneg(ctx: FieldCtx, x: FV, flag) -> FV:
    """Negate where flag != 0."""
    return f_select(flag, f_neg(ctx, x), x)


# ---- relaxed carry rounds ---------------------------------------------------


def _geom_lo_hi(ctx: FieldCtx, lo: int, hi: int) -> tuple:
    """Bounds of sum over body rows of limb*2^(wi) for i < n-1."""
    s = ((1 << (ctx.w * (ctx.n - 1))) - 1) // ((1 << ctx.w) - 1)
    return lo * s, hi * s


def f_relax(ctx: FieldCtx, x: FV, limit: int | None = None) -> FV:
    """Emit parallel carry rounds until every limb bound is within
    [-limit, limit] (default 2^w). O(1) dependent ops per round; the top
    row is never split (its carries would have nowhere to go) — its
    interval is tightened against the value bound instead."""
    n, w, mask = ctx.n, ctx.w, ctx.mask
    limit = (1 << w) if limit is None else limit
    arr = x.arr
    lo, hi, tlo, thi = x.lo, x.hi, x.top_lo, x.top_hi
    shift = w * (n - 1)
    rounds = 0
    while (lo < -limit or hi > limit or tlo < -limit or thi > limit):
        assert rounds < 10, "relaxation failed to converge (bounds bug)"
        g = arr >> w
        d = arr & mask
        # body rows get masked; the top row keeps its full value
        d = jnp.concatenate([d[: n - 1], arr[n - 1 :]], axis=0)
        gsh = jnp.concatenate([jnp.zeros_like(g[:1]), g[: n - 1]], axis=0)
        arr = d + gsh
        glo, ghi = lo >> w, hi >> w
        nlo, nhi = 0 + min(glo, 0), mask + max(ghi, 0)
        ntlo, nthi = tlo + glo, thi + ghi
        # value-derived tightening of the top limb
        rest_lo, rest_hi = _geom_lo_hi(ctx, nlo, nhi)
        ntlo = max(ntlo, -((rest_hi - 0) >> shift) - 1)
        nthi = min(nthi, (x.vmax - rest_lo) >> shift)
        lo, hi, tlo, thi = nlo, nhi, ntlo, nthi
        rounds += 1
    return FV(arr, lo, hi, tlo, thi, x.vmax)


# ---- canonicalization / predicates (I/O boundary; sequential) ---------------


def f_canonical(ctx: FieldCtx, x: FV) -> FV:
    """Exact sequential carry chain -> limbs in [0, 2^w), then reduce to
    [0, p) with conditional subtracts. Rare-path (predicates, I/O)."""
    n, w, mask = ctx.n, ctx.w, ctx.mask
    x = f_relax(ctx, x)
    rows = [x.arr[i] for i in range(n)]
    carry = None
    out = []
    for i in range(n):
        t = rows[i] if carry is None else rows[i] + carry
        out.append(t & mask)
        carry = t >> w
    limbs = out
    vmax = x.vmax

    def cond_sub(limbs, c_ints):
        t, borrow = [], None
        for a, ci in zip(limbs, c_ints):
            d = a - int(ci) if borrow is None else a - int(ci) + borrow
            t.append(d & mask)
            borrow = d >> w
        keep = borrow < 0
        return [jnp.where(keep, a, d) for a, d in zip(limbs, t)]

    while vmax >= ctx.p:
        k = 1
        while 2 * k * ctx.p <= vmax:
            k <<= 1
        limbs = cond_sub(limbs, ctx.limbs_of(k * ctx.p))
        vmax = max(k * ctx.p - 1, vmax - k * ctx.p)
    arr = jnp.stack(limbs, axis=0)
    return FV(arr, 0, mask, 0, mask, ctx.p - 1)


def f_is_zero(ctx: FieldCtx, x: FV):
    r = f_canonical(ctx, x).arr
    acc = r[0]
    for i in range(1, ctx.n):
        acc = acc | r[i]
    return acc == 0


def f_is_equal(ctx: FieldCtx, x: FV, y: FV):
    rx = f_canonical(ctx, x).arr
    ry = f_canonical(ctx, y).arr
    acc = rx[0] ^ ry[0]
    for i in range(1, ctx.n):
        acc = acc | (rx[i] ^ ry[i])
    return acc == 0


# ---- Montgomery multiplication (CIOS, stacked, deferred carries) -------------


def _mul_ready(ctx: FieldCtx, x: FV) -> FV:
    """Relax so limb magnitudes are <= 2^w (the CIOS column budget needs
    |x_i*y_j| <= 2^(2w); with 2n products + carries per column this keeps
    every column within int32 for n <= 33 at w = 12)."""
    if x.abs_hi > (1 << ctx.w):
        x = f_relax(ctx, x)
    return x


def _cios(ctx: FieldCtx, x: FV, Y, y_abs_hi: int, y_vmax: int) -> FV:
    """Shared CIOS core: Y is a (n, *block) array or a baked (n,1..)
    constant column. Returns the relaxed product FV."""
    n, w, mask, mu = ctx.n, ctx.w, ctx.mask, ctx.mu
    pvec = ctx.const_col(ctx.p, x.arr)
    p_hi = max(ctx.p_ints)
    xa = x.arr
    zero_row = jnp.zeros_like(xa[:1])
    A = jnp.zeros_like(xa)

    pb_xy = x.abs_hi * y_abs_hi
    pb_qp = mask * p_hi
    bhi = 0  # uniform column magnitude bound
    c0_hi_acc = 0
    for i in range(n):
        xi = xa[i]
        A = A + xi * Y
        bhi += pb_xy
        z0 = A[0] & mask
        qi = (z0 * mu) & mask
        A = A + qi * pvec
        bhi += pb_qp
        assert bhi <= _I32_LIMIT, f"CIOS column overflows int32 at step {i}"
        c0 = A[0] >> w
        c0_hi = bhi >> w
        # shift down one limb, folding the carry into the new column 0
        # (concat of slices — .at[] would lower to scatter, which Mosaic
        # does not support)
        A = jnp.concatenate([(A[1] + c0)[None], A[2:], zero_row], axis=0)
        bhi += c0_hi  # conservative: carry lands on col 0 only
        assert bhi <= _I32_LIMIT

    # value bound: out = (x*y + Q*p) / R with Q in [0, R)
    t_hi = x.vmax * y_vmax
    vmax = (t_hi + (ctx.R - 1) * ctx.p) // ctx.R + 1
    assert vmax < 3 * ctx.p, f"montmul output bound too large: {vmax / ctx.p:.3f} p"
    out = FV(A, -bhi, bhi, -bhi, bhi, vmax)
    return f_relax(ctx, out)


def mont_mul(ctx: FieldCtx, x: FV, y: FV) -> FV:
    """Montgomery product x*y*R^-1 mod p. Inputs: any FVs (relaxed on
    demand; values must satisfy vmax_x*vmax_y < ~2*p*R). Output:
    storage-contract FV, value < ~1.5p."""
    x = _mul_ready(ctx, x)
    y = _mul_ready(ctx, y)
    return _cios(ctx, x, y.arr, y.abs_hi, y.vmax)


def mont_square(ctx: FieldCtx, x: FV) -> FV:
    return mont_mul(ctx, x, x)


def mont_mul_const(ctx: FieldCtx, x: FV, const: int) -> FV:
    """Montgomery product with a STATIC constant (plain int in [0, R); for
    a field constant in Montgomery form), baked as a constant column."""
    x = _mul_ready(ctx, x)
    cvec = ctx.const_col(const, x.arr)
    return _cios(ctx, x, cvec, max(ctx.limbs_of(const)), const)
