"""In-kernel field arithmetic DSL for fused Pallas TPU kernels.

The reference generates one WASM function per field op and composes curve
formulas in JS, paying a call per op (`src/wasm/curve.ts:26-58`). On TPU the
analogous decomposition (one XLA op per field op) makes MSM *programs*
enormous and loses fusion, so the design here inverts it: whole CURVE
operations become single Pallas kernels, and field ops are Python functions
traced *inside* the kernel body, operating on lists of ``n`` int32 limb
arrays that live in vector registers / VMEM.

Two ideas carry the performance (both are the TPU re-derivation of the
reference's deferred-carry discipline, `doc/zprize22.md:126-151`, where the
carry budget was the i64 accumulator; here it is the int32 VPU lane):

1. **Interval-tracked deferred carries.** Every value is an ``FV``: limb
   arrays plus exact Python-int bounds (per-limb interval and a value
   interval). add/sub/small-mul emit ONE limbwise vector op and no carry at
   all; carries are inserted lazily ("relaxed") only when an operation's
   emitted column sums could overflow int32 — the bound tracking is the
   overflow proof, computed at trace time.

2. **Relaxed (parallel) carry rounds.** Instead of an n-step sequential
   carry chain, a relax round splits every limb as ``d = c & mask;
   g = c >> w; e_i = d_i + g_(i-1)`` — three data-parallel ops over all
   limbs. Column magnitudes shrink from 2^30 to [-1, 2^w] in ~3 rounds, so
   carry "propagation" costs O(1) dependent steps instead of O(n). Limbs are
   therefore REDUNDANT: stored values keep limbs in [-1, 2^w] (not [0, 2^w));
   only I/O-boundary code canonicalizes.

Montgomery multiplication is CIOS-interleaved (one reduction step per outer
limb, like the reference's `multiply-montgomery.ts:98-137`) because it keeps
only n+1 live accumulator columns (register pressure) and needs ~20% fewer
MACs than the separate 3-product form.

Constants (p limbs, mu = -p^-1 mod 2^w) are Python ints baked into the
kernel as scalar immediates — tracing is the codegen, exactly like the
reference's runtime-generated WASM.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from functools import cached_property

import jax.numpy as jnp

__all__ = [
    "FieldCtx", "FV",
    "fv_stored", "fv_const", "fv_zero",
    "f_add", "f_sub", "f_neg", "f_cneg", "f_select", "f_small",
    "f_double",
    "mont_mul", "mont_square", "mont_mul_const",
    "f_relax", "f_canonical", "f_is_zero", "f_is_equal",
    "STORE_LO", "STORE_HI",
]

# Storage contract for limbs leaving a kernel: limbs in [STORE_LO, 2^w],
# value in [0, 4p). The jnp-level field (fields/fp.py) and the host codec
# tolerate this redundant form (their carry scans handle signed limbs; the
# predicates canonicalize first).
STORE_LO = -1
STORE_VMAX_P = 4  # stored values < STORE_VMAX_P * p


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

    @cached_property
    def p_ints(self) -> tuple:
        return self.limbs_of(self.p)

    @cached_property
    def one_mont(self) -> int:
        return self.R % self.p

    @property
    def store_hi(self) -> int:
        return 1 << self.w


def STORE_HI(ctx: FieldCtx) -> int:
    """Per-limb storage upper bound (inclusive): 2^w (redundant form)."""
    return 1 << ctx.w


@dataclass(frozen=True)
class FV:
    """A field value inside a kernel: limb arrays + exact bounds.

    value = sum(limbs[i] * 2^(w*i)), guaranteed in [vmin, vmax] (Python
    ints); limbs[i] guaranteed in [lo[i], hi[i]]. All bounds inclusive.
    """

    limbs: tuple  # n jnp int32 arrays
    lo: tuple     # per-limb lower bounds (Python ints)
    hi: tuple     # per-limb upper bounds
    vmin: int
    vmax: int

    def __iter__(self):  # convenience for zip()
        return iter(self.limbs)


# ---- constructors -----------------------------------------------------------


def fv_stored(ctx: FieldCtx, limbs, vmax: int | None = None) -> FV:
    """Wrap limb arrays read from storage (the storage contract bounds)."""
    n = ctx.n
    limbs = tuple(limbs)
    assert len(limbs) == n
    vmax = STORE_VMAX_P * ctx.p - 1 if vmax is None else vmax
    return FV(limbs, (STORE_LO,) * n, (1 << ctx.w,) * n, 0, vmax)


def fv_const(ctx: FieldCtx, value: int, like) -> FV:
    """Broadcast a constant (plain int in [0, R), already in the desired
    form) to a limb list shaped like ``like`` (a jnp array)."""
    zero = jnp.zeros_like(like)
    ints = ctx.limbs_of(value)
    return FV(
        tuple(zero + int(c) for c in ints),
        ints, ints, value, value,
    )


def fv_zero(ctx: FieldCtx, like) -> FV:
    zero = jnp.zeros_like(like)
    return FV((zero,) * ctx.n, (0,) * ctx.n, (0,) * ctx.n, 0, 0)


# ---- deferred (carry-free) ops ---------------------------------------------


def f_add(ctx: FieldCtx, x: FV, y: FV) -> FV:
    return FV(
        tuple(a + b for a, b in zip(x.limbs, y.limbs)),
        tuple(a + b for a, b in zip(x.lo, y.lo)),
        tuple(a + b for a, b in zip(x.hi, y.hi)),
        x.vmin + y.vmin,
        x.vmax + y.vmax,
    )


def f_double(ctx: FieldCtx, x: FV) -> FV:
    return f_add(ctx, x, x)


def f_small(ctx: FieldCtx, x: FV, k: int) -> FV:
    """x * k for a small static non-negative integer k (limbwise multiply;
    used for curve constants like 3b when b is tiny)."""
    assert k >= 0
    if k == 0:
        return fv_zero(ctx, x.limbs[0])
    if k == 1:
        return x
    return FV(
        tuple(a * k for a in x.limbs),
        tuple(a * k for a in x.lo),
        tuple(a * k for a in x.hi),
        x.vmin * k,
        x.vmax * k,
    )


def _padding_multiple(ctx: FieldCtx, bound: int) -> int:
    """Smallest multiple of p that is >= bound (so x - y + kp stays >= 0)."""
    k = -(-bound // ctx.p)
    return k * ctx.p


def f_sub(ctx: FieldCtx, x: FV, y: FV) -> FV:
    """x - y + kp (k minimal so the value stays non-negative): ONE limbwise
    op, no carries — the deferred analog of subtractPositive
    (`field-arithmetic.ts:117`)."""
    kp = _padding_multiple(ctx, y.vmax)
    c = ctx.limbs_of(kp) if kp < ctx.R else None
    assert c is not None, "subtrahend bound exceeds limb capacity; relax first"
    return FV(
        tuple(a - b + int(ci) for a, b, ci in zip(x.limbs, y.limbs, c)),
        tuple(a - b + ci for a, b, ci in zip(x.lo, y.hi, c)),
        tuple(a - b + ci for a, b, ci in zip(x.hi, y.lo, c)),
        x.vmin - y.vmax + kp,
        x.vmax - y.vmin + kp,
    )


def f_neg(ctx: FieldCtx, x: FV) -> FV:
    """kp - x."""
    return f_sub(ctx, fv_zero(ctx, x.limbs[0]), x)


def _union(x: FV, y: FV) -> tuple:
    return (
        tuple(min(a, b) for a, b in zip(x.lo, y.lo)),
        tuple(max(a, b) for a, b in zip(x.hi, y.hi)),
        min(x.vmin, y.vmin),
        max(x.vmax, y.vmax),
    )


def f_select(mask, a: FV, b: FV) -> FV:
    """Per-lane select: a where mask, else b. mask broadcastable to limbs."""
    cond = mask != 0
    lo, hi, vmin, vmax = _union(a, b)
    return FV(
        tuple(jnp.where(cond, fa, fb) for fa, fb in zip(a.limbs, b.limbs)),
        lo, hi, vmin, vmax,
    )


def f_cneg(ctx: FieldCtx, x: FV, flag) -> FV:
    """Negate where flag != 0."""
    return f_select(flag, f_neg(ctx, x), x)


# ---- relaxed carry rounds ---------------------------------------------------


def _round_bounds(ctx: FieldCtx, lo, hi, vmin, vmax):
    """Interval update for one relax round (top limb never split; its
    interval is tightened with the value bound)."""
    n, w, mask = ctx.n, ctx.w, ctx.mask
    nlo, nhi = [0] * n, [0] * n
    glo = [l >> w for l in lo]
    ghi = [h >> w for h in hi]
    for i in range(n - 1):
        gl, gh = (glo[i - 1], ghi[i - 1]) if i else (0, 0)
        nlo[i] = 0 + gl
        nhi[i] = mask + gh
    nlo[n - 1] = lo[n - 1] + (glo[n - 2] if n > 1 else 0)
    nhi[n - 1] = hi[n - 1] + (ghi[n - 2] if n > 1 else 0)
    # value-derived tightening of the top limb: value = top*2^(w(n-1)) + rest
    shift = ctx.w * (n - 1)
    rest_lo = sum(nlo[i] << (ctx.w * i) for i in range(n - 1))
    rest_hi = sum(nhi[i] << (ctx.w * i) for i in range(n - 1))
    top_hi = (vmax - rest_lo) >> shift  # floor
    top_lo = -((rest_hi - vmin) >> shift) - 1
    nlo[n - 1] = max(nlo[n - 1], top_lo)
    nhi[n - 1] = min(nhi[n - 1], top_hi)
    return tuple(nlo), tuple(nhi)


def _needs_relax(ctx: FieldCtx, x: FV, limit: int) -> bool:
    return any(l < -limit or h > limit for l, h in zip(x.lo, x.hi))


def f_relax(ctx: FieldCtx, x: FV, limit: int | None = None) -> FV:
    """Emit parallel carry rounds until every limb bound is within
    [-limit, limit] (default 2^w). O(1) dependent ops per round."""
    n, w, mask = ctx.n, ctx.w, ctx.mask
    limit = (1 << w) if limit is None else limit
    limbs, lo, hi = list(x.limbs), x.lo, x.hi
    rounds = 0
    while any(l < -limit or h > limit for l, h in zip(lo, hi)):
        assert rounds < 8, "relaxation failed to converge (bounds bug)"
        g = [c >> w for c in limbs[: n - 1]]
        new = [limbs[0] & mask]
        for i in range(1, n - 1):
            new.append((limbs[i] & mask) + g[i - 1])
        if n > 1:
            new.append(limbs[n - 1] + g[n - 2])
        limbs = new
        lo, hi = _round_bounds(ctx, lo, hi, x.vmin, x.vmax)
        rounds += 1
    return FV(tuple(limbs), lo, hi, x.vmin, x.vmax)


def f_store(ctx: FieldCtx, x: FV) -> FV:
    """Relax to the storage contract (limbs within [-2^w, 2^w])."""
    return f_relax(ctx, x)


# ---- canonicalization / predicates (I/O boundary; sequential) ---------------


def f_canonical(ctx: FieldCtx, x: FV) -> FV:
    """Exact sequential carry chain -> limbs in [0, 2^w), value unchanged
    mod R (the value must be in [0, R), which relax guarantees for stored
    values). Then reduce to [0, p) with two conditional subtracts."""
    n, w, mask = ctx.n, ctx.w, ctx.mask
    carry = None
    out = []
    for i in range(n):
        t = x.limbs[i] if carry is None else x.limbs[i] + carry
        out.append(t & mask)
        carry = t >> w
    limbs = out
    vmax = x.vmax

    def cond_sub(limbs, c_ints):
        t, borrow = [], None
        for a, c in zip(limbs, c_ints):
            d = a - int(c) if borrow is None else a - int(c) + borrow
            t.append(d & mask)
            borrow = d >> w
        keep = borrow < 0
        return [jnp.where(keep, a, d) for a, d in zip(limbs, t)]

    while vmax >= ctx.p:
        # largest power-of-two multiple of p that can be subtracted
        k = 1
        while 2 * k * ctx.p <= vmax:
            k <<= 1
        limbs = cond_sub(limbs, ctx.limbs_of(k * ctx.p))
        vmax = max(k * ctx.p - 1, vmax - k * ctx.p)
    return FV(tuple(limbs), (0,) * n, (mask,) * n, 0, ctx.p - 1)


def f_is_zero(ctx: FieldCtx, x: FV):
    r = f_canonical(ctx, x)
    acc = r.limbs[0]
    for v in r.limbs[1:]:
        acc = acc | v
    return acc == 0


def f_is_equal(ctx: FieldCtx, x: FV, y: FV):
    rx = f_canonical(ctx, x)
    ry = f_canonical(ctx, y)
    acc = rx.limbs[0] ^ ry.limbs[0]
    for a, b in zip(rx.limbs[1:], ry.limbs[1:]):
        acc = acc | (a ^ b)
    return acc == 0


# ---- Montgomery multiplication (CIOS, deferred carries) ----------------------

_I32_LIMIT = (1 << 31) - 1


def _mul_ready(ctx: FieldCtx, x: FV) -> FV:
    """Relax so limb magnitudes are <= 2^w (the CIOS column budget needs
    |x_i*y_j| <= 2^(2w); with 2n products + carries per column this keeps
    every column within int32 for n <= 32 at w = 12)."""
    if _needs_relax(ctx, x, 1 << ctx.w):
        x = f_relax(ctx, x)
    return x


def _cios(ctx: FieldCtx, x: FV, y_limbs, y_lo, y_hi, y_vmin, y_vmax):
    """Shared CIOS core: y may be arrays (limbs) or Python-int immediates
    (constant multiply). Returns the relaxed product FV."""
    n, w, mask, mu = ctx.n, ctx.w, ctx.mask, ctx.mu
    p_ints = ctx.p_ints
    zero = jnp.zeros_like(x.limbs[0])
    const_y = not hasattr(y_limbs[0], "shape")

    acc = [zero] * n
    alo = [0] * n
    ahi = [0] * n

    def mac(j, a, b, blo_, bhi_, xlo, xhi):
        # interval product
        cands = (xlo * blo_, xlo * bhi_, xhi * blo_, xhi * bhi_)
        plo, phi = min(cands), max(cands)
        assert alo[j] + plo >= -_I32_LIMIT and ahi[j] + phi <= _I32_LIMIT, (
            f"CIOS column {j} overflows int32: "
            f"[{alo[j] + plo}, {ahi[j] + phi}]"
        )
        alo[j] += plo
        ahi[j] += phi
        return a + b

    for i in range(n):
        xi = x.limbs[i]
        xlo, xhi = x.lo[i], x.hi[i]
        for j in range(n):
            if const_y:
                cj = int(y_limbs[j])
                if cj == 0:
                    continue
                acc[j] = mac(j, acc[j], xi * cj, cj, cj, xlo, xhi)
            else:
                acc[j] = mac(j, acc[j], xi * y_limbs[j], y_lo[j], y_hi[j], xlo, xhi)
        # Montgomery step: q_i = ((acc0 mod 2^w) * mu) mod 2^w
        a0 = acc[0] & mask
        qi = (a0 * mu) & mask  # in [0, mask]
        for j in range(n):
            pj = p_ints[j]
            if pj == 0:
                continue
            acc[j] = mac(j, acc[j], qi * pj, pj, pj, 0, mask)
        # acc[0] now == 0 mod 2^w; shift one limb down
        c0 = acc[0] >> w
        c0_lo, c0_hi = alo[0] >> w, ahi[0] >> w
        acc = acc[1:] + [zero]
        alo = alo[1:] + [0]
        ahi = ahi[1:] + [0]
        acc[0] = acc[0] + c0
        alo[0] += c0_lo
        ahi[0] += c0_hi
        assert -_I32_LIMIT <= alo[0] and ahi[0] <= _I32_LIMIT

    # value bound: out = (x*y + Q*p) / R with Q in [0, R)
    cands = (x.vmin * y_vmin, x.vmin * y_vmax, x.vmax * y_vmin, x.vmax * y_vmax)
    t_lo, t_hi = min(cands), max(cands)
    assert t_lo >= 0, "negative values unsupported (values are [0, vmax])"
    vmin = 0
    vmax = (t_hi + (ctx.R - 1) * ctx.p) // ctx.R + 1
    assert vmax < 3 * ctx.p, f"montmul output bound too large: {vmax / ctx.p:.3f} p"
    out = FV(tuple(acc), tuple(alo), tuple(ahi), vmin, vmax)
    return f_relax(ctx, out)


def mont_mul(ctx: FieldCtx, x: FV, y: FV) -> FV:
    """Montgomery product x*y*R^-1 mod p. Inputs: any FVs (relaxed on demand,
    values must satisfy vmax_x*vmax_y < ~p*R). Output: storage-contract FV,
    value < 2p."""
    x = _mul_ready(ctx, x)
    y = _mul_ready(ctx, y)
    return _cios(ctx, x, y.limbs, y.lo, y.hi, y.vmin, y.vmax)


def mont_square(ctx: FieldCtx, x: FV) -> FV:
    return mont_mul(ctx, x, x)


def mont_mul_const(ctx: FieldCtx, x: FV, const: int) -> FV:
    """Montgomery product with a STATIC constant (plain int in [0, R); for a
    field constant in Montgomery form). Zero limbs of the constant skip
    their MACs entirely, like the reference's baked data segments."""
    x = _mul_ready(ctx, x)
    c = ctx.limbs_of(const)
    return _cios(ctx, x, c, c, c, const, const)
