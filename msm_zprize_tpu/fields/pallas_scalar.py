"""Fused Pallas TPU kernel for MSM scalar preparation.

One kernel computes, per scalar lane: the GLV (Babai) decomposition
s = (-1)^g0 * u0 + lambda * (-1)^g1 * u1  (`fields/scalar.py::GlvScalar.
decompose`, mirroring `src/wasm/glv.ts:35-229`) AND the signed-digit
windowing of both halves (`scalar.py::signed_digits`,
`msm-batched-affine.ts:177-200`) — emitting the (2K, B) digit-magnitude and
sign planes the bucket engine consumes.

Rationale: as jnp glue this phase is ~500 small HLO ops whose intermediates
round-trip HBM between fusions (measured 24 ms of the 2^16 MSM,
`scripts/tree_probe.py`); fused in VMEM it is a single pass over the
scalars. All multiplier constants (m_i = round(2^K0 * c_i), basis rows
v_ij) are Python-int immediates baked at trace time.

The kernel reproduces the jnp path BIT-EXACTLY (same rounding, same
two's-complement accumulator width), so the two implementations cross-check
each other in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["glv_digits_pallas"]

LANES = 128
SUBLANES = 16
BLOCK = SUBLANES * LANES


def _mul_shift_floor_ints(xs, m_ints, w, mask, shift_limbs, n_out, zero):
    """floor((x * m) >> (w*shift_limbs)) low n_out limbs; xs canonical rows,
    m a static limb tuple. Exact: carries propagate from column 0."""
    nx = len(xs)
    nm = len(m_ints)
    cols = [zero] * (nx + nm)
    for j in range(nm):
        mj = int(m_ints[j])
        if mj == 0:
            continue
        for i in range(nx):
            cols[i + j] = cols[i + j] + xs[i] * mj
    out = []
    carry = zero
    for k in range(shift_limbs + n_out):
        t = cols[k] + carry
        if k >= shift_limbs:
            out.append(t & mask)
        carry = t >> w
    return out


def _mul_low_ints(xs, v_ints, w, mask, n_out, zero):
    """Low n_out canonical limbs of x * v (v static)."""
    cols = [zero] * n_out
    for j in range(min(len(v_ints), n_out)):
        vj = int(v_ints[j])
        if vj == 0:
            continue
        for i in range(min(len(xs), n_out - j)):
            cols[i + j] = cols[i + j] + xs[i] * vj
    out = []
    carry = zero
    for k in range(n_out):
        t = cols[k] + carry
        out.append(t & mask)
        carry = t >> w
    return out


def _sub_mod(xs, ys, w, mask, n):
    out = []
    borrow = None
    for i in range(n):
        t = xs[i] - ys[i] if borrow is None else xs[i] - ys[i] + borrow
        out.append(t & mask)
        borrow = t >> w
    return out


def _add_mod(xs, ys, w, mask, n):
    out = []
    carry = None
    for i in range(n):
        t = xs[i] + ys[i] if carry is None else xs[i] + ys[i] + carry
        out.append(t & mask)
        carry = t >> w
    return out


def _scalar_kernel(s_ref, mag_ref, sgn_ref, *, S, c, K):
    """S: a GlvScalar (static); outputs mags/signs (2K, sub, lanes)."""
    w, mask = S.w, (1 << S.w) - 1
    n, n_half, n_acc = S.n, S.n_half, S.n_acc
    xs = [s_ref[i] for i in range(n)]
    zero = jnp.zeros_like(xs[0])

    u0 = _mul_shift_floor_ints(
        xs, S.m0, w, mask, S.K0_limbs, n_half + 1, zero
    )
    u1 = _mul_shift_floor_ints(
        xs, S.m1, w, mask, S.K0_limbs, n_half + 1, zero
    )

    def term(u, sign_m, vname):
        sgn_v, vlimbs = S.sv[vname]
        return sign_m * sgn_v, _mul_low_ints(u, vlimbs, w, mask, n_acc, zero)

    sg_a, t_a = term(u0, S.sign_m0, "v00")
    sg_b, t_b = term(u1, S.sign_m1, "v10")
    sg_c, t_c = term(u0, S.sign_m0, "v01")
    sg_d, t_d = term(u1, S.sign_m1, "v11")

    s_acc = [xs[i] if i < n else zero for i in range(n_acc)]
    zeros_acc = [zero] * n_acc

    def combine(base, sgn, t):
        # base - sgn*t (mod 2^(w*n_acc))
        if sgn > 0:
            return _sub_mod(base, t, w, mask, n_acc)
        return _add_mod(base, t, w, mask, n_acc)

    s0 = combine(combine(s_acc, sg_a, t_a), sg_b, t_b)
    s1 = combine(combine(zeros_acc, sg_c, t_c), sg_d, t_d)

    def sign_abs(x):
        top = (x[n_acc - 1] >> (w - 1)) & 1
        neg = _sub_mod(zeros_acc, x, w, mask, n_acc)
        absx = [jnp.where(top != 0, nl, xl) for nl, xl in zip(neg, x)]
        return top, absx[:n_half]

    g0, a0 = sign_abs(s0)
    g1, a1 = sign_abs(s1)

    half, full = 1 << (c - 1), 1 << c

    def digits(a, g, out_row0):
        carry = zero
        for k in range(K):
            # extract c bits at offset k*c from n_half canonical limbs
            off = k * c
            j, sh = off // w, off % w
            val = zero
            produced = 0
            first = True
            jj = j
            while produced < c and jj < n_half:
                piece = a[jj]
                if first:
                    piece = piece >> sh
                    got = w - sh
                    first = False
                else:
                    got = w
                val = val | (piece << produced)
                produced += got
                jj += 1
            l = (val & (full - 1)) + carry
            big = l > half
            carry = jnp.where(big, 1, 0).astype(jnp.int32)
            mag = jnp.where(big, full - l, l)
            sgn = jnp.where(big, 1, 0).astype(jnp.int32) ^ g
            sgn = jnp.where(mag == 0, 0, sgn)
            mag_ref[out_row0 + k] = mag
            sgn_ref[out_row0 + k] = sgn

    digits(a0, g0, 0)
    digits(a1, g1, K)


def _simple_kernel(s_ref, mag_ref, sgn_ref, *, n, w, c, K):
    """Signed-digit windowing only (no GLV): the twisted-Edwards scalar
    prep (`scalar.py::signed_digits` as one fused pass)."""
    xs = [s_ref[i] for i in range(n)]
    zero = jnp.zeros_like(xs[0])
    half, full = 1 << (c - 1), 1 << c
    carry = zero
    for k in range(K):
        off = k * c
        j, sh = off // w, off % w
        val = zero
        produced = 0
        first = True
        jj = j
        while produced < c and jj < n:
            piece = xs[jj]
            if first:
                piece = piece >> sh
                got = w - sh
                first = False
            else:
                got = w
            val = val | (piece << produced)
            produced += got
            jj += 1
        l = (val & (full - 1)) + carry
        big = l > half
        carry = jnp.where(big, 1, 0).astype(jnp.int32)
        mag = jnp.where(big, full - l, l)
        sgn = jnp.where(big, 1, 0).astype(jnp.int32)
        sgn = jnp.where(mag == 0, 0, sgn)
        mag_ref[k] = mag
        sgn_ref[k] = sgn


@functools.partial(jax.jit, static_argnames=("n", "w", "c", "K", "interpret"))
def _simple_call(s, *, n, w, c, K, interpret):
    nb = s.shape[1]
    kernel = functools.partial(_simple_kernel, n=n, w=w, c=c, K=K)
    grid = (nb // SUBLANES,)

    def spec(k):
        return pl.BlockSpec(
            (k, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    vma = getattr(jax.typeof(s), "vma", frozenset())
    return pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((K, nb, LANES), jnp.int32, vma=vma)
            for _ in range(2)
        ),
        grid=grid,
        in_specs=[spec(s.shape[0])],
        out_specs=tuple(spec(K) for _ in range(2)),
        interpret=interpret,
        name="simple_digits",
    )(s)


def simple_digits_pallas(scalars, c: int, K: int, w: int = 12,
                         interpret: bool = False):
    """scalars: (n, N) canonical limbs. Returns (mags, signs) (K, N) —
    bit-identical to `scalar.py::signed_digits` (cross-checked in tests)."""
    n, N = scalars.shape
    pad = (-N) % BLOCK
    sf = jnp.pad(scalars, ((0, 0), (0, pad))) if pad else scalars
    total = N + pad
    sf = sf.reshape(n, total // LANES, LANES)
    mags, signs = _simple_call(sf, n=n, w=w, c=c, K=K, interpret=interpret)
    return mags.reshape(K, total)[:, :N], signs.reshape(K, total)[:, :N]


@functools.partial(jax.jit, static_argnames=("S", "c", "K", "interpret"))
def _scalar_call(s, *, S, c, K, interpret):
    nb = s.shape[1]
    kernel = functools.partial(_scalar_kernel, S=S, c=c, K=K)
    grid = (nb // SUBLANES,)

    def spec(k):
        return pl.BlockSpec(
            (k, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )

    vma = getattr(jax.typeof(s), "vma", frozenset())
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((2 * K, nb, LANES), jnp.int32, vma=vma)
            for _ in range(2)
        ),
        grid=grid,
        in_specs=[spec(s.shape[0])],
        out_specs=tuple(spec(2 * K) for _ in range(2)),
        interpret=interpret,
        name="glv_digits",
    )(s)
    return out


def glv_digits_pallas(S, scalars, c: int, K: int, interpret: bool = False):
    """scalars: (n, N) canonical limbs in [0, q). Returns (mags, signs) of
    shape (K, 2N) — GLV half 0 occupying point columns [0, N), half 1
    [N, 2N) — matching `batched_affine.glv_prep`'s layout."""
    n, N = scalars.shape
    pad = (-N) % BLOCK
    sf = jnp.pad(scalars, ((0, 0), (0, pad))) if pad else scalars
    total = N + pad
    sf = sf.reshape(n, total // LANES, LANES)
    mags, signs = _scalar_call(sf, S=S, c=c, K=K, interpret=interpret)
    mags = mags.reshape(2 * K, total)[:, :N]
    signs = signs.reshape(2 * K, total)[:, :N]
    m = jnp.concatenate([mags[:K], mags[K:]], axis=-1)  # (K, 2N)
    s = jnp.concatenate([signs[:K], signs[K:]], axis=-1)
    return m, s
