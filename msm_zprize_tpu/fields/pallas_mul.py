"""Pallas TPU kernel for batched Montgomery multiplication.

The hot kernel of the whole framework (the reference spends 60-80% of MSM
time in WASM `multiply`, `doc/zprize22.md:58`).

Design notes (v5e measured):
* int32 multiply sustains ~13 T op/s on the VPU — the limiter is DEPENDENCY
  CHAINS, not multiply throughput. The kernel is therefore structured for
  instruction-level parallelism:
  - batch rows are (32, 128) = 4 vregs, so every emitted op is 4 independent
    vector ops;
  - the schoolbook phase iterates j-outer/i-inner so consecutive statements
    update *different* columns (independent chains of length n per column);
  - Montgomery reduction is the non-interleaved 3-product form
    (q = -T*p^{-1} mod R as a second constant-coefficient convolution)
    instead of the serial per-column CIOS scan — only the 4 short carry
    chains are sequential.
* p, -p^-1 mod R limbs and mu are scalar immediates baked at trace time
  (tracing is the codegen, like the reference's runtime-generated WASM);
  zero limbs of p skip their MACs entirely.

Column bounds (w = 12): schoolbook columns < n*2^24 <= 2^29; q-columns
< n*2^24; all < 2^31. Output < 2p for inputs < 4p (R > 16p).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["montmul_pallas", "exp_const_pallas"]

LANES = 128
SUBLANES = 32  # 4 vregs per limb row -> 4-way ILP per op
BLOCK = SUBLANES * LANES


def _mm_rows(xs, ys, *, n, w, mask, p_ints, pn_ints):
    """Montgomery product on limb-row lists (the kernel body's algebra,
    reusable inside other kernels, e.g. the fused exponentiation loop).
    Inputs: canonical limbs, values < 4p; output limbs canonical, < 2p."""
    zero = jnp.zeros_like(xs[0])

    # ---- phase 1: schoolbook columns T = x*y (j-outer: independent chains)
    C = [zero] * (2 * n)
    for j in range(n):
        yj = ys[j]
        for i in range(n):
            C[i + j] = C[i + j] + xs[i] * yj

    # ---- phase 2a: carry the low n columns -> canonical t_lo (T mod R)
    t_lo = []
    carry = zero
    for k in range(n):
        t = C[k] + carry
        t_lo.append(t & mask)
        carry = t >> w
    carry_low_T = carry  # carry of T's low half into column n

    # ---- phase 2b: q columns = t_lo * PN mod R (constant coefficients)
    Q = [zero] * n
    for j in range(n):
        tj = t_lo[j]
        for k in range(j, n):
            if pn_ints[k - j] != 0:
                Q[k] = Q[k] + tj * pn_ints[k - j]
    # carry -> canonical q (mod R: final carry discarded)
    q = []
    carry = zero
    for k in range(n):
        t = Q[k] + carry
        q.append(t & mask)
        carry = t >> w

    # ---- phase 2c: U = q * p (constant coefficients, zero limbs skipped)
    U = [zero] * (2 * n)
    for j in range(n):
        qj = q[j]
        for i in range(n):
            if p_ints[i] != 0:
                U[i + j] = U[i + j] + qj * p_ints[i]

    # ---- phase 2d: carry of the low half of (t_lo + U_low); digits are 0
    carry = zero
    for k in range(n):
        carry = (t_lo[k] + U[k] + carry) >> w

    # ---- phase 2e: result = high half of T + U + carries
    carry = carry + carry_low_T
    outs = []
    for k in range(n):
        hiT = C[n + k] if k < n - 1 else zero  # C has 2n-1 meaningful columns
        t = hiT + U[n + k] + carry
        outs.append(t & mask)
        carry = t >> w
    return outs


def _montmul_kernel(x_ref, y_ref, o_ref, *, n, w, mask, p_ints, pn_ints, mu):
    xs = [x_ref[i] for i in range(n)]
    ys = [y_ref[i] for i in range(n)]
    outs = _mm_rows(xs, ys, n=n, w=w, mask=mask, p_ints=p_ints, pn_ints=pn_ints)
    for i in range(n):
        o_ref[i] = outs[i]


def _exp_kernel(bits_ref, x_ref, o_ref, *, n, w, mask, p_ints, pn_ints,
                one_ints, nbits):
    """x^e in ONE kernel invocation: MSB-first square-and-multiply as an
    in-kernel fori_loop (the exponent's bit pattern arrives as a small
    operand row, selected per iteration with an iota compare).

    The field-level exp/inverse otherwise issue 2 kernel launches per
    exponent bit — ~900 sequential launches for a 377-bit Fermat inverse,
    which at ~0.3-0.6 ms per tiny-batch launch dominated Edwards'
    batch_normalize (585 ms of the 2^18 MSM)."""
    xs = [x_ref[i] for i in range(n)]
    shape = xs[0].shape
    bits_row = bits_ref[...]  # (1, nbits)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, nbits), 1)
    acc0 = jnp.stack(
        [jnp.full(shape, int(v), jnp.int32) for v in one_ints], axis=0
    )
    xarr = jnp.stack(xs, axis=0)

    def step(i, acc):
        rows = [acc[j] for j in range(n)]
        sq = _mm_rows(rows, rows, n=n, w=w, mask=mask, p_ints=p_ints,
                      pn_ints=pn_ints)
        st = _mm_rows(sq, [xarr[j] for j in range(n)], n=n, w=w, mask=mask,
                      p_ints=p_ints, pn_ints=pn_ints)
        bit = jnp.sum(jnp.where(iota == i, bits_row, 0))
        return jnp.where(bit > 0, jnp.stack(st, 0), jnp.stack(sq, 0))

    out = jax.lax.fori_loop(0, nbits, step, acc0)
    for i in range(n):
        o_ref[i] = out[i]


@functools.partial(
    jax.jit, static_argnames=("n", "w", "mask", "p_ints", "pn_ints", "mu", "interpret")
)
def _montmul_call(x, y, *, n, w, mask, p_ints, pn_ints, mu, interpret):
    nb = x.shape[1]
    kernel = functools.partial(
        _montmul_kernel, n=n, w=w, mask=mask, p_ints=p_ints, pn_ints=pn_ints, mu=mu
    )
    grid = (nb // SUBLANES,)
    spec = pl.BlockSpec(
        (n, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb, LANES), jnp.int32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(x, y)


def montmul_pallas(field, x, y, interpret: bool = False):
    """Batched Montgomery product via the Pallas kernel.

    x, y: (n, *batch) canonical int32 limbs (values < 4p). Output in [0, 2p).
    The batch is padded to a multiple of 4096 lanes internally.
    """
    n, w = field.n, field.w
    batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    size = int(np.prod(batch)) if batch else 1
    xf = jnp.broadcast_to(
        x.reshape(x.shape + (1,) * (len(batch) - (x.ndim - 1))), (n,) + batch
    ).reshape(n, size)
    yf = jnp.broadcast_to(
        y.reshape(y.shape + (1,) * (len(batch) - (y.ndim - 1))), (n,) + batch
    ).reshape(n, size)
    pad = (-size) % BLOCK
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
        yf = jnp.pad(yf, ((0, 0), (0, pad)))
    total = size + pad
    xf = xf.reshape(n, total // LANES, LANES)
    yf = yf.reshape(n, total // LANES, LANES)
    pn = (-pow(field.p, -1, field.R)) % field.R
    out = _montmul_call(
        xf,
        yf,
        n=n,
        w=w,
        mask=field.mask,
        p_ints=tuple(int(v) for v in field.p_limbs),
        pn_ints=tuple(field.scheme.to_limbs(pn)),
        mu=int((-pow(field.p, -1, 1 << w)) % (1 << w)),
        interpret=interpret,
    )
    out = out.reshape(n, total)
    if pad:
        out = out[:, :size]
    return out.reshape((n,) + batch)


@functools.partial(
    jax.jit,
    static_argnames=("n", "w", "mask", "p_ints", "pn_ints", "one_ints", "bits",
                     "interpret"),
)
def _exp_call(x, *, n, w, mask, p_ints, pn_ints, one_ints, bits, interpret):
    nb = x.shape[1]
    nbits = len(bits)
    kernel = functools.partial(
        _exp_kernel, n=n, w=w, mask=mask, p_ints=p_ints, pn_ints=pn_ints,
        one_ints=one_ints, nbits=nbits,
    )
    grid = (nb // SUBLANES,)
    spec = pl.BlockSpec(
        (n, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    bits_arr = jnp.asarray(np.array(bits, dtype=np.int32)[None, :])
    bits_spec = pl.BlockSpec(
        (1, nbits), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, nb, LANES), jnp.int32),
        grid=grid,
        in_specs=[bits_spec, spec],
        out_specs=spec,
        interpret=interpret,
    )(bits_arr, x)


def exp_const_pallas(field, x, e: int, interpret: bool = False):
    """x^e (Montgomery form, static exponent) in ONE kernel launch.

    Replaces the 2-launches-per-bit lax.scan for TPU backends; the main
    consumer is the Fermat inverse at the bottom of batch_inverse, where
    the chain runs on a tiny batch and launch overhead dominates."""
    assert e >= 1
    n, w = field.n, field.w
    batch = x.shape[1:]
    size = int(np.prod(batch)) if batch else 1
    xf = x.reshape(n, size)
    pad = (-size) % BLOCK
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
    total = size + pad
    xf = xf.reshape(n, total // LANES, LANES)
    pn = (-pow(field.p, -1, field.R)) % field.R
    bits = tuple(int(b) for b in bin(e)[2:])  # MSB first
    one_mont = field.R % field.p
    out = _exp_call(
        xf,
        n=n,
        w=w,
        mask=field.mask,
        p_ints=tuple(int(v) for v in field.p_limbs),
        pn_ints=tuple(field.scheme.to_limbs(pn)),
        one_ints=tuple(field.scheme.to_limbs(one_mont)),
        bits=bits,
        interpret=interpret,
    )
    out = out.reshape(n, total)
    if pad:
        out = out[:, :size]
    return out.reshape((n,) + batch)
