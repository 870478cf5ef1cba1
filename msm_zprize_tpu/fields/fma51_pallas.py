"""51x5 limb track ON DEVICE: Pallas codec + Montgomery-mul kernel.

Device-path counterpart of `fields/fma51.py` (the CPU research engine) and
of the reference's 51x5 WASM track (`src/51x5/fma.ts`, SURVEY.md §2.3).

Storage layout — the reference's 5 x 51-bit limb vectors, mapped to int32
lanes: each 51-bit limb is held as a (lo 26-bit, hi 25-bit) row pair —
exactly the split the reference's no-FMA fallback uses so every partial
product is exact in the available multiplier (`src/51x5/fma.ts:618-707`,
`fma-js.ts:265-392`). The TOP limb's hi row carries 26 bits (52-bit top
limb), mirroring the f64-mantissa headroom the reference exploits to keep
lazy [0, 2p) values for p < 2^255 - 2^206 (`src/51x5/field.ts:15-18`):
total capacity 256 bits.

Compute — "split until products are exact", continued one level down: the
TPU VPU's exact multiplier is 24 bits (int32 low product), so inside the
kernel the 26/25-bit halves are re-split into w=12 digits and multiplied
with the interval-tracked CIOS of `fields/pallas_field.py`. On CPUs the
stop-width is 26 bits (i64 multiplier, the reference's choice); on TPU it
is 12 — same algebra, hardware-determined split width. The codec in/out of
the 51x5 pair rows costs ~2% of a multiply (static shifts/ors).

This makes the 51x5 representation a first-class DEVICE format: points can
live in (10, B) pair-row arrays end-to-end, with whole-curve-op kernels
(see `curves/pallas_curve.CurveKernels` with codec=Fma51Codec) computing on
them directly. `scripts/kernel_bench.py --fma51` A/Bs this against native
w=12 storage.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_field as pf
from .pallas_field import FV, FieldCtx

__all__ = ["Fma51Codec", "PackedCodec", "montmul51_pallas"]

W51 = 51
N51 = 5
LANES = 128
SUBLANES = 16
BLOCK = SUBLANES * LANES


class _RowCodecMethods:
    """Shared machinery for "row codecs": a field value stored as `rows`
    int32 planes, row r holding bits [offsets[r], offsets[r]+widths[r]) of
    the value. Subclasses define `widths` (and thus the bit capacity);
    decode/encode translate rows <-> the kernel's w-bit digit form with
    static shifts/ors only."""

    @cached_property
    def offsets(self) -> tuple:
        off, acc = [], 0
        for wd in self.widths:
            off.append(acc)
            acc += wd
        return tuple(off)

    @cached_property
    def capacity_bits(self) -> int:
        return self.offsets[-1] + self.widths[-1]

    # ---- host-side pack/unpack -----------------------------------------

    def pack(self, values) -> np.ndarray:
        """Python ints in [0, 2^256) -> (10, B) int32 pair rows."""
        out = np.zeros((self.rows, len(values)), dtype=np.int32)
        for j, v in enumerate(values):
            assert 0 <= v < (1 << self.capacity_bits)
            for r, (off, wd) in enumerate(zip(self.offsets, self.widths)):
                out[r, j] = (v >> off) & ((1 << wd) - 1)
        return out

    def unpack(self, arr) -> list:
        a = np.asarray(jax.device_get(arr)).reshape(self.rows, -1)
        out = []
        for j in range(a.shape[1]):
            v = 0
            for r, off in enumerate(self.offsets):
                v |= int(a[r, j]) << off
            out.append(v)
        return out

    # ---- in-kernel decode/encode ----------------------------------------

    def decode(self, ctx: FieldCtx, rows, vmax: int) -> FV:
        """rows: list/array of 10 int32 planes -> FV of ctx.n w-bit digits.

        Pure static shifts/ors; each w-bit digit draws from at most two
        pair rows (row widths >= 25 > w)."""
        w = ctx.w
        digits = []
        for k in range(ctx.n):
            lo_bit, hi_bit = w * k, w * k + w
            val = None
            for r, (off, wd) in enumerate(zip(self.offsets, self.widths)):
                if off + wd <= lo_bit or off >= hi_bit:
                    continue
                piece = rows[r]
                if off < lo_bit:
                    piece = piece >> (lo_bit - off)
                else:
                    # pre-mask before the left shift so the int32 lane
                    # never sees > 2^w + shift bits
                    shift = off - lo_bit
                    if shift:
                        piece = (piece & ((1 << (hi_bit - off)) - 1)) << shift
                val = piece if val is None else val | piece
            if val is None:
                val = jnp.zeros_like(rows[0])
            digits.append(val & ctx.mask)
        arr = jnp.stack(digits, axis=0)
        return FV(arr, 0, ctx.mask, 0, ctx.mask, min(vmax, (1 << self.capacity_bits) - 1))

    def encode(self, ctx: FieldCtx, x: FV) -> list:
        """FV -> 10 int32 pair planes. Canonicalizes digits and reduces the
        value into [0, 2p) so it fits the 256-bit pair capacity."""
        w, mask = ctx.w, ctx.mask
        x = pf.f_relax(ctx, x)
        # sequential exact carry -> canonical digits
        carry = None
        limbs = []
        for i in range(ctx.n):
            t = x.arr[i] if carry is None else x.arr[i] + carry
            limbs.append(t & mask)
            carry = t >> w
        vmax = x.vmax

        def cond_sub(limbs, c_ints):
            t, borrow = [], None
            for a, ci in zip(limbs, c_ints):
                d = a - int(ci) if borrow is None else a - int(ci) + borrow
                t.append(d & mask)
                borrow = d >> w
            keep = borrow < 0
            return [jnp.where(keep, a, d) for a, d in zip(limbs, t)]

        lim = ctx.limbs_of  # static limbs of a constant
        while vmax >= 2 * ctx.p:
            k = 2
            while 2 * k * ctx.p <= vmax:
                k <<= 1
            limbs = cond_sub(limbs, lim(k * ctx.p))
            vmax = max(k * ctx.p - 1, vmax - k * ctx.p)

        rows = []
        for off, wd in zip(self.offsets, self.widths):
            val = None
            for k in range(ctx.n):
                dlo = w * k
                if dlo + w <= off or dlo >= off + wd:
                    continue
                piece = limbs[k]
                if dlo < off:
                    piece = piece >> (off - dlo)
                else:
                    shift = dlo - off
                    if shift:
                        # keep only bits that land inside this row's width
                        piece = (piece & ((1 << (wd - shift)) - 1)) << shift
                val = piece if val is None else val | piece
            if val is None:
                val = jnp.zeros_like(limbs[0])
            rows.append(val & ((1 << wd) - 1))
        return rows

    # ---- XLA-level (non-kernel) conversions ------------------------------

    def to_digits(self, ctx: FieldCtx, arr):
        """(10, *batch) pair rows -> (n, *batch) canonical w-bit digits,
        as plain jnp ops (glue/test path, not the hot kernels)."""
        rows = [arr[r] for r in range(self.rows)]
        fv = self.decode(ctx, rows, (1 << self.capacity_bits) - 1)
        return fv.arr

    def from_digits(self, ctx: FieldCtx, digits, vmax: int):
        """(n, *batch) digit planes (canonical, value < 2p) -> (10, *batch)."""
        fv = FV(digits, 0, ctx.mask, 0, ctx.mask, min(vmax, 2 * ctx.p - 1))
        rows = self.encode(ctx, fv)
        return jnp.stack(rows, axis=0)


@dataclass(frozen=True)
class Fma51Codec(_RowCodecMethods):
    """5 x 51-bit limbs as 10 int32 rows of (26, 25)-bit half pairs; the
    top pair's hi row holds 26 bits (52-bit top limb, 256-bit capacity).
    The reference's float-mantissa limb vectors (`src/51x5/common.ts`,
    `field-base.ts`) as a DEVICE storage format."""

    p: int

    def __post_init__(self):
        assert self.p < (1 << 255) - (1 << 206), "51x5 requires p < 2^255 - 2^206"

    rows: int = 10

    @cached_property
    def widths(self) -> tuple:
        w = []
        for i in range(N51):
            w.append(26)
            w.append(25 if i < N51 - 1 else 26)
        return tuple(w)

    def pack51(self, limbs51) -> list:
        """5 x 51-bit int limb list -> 10 pair ints (for cross-checks vs
        `fields/fma51.py` which speaks 51-bit limbs)."""
        v = sum(int(l) << (W51 * i) for i, l in enumerate(limbs51))
        return [
            (v >> off) & ((1 << wd) - 1)
            for off, wd in zip(self.offsets, self.widths)
        ]


@dataclass(frozen=True)
class PackedCodec(_RowCodecMethods):
    """Dense 31-bit rows — the minimum-bandwidth storage format, valid for
    ANY p (unlike the 51x5 layout's 255-bit ceiling). ceil((bits(p)+1)/31)
    int32 rows hold a [0, 2p) value; a 377-bit field stores in 13 rows vs
    32 native w=12 digit planes, so every gather/tree HBM transfer of the
    MSM engine moves 2.5x less. Decode to digit form is <= 2 static
    shift/or ops per digit (each w-bit digit spans at most two rows)."""

    p: int
    row_bits: int = 31

    @cached_property
    def widths(self) -> tuple:
        need = self.p.bit_length() + 1  # [0, 2p) capacity
        n_rows = -(-need // self.row_bits)
        return (self.row_bits,) * n_rows

    @cached_property
    def rows(self) -> int:
        return len(self.widths)


def _montmul51_kernel(x_ref, y_ref, o_ref, *, codec, ctx):
    # whole-block reads/writes (static row indexing of the VALUE): per-row
    # ref[i] ops lower to dynamic_slice in interpret mode, which rejects
    # mixed varying/unvarying operands under shard_map's check_vma
    xb, yb = x_ref[...], y_ref[...]
    xr = [xb[i] for i in range(codec.rows)]
    yr = [yb[i] for i in range(codec.rows)]
    x = codec.decode(ctx, xr, 2 * ctx.p - 1)
    y = codec.decode(ctx, yr, 2 * ctx.p - 1)
    out = pf.mont_mul(ctx, x, y)
    rows = codec.encode(ctx, out)
    o_ref[...] = jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("codec", "ctx", "interpret"))
def _montmul51_call(x, y, *, codec, ctx, interpret):
    nb = x.shape[1]
    kernel = functools.partial(_montmul51_kernel, codec=codec, ctx=ctx)
    grid = (nb // SUBLANES,)
    spec = pl.BlockSpec(
        (codec.rows, SUBLANES, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    # varying-mesh-axes of the output = union over inputs, so the kernel
    # composes with shard_map's check_vma=True (cf. pallas_curve._curve_call);
    # inputs below the union (e.g. a replicated beta against sharded coords)
    # are pvary'd up so every kernel operand carries identical vma
    from ..utils.vma import pvary_like

    vma = frozenset().union(
        *(getattr(jax.typeof(a), "vma", frozenset()) for a in (x, y))
    )
    x, y = pvary_like(x, vma), pvary_like(y, vma)

    if interpret and vma:
        # direct evaluation under shard_map's check_vma (see
        # pallas_curve._ValRef for why the HLO interpreter can't)
        from ..curves.pallas_curve import _ValRef

        xr, yr = _ValRef(x), _ValRef(y)
        o = _ValRef(jnp.zeros((codec.rows, nb, LANES), jnp.int32))
        kernel(xr, yr, o)
        return o.val

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((codec.rows, nb, LANES), jnp.int32, vma=vma),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=interpret,
        name="montmul51",
    )(x, y)


def montmul51_pallas(p: int, x, y, interpret: bool = False, codec=None):
    """Montgomery product on (rows, *batch) row-codec arrays (default the
    10-row 51x5 pair layout; pass any row codec, e.g. PackedCodec).

    Montgomery radix R = 2^(n*w) of the digit engine (n = limb count at
    w = 12) — the VALUE semantics are x*y*R^-1 mod p with inputs/outputs
    in [0, 2p), stored in the codec's row layout."""
    from ..bigint.field import montgomery_params

    codec = Fma51Codec(p) if codec is None else codec
    mp = montgomery_params(p, 12, 4)
    ctx = FieldCtx(p, 12, mp.n)
    batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
    size = int(np.prod(batch)) if batch else 1
    xf = jnp.broadcast_to(x.reshape(codec.rows, -1), (codec.rows, size))
    yf = jnp.broadcast_to(y.reshape(codec.rows, -1), (codec.rows, size))
    pad = (-size) % BLOCK
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad)))
        yf = jnp.pad(yf, ((0, 0), (0, pad)))
    total = size + pad
    xf = xf.reshape(codec.rows, total // LANES, LANES)
    yf = yf.reshape(codec.rows, total // LANES, LANES)
    out = _montmul51_call(xf, yf, codec=codec, ctx=ctx, interpret=interpret)
    out = out.reshape(codec.rows, total)[:, :size]
    return out.reshape((codec.rows,) + batch)
