"""Limb codec and generic limb-vector arithmetic (plain integers, no modulus).

Layout convention for the whole framework: a vector of big integers is an
``int32`` array of shape ``(n, *batch)`` — limbs little-endian along axis 0,
batch in the trailing axes. On TPU this puts the batch in the lane dimension
(128 wide) and limbs in sublanes, so every limb operation is a full-width
VPU op over the batch.

Radix: ``w`` bits per limb (default 12). The choice is driven by int32
accumulator width: schoolbook + Montgomery-reduction columns accumulate up to
``2n`` products of ``w``-bit limbs plus carries, and ``2n * 2^(2w) < 2^31``
must hold (for w=12, n<=64). This is the TPU analog of the reference's
deferred-carry budget tuned to the i64 accumulator
(`/root/reference/src/wasm/multiply-montgomery.ts:45-48`,
`doc/zprize22.md:126-151`) — here the budget is the int32 VPU lane.

Capability parity: `src/wasm/field-helpers.ts` (limb load/store, carries,
packed-bytes conversion, bit-slice extraction).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax.numpy as jnp
import numpy as np

__all__ = [
    "LimbScheme",
    "pack",
    "unpack",
    "carry_chain",
    "mul_low",
    "mul_full",
    "mul_shift_floor",
    "add_mod_pow2",
    "sub_mod_pow2",
    "extract_bits",
]

DTYPE = jnp.int32


@dataclass(frozen=True)
class LimbScheme:
    """w bits per limb, n limbs (total capacity n*w bits)."""

    w: int
    n: int

    @cached_property
    def mask(self) -> int:
        return (1 << self.w) - 1

    @cached_property
    def bits(self) -> int:
        return self.n * self.w

    def to_limbs(self, x: int) -> list[int]:
        return [(x >> (self.w * i)) & self.mask for i in range(self.n)]

    def const(self, x: int) -> np.ndarray:
        """(n, 1) int32 constant column for broadcasting against (n, B)."""
        return np.array(self.to_limbs(x), dtype=np.int32)[:, None]


def pack(values, scheme: LimbScheme) -> np.ndarray:
    """Python ints -> (n, B) int32 limb array."""
    out = np.empty((scheme.n, len(values)), dtype=np.int32)
    for j, v in enumerate(values):
        assert 0 <= v < (1 << scheme.bits), "value out of limb range"
        for i in range(scheme.n):
            out[i, j] = (v >> (scheme.w * i)) & scheme.mask
    return out


def unpack(arr, scheme: LimbScheme) -> list[int]:
    """(n, B) limb array -> list of B Python ints (limbs must be canonical)."""
    if hasattr(arr, "devices"):  # device array: fetch in ONE transfer
        import jax

        arr = jax.device_get(arr)
    arr = np.asarray(arr)
    flat = arr.reshape(scheme.n, -1)
    out = []
    for j in range(flat.shape[1]):
        x = 0
        for i in range(scheme.n):
            x += int(flat[i, j]) << (scheme.w * i)
        out.append(x)
    return out


def carry_chain(limbs, w: int, n_out: int | None = None, drop_overflow: bool = False):
    """Sequential carry propagation: (m, B) possibly-oversized non-negative
    limbs -> (n_out, B) canonical limbs in [0, 2^w).

    If ``drop_overflow``, the final carry is discarded (arithmetic mod
    2^(w*n_out)); otherwise the carry must provably fit (caller's invariant).
    """
    mask = (1 << w) - 1
    m = limbs.shape[0]
    if n_out is None:
        n_out = m
    carry = None
    out = []
    for i in range(n_out):
        t = limbs[i] if i < m else jnp.zeros_like(limbs[0])
        if carry is not None:
            t = t + carry
        out.append(t & mask)
        carry = t >> w  # arithmetic shift: works for signed intermediates too
    if not drop_overflow and carry is not None:
        # fold any residual carry into an extra limb position if present
        pass
    return jnp.stack(out, axis=0)


def _column_products(x, y, n_cols: int):
    """Schoolbook columns C_k = sum_{i+j=k} x_i*y_j for k < n_cols, as an
    accumulated (n_cols, B) int32 array. Caller guarantees no overflow."""
    nx = x.shape[0]
    ny = y.shape[0]
    batch = x.shape[1:]
    C = jnp.zeros((n_cols,) + batch, dtype=DTYPE)
    for j in range(ny):
        lo = j
        hi = min(j + nx, n_cols)
        if lo >= n_cols:
            break
        C = C.at[lo:hi].add(x[: hi - lo] * y[j])
    return C


def mul_full(x, y, w: int):
    """Exact product of (nx,B) * (ny,B) -> (nx+ny, B) canonical limbs."""
    n_cols = x.shape[0] + y.shape[0]
    C = _column_products(x, y, n_cols)
    return carry_chain(C, w, n_cols, drop_overflow=True)


def mul_low(x, y, w: int, n_out: int):
    """Low ``n_out`` limbs of x*y (i.e. product mod 2^(w*n_out))."""
    C = _column_products(x, y, n_out)
    return carry_chain(C, w, n_out, drop_overflow=True)


def mul_shift_floor(x, y, w: int, shift_limbs: int, n_out: int):
    """floor((x*y) >> (w*shift_limbs)), low ``n_out`` limbs of the result.

    Computes the full product columns and carries from the bottom so the
    floor is exact (low columns feed carries into the kept part).
    """
    full = mul_full(x, y, w)
    hi = full[shift_limbs : shift_limbs + n_out]
    if hi.shape[0] < n_out:
        pad = jnp.zeros((n_out - hi.shape[0],) + hi.shape[1:], dtype=DTYPE)
        hi = jnp.concatenate([hi, pad], axis=0)
    return hi


def add_mod_pow2(x, y, w: int, n: int):
    """(x + y) mod 2^(w*n) over canonical limbs; result canonical."""
    return carry_chain(x[:n] + y[:n], w, n, drop_overflow=True)


def sub_mod_pow2(x, y, w: int, n: int):
    """(x - y) mod 2^(w*n) over canonical limbs; result canonical
    (two's-complement wraparound)."""
    mask = (1 << w) - 1
    borrow = None
    out = []
    for i in range(n):
        t = x[i] - y[i]
        if borrow is not None:
            t = t + borrow
        out.append(t & mask)
        borrow = t >> w  # -1 or 0
    return jnp.stack(out, axis=0)


def negate_mod_pow2(x, w: int, n: int):
    """(-x) mod 2^(w*n)."""
    zero = jnp.zeros_like(x[:n])
    return sub_mod_pow2(zero, x, w, n)


def extract_bits(limbs, offset: int, count: int, w: int):
    """Read the ``count``-bit window starting at bit ``offset`` from a
    canonical (n, B) limb vector -> (B,) int32.

    TPU-native analog of `src/wasm/field-helpers.ts:307-358`
    (``extractBitSlice``); handles windows spanning any number of limbs.
    """
    n = limbs.shape[0]
    j = offset // w
    sh = offset % w
    val = None
    produced = 0  # bits produced so far
    k = j
    first = True
    while produced < count and k < n:
        piece = limbs[k]
        if first:
            piece = piece >> sh
            got = w - sh
            first = False
        else:
            got = w
        piece = piece.astype(DTYPE) << produced
        val = piece if val is None else val | piece
        produced += got
        k += 1
    if val is None:
        val = jnp.zeros(limbs.shape[1:], dtype=DTYPE)
    return val & ((1 << count) - 1)
