"""Host-side packed-bytes <-> limb-vector codec.

TPU-native analog of the reference's in-WASM conversions
(`src/wasm/field-helpers.ts:211-301` fromPackedBytes / toPackedBytes): the
byte <-> limb re-packing is host-side data loading here (it happens once at
the I/O boundary). Hot paths dispatch to the native C++ runtime tier
(`native/codec.cpp` via `utils.native_codec`, multi-threaded over elements)
when a toolchain is available, with a numpy-vectorized fallback.

Also provides rejection-sampled uniform values below a bound
(`src/bigint/field-random.ts:30-101` / `curve-random.ts:151-194` analog).
"""

from __future__ import annotations

import numpy as np

from ..utils import native_codec
from .limbs import LimbScheme

__all__ = [
    "bytes_to_limbs",
    "limbs_to_bytes",
    "ints_to_bytes",
    "bytes_to_ints",
    "random_uniform_limbs",
]


def bytes_to_limbs(data: np.ndarray, scheme: LimbScheme) -> np.ndarray:
    """(B, nbytes) uint8 little-endian -> (n, B) int32 canonical limbs."""
    assert data.dtype == np.uint8 and data.ndim == 2
    B, nbytes = data.shape
    native = native_codec.bytes_to_limbs_native(data, scheme.n, scheme.w)
    if native is not None:
        return native
    out = np.zeros((scheme.n, B), dtype=np.int32)
    for i in range(scheme.n):
        lo_bit = scheme.w * i
        acc = np.zeros(B, dtype=np.int64)
        j0 = lo_bit // 8
        j1 = min((lo_bit + scheme.w + 7) // 8, nbytes)
        for j in range(j0, j1):
            shift = 8 * j - lo_bit
            b = data[:, j].astype(np.int64)
            acc += (b << shift) if shift >= 0 else (b >> -shift)
        out[i] = (acc & scheme.mask).astype(np.int32)
    return out


def limbs_to_bytes(limbs: np.ndarray, scheme: LimbScheme, nbytes: int | None = None) -> np.ndarray:
    """(n, B) canonical int32 limbs -> (B, nbytes) uint8 little-endian."""
    n, B = limbs.shape
    if nbytes is None:
        nbytes = (scheme.bits + 7) // 8
    native = native_codec.limbs_to_bytes_native(limbs, scheme.w, nbytes)
    if native is not None:
        return native
    out = np.zeros((B, nbytes), dtype=np.uint8)
    for j in range(nbytes):
        lo_bit = 8 * j
        acc = np.zeros(B, dtype=np.int64)
        i0 = max(lo_bit - scheme.w + 1, 0) // scheme.w
        i1 = min((lo_bit + 8 + scheme.w - 1) // scheme.w, n)
        for i in range(i0, i1):
            shift = scheme.w * i - lo_bit
            v = limbs[i].astype(np.int64)
            acc += (v << shift) if shift >= 0 else (v >> -shift)
        out[:, j] = (acc & 0xFF).astype(np.uint8)
    return out


def ints_to_bytes(values, nbytes: int) -> np.ndarray:
    """Python ints -> (B, nbytes) uint8 LE (boundary conversion)."""
    out = np.empty((len(values), nbytes), dtype=np.uint8)
    for k, v in enumerate(values):
        out[k] = np.frombuffer(int(v).to_bytes(nbytes, "little"), dtype=np.uint8)
    return out


def bytes_to_ints(data: np.ndarray) -> list[int]:
    """(B, nbytes) uint8 LE -> Python ints."""
    return [int.from_bytes(row.tobytes(), "little") for row in data]


def _less_than(limbs: np.ndarray, bound_limbs: np.ndarray) -> np.ndarray:
    """Lexicographic (big-endian-limb) compare: limbs < bound, vectorized.
    limbs (n, B), bound_limbs (n,). Returns (B,) bool."""
    native = native_codec.below_bound_native(limbs, bound_limbs)
    if native is not None:
        return native
    n, B = limbs.shape
    lt = np.zeros(B, dtype=bool)
    decided = np.zeros(B, dtype=bool)
    for i in range(n - 1, -1, -1):
        bi = int(bound_limbs[i])
        lt |= ~decided & (limbs[i] < bi)
        decided |= limbs[i] != bi
    return lt


def random_uniform_limbs(
    rng: np.random.Generator, bound: int, count: int, scheme: LimbScheme
) -> np.ndarray:
    """(n, count) canonical limbs uniform in [0, bound) by vectorized
    rejection sampling of bit_length(bound)-bit strings."""
    bits = bound.bit_length()
    nbytes = (bits + 7) // 8
    top_mask = (1 << (bits - 8 * (nbytes - 1))) - 1 if bits % 8 else 0xFF
    bound_limbs = np.array(scheme.to_limbs(bound), dtype=np.int64)
    out = np.zeros((scheme.n, count), dtype=np.int32)
    todo = np.arange(count)
    while todo.size:
        draw = rng.integers(0, 256, size=(todo.size, nbytes), dtype=np.uint8)
        draw[:, -1] &= top_mask
        limbs = bytes_to_limbs(draw, scheme)
        ok = _less_than(limbs, bound_limbs)
        out[:, todo[ok]] = limbs[:, ok]
        todo = todo[~ok]
    return out
