"""51x5 float-limb field track — capability mirror of the reference's
`src/51x5/` research engine (SURVEY.md §2.3).

The reference stores field elements as 5 limbs x 51 bits inside float64
mantissas and multiplies them with exact FMA algebra (Emmart, Zheng & Weems
2018; `src/51x5/fma.ts:74-923`, JS models `src/51x5/fma-js.ts`). It also
ships non-FMA fallbacks that split each 51-bit limb into 26/25-bit halves so
every partial product is exact in the available multiplier
(`src/51x5/fma.ts:618-707`, `fma-js.ts:265-392`).

TPU mapping: the TPU VPU has no 64-bit float FMA on the fast path — the
production engine of this framework is the int32 w=12 deferred-carry track
(`fields/fp.py` + the Pallas kernel), which *is* the "split until products
are exact" idea specialized to 32-bit lanes. This module keeps the 51x5
*representation and algebra* as a first-class engine for parity and for
research on f64-capable backends:

* storage: 5 x 51-bit limbs, held as exact small integers in either int64
  or float64 arrays (the float form matches the reference's f64 mantissa
  layout; `int64 <-> float64` conversion is exact below 2^52, mirroring
  `src/51x5/common.ts` int64ToFloat52/float52ToInt64);
* compute: Montgomery multiplication at radix 2^51 with partial products
  formed from 26/25-bit limb splits so every product and column sum stays
  exact in int64 — the same algebra as the reference's `montmulNoFma`
  (`fma-js.ts:265-336`), vectorized over a batch axis;
* valid for p < 2^254 (the reference requires p < 2^255 minus wiggle room,
  `src/51x5/field.ts:15-18`; we keep one extra guard bit for the lazy
  [0, 2p) range).

Requires JAX x64 (enabled locally via context, no global flag needed).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Fma51Field", "make_fma51_field"]

W = 51
N = 5
MASK51 = (1 << 51) - 1
LO = 26
MASKLO = (1 << LO) - 1


def _to_limbs(x: int) -> list[int]:
    return [(x >> (W * i)) & MASK51 for i in range(N)]


class Fma51Field:
    """Batched Montgomery field at radix 2^51, 5 limbs, int64/f64 storage.

    All ops take/return (5, *batch) arrays. Values are unreduced in
    [0, 2p); Montgomery form x' = x*R mod p with R = 2^255.
    """

    def __init__(self, p: int):
        assert p < (1 << 255) - (1 << 206), "51x5 track requires p < 2^255 - 2^206"
        # lazy [0, 2p) arithmetic needs 4p < R (CIOS bound p*(1 + 4p/R) < 2p);
        # larger p (e.g. the pasta primes ~2^254) run in strict mode:
        # canonical inputs, canonically-reduced outputs (the analog of the
        # reference's eager reduceLaneLocals partial reduction,
        # `src/51x5/arith.ts:78-99`)
        self.lazy = p < 1 << 253
        self.p = p
        self.R = 1 << (W * N)
        self.R2 = self.R * self.R % p
        self.mont_one = self.R % p
        self.p_limbs = np.array(_to_limbs(p), dtype=np.int64)
        self.two_p_limbs = np.array(_to_limbs(2 * p), dtype=np.int64)
        # mu = -p^-1 mod 2^51 (interleaved CIOS quotient constant,
        # cf. `src/51x5/fma.ts:272-277`)
        self.mu = (-pow(p, -1, 1 << W)) % (1 << W)
        # p limbs pre-split for the product phase
        self.p_lo = np.array([int(v) & MASKLO for v in self.p_limbs], dtype=np.int64)
        self.p_hi = np.array([int(v) >> LO for v in self.p_limbs], dtype=np.int64)

    # ---- I/O --------------------------------------------------------------

    def pack(self, values, montgomery: bool = True, dtype=jnp.int64) -> jnp.ndarray:
        if montgomery:
            values = [v * self.R % self.p for v in values]
        arr = np.zeros((N, len(values)), dtype=np.int64)
        for j, v in enumerate(values):
            arr[:, j] = _to_limbs(v)
        return jnp.asarray(arr).astype(dtype)

    def unpack(self, arr, montgomery: bool = True) -> list[int]:
        a = np.asarray(arr.astype(jnp.int64)).reshape(N, -1)
        out = []
        for j in range(a.shape[1]):
            v = sum(int(a[i, j]) << (W * i) for i in range(N))
            if montgomery:
                v = v * pow(self.R, -1, self.p) % self.p
            else:
                v %= self.p
            out.append(v)
        return out

    # float64 storage (exact: limbs < 2^51 < 2^53), mirroring the
    # reference's f64-mantissa layout (`src/51x5/common.ts`)
    def to_f64(self, x):
        return x.astype(jnp.float64)

    def from_f64(self, xf):
        return xf.astype(jnp.int64)

    # ---- add / sub / reduce (cf. `src/51x5/arith.ts:38-311`) --------------

    def _carry(self, cols):
        """Signed carry at radix 2^51 over the limb axis; drops overflow."""
        out = []
        carry = jnp.zeros(cols.shape[1:], dtype=jnp.int64)
        for i in range(N):
            t = cols[i] + carry
            out.append(t & MASK51)
            carry = t >> W
        return jnp.stack(out), carry

    def _sub_const_select(self, s, const_limbs):
        cl = jnp.asarray(const_limbs).reshape((N,) + (1,) * (s.ndim - 1))
        t, borrow = self._carry(s - cl)
        return jnp.where(borrow < 0, s, t)

    def add(self, x, y):
        """Lazy mode: [0,2p) inputs/outputs. Strict mode (pasta-sized p):
        canonical inputs/outputs (x+y < 2p < 2^256, handled via the overflow
        bit like montmul's tail)."""
        if self.lazy:
            s, _ = self._carry(x + y)
            return self._sub_const_select(s, self.two_p_limbs)
        s, c1 = self._carry(x + y)
        pl = jnp.asarray(self.p_limbs).reshape((N,) + (1,) * (x.ndim - 1))
        d, borrow = self._carry(s - pl)
        return jnp.where((c1 > 0) | (borrow >= 0), d, s)

    def sub(self, x, y):
        t, borrow = self._carry(x - y)
        cl = self.two_p_limbs if self.lazy else self.p_limbs
        tp = jnp.asarray(cl).reshape((N,) + (1,) * (x.ndim - 1))
        u, _ = self._carry(t + tp)
        return jnp.where(borrow < 0, u, t)

    def reduce(self, x):
        """[0, 2p) -> [0, p) (`arith.ts:101` reduceLocals analog)."""
        return self._sub_const_select(x, self.p_limbs)

    def is_equal(self, x, y):
        return jnp.all(self.reduce(x) == self.reduce(y), axis=0)

    # ---- Montgomery multiply ----------------------------------------------

    def montmul(self, x, y):
        """x*y*2^-255 mod p on (5, *batch) int64 limbs, output in [0, 2p).

        Interleaved CIOS at radix 2^51. Partial products are formed from a
        26/25 split of the left operand so each multiply is <= 77 bits...
        no — each int64 product is (26b x 51b) <= 77 bits, which overflows;
        therefore BOTH operands of every hardware multiply stay <= 26/25
        bits: the right operand is pre-split too, and cross terms are
        recombined at their correct column offsets. Exactness budget:
        column accumulators hold < 16 * 2^52 < 2^57 per outer step, well
        inside int64 (the analog of the reference's zInitial-offset
        cancellation, `fma-js.ts:141-256`, without needing float exponent
        tricks).
        """
        batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        x = jnp.broadcast_to(x, (N,) + batch)
        y = jnp.broadcast_to(y, (N,) + batch)
        zero = jnp.zeros(batch, dtype=jnp.int64)

        y_lo = [y[j] & MASKLO for j in range(N)]
        y_hi = [y[j] >> LO for j in range(N)]
        p_lo = [int(v) for v in self.p_lo]
        p_hi = [int(v) for v in self.p_hi]

        # accumulator Z: N+1 columns at radix 2^51 (values < 2^57)
        Z = [zero] * (N + 1)
        for i in range(N):
            xi = x[i]
            xi_lo = xi & MASKLO
            xi_hi = xi >> LO
            # Z += x_i * y  (products exact: 26x26 <= 52 bits, 25x25 <= 50)
            for j in range(N):
                ll = xi_lo * y_lo[j]
                lh = xi_lo * y_hi[j] + xi_hi * y_lo[j]  # < 2^53
                hh = xi_hi * y_hi[j]
                # recombine at radix 2^51: ll + lh*2^26 + hh*2^52
                Z[j] = Z[j] + ll + ((lh & ((1 << 25) - 1)) << LO)
                Z[j + 1] = Z[j + 1] + (lh >> 25) + (hh << 1)
            # quotient digit: qi = (Z0 * mu) mod 2^51
            z0 = Z[0] & MASK51
            z0_lo = z0 & MASKLO
            z0_hi = z0 >> LO
            mu_lo = self.mu & MASKLO
            mu_hi = self.mu >> LO
            qi = (z0_lo * mu_lo + (((z0_lo * mu_hi + z0_hi * mu_lo) & ((1 << 25) - 1)) << LO)) & MASK51
            qi_lo = qi & MASKLO
            qi_hi = qi >> LO
            # Z += qi * p
            for j in range(N):
                ll = qi_lo * p_lo[j]
                lh = qi_lo * p_hi[j] + qi_hi * p_lo[j]
                hh = qi_hi * p_hi[j]
                Z[j] = Z[j] + ll + ((lh & ((1 << 25) - 1)) << LO)
                Z[j + 1] = Z[j + 1] + (lh >> 25) + (hh << 1)
            # shift down one limb: Z[0] is now divisible by 2^51
            carry = Z[0] >> W
            Z = [Z[j + 1] if j < N else zero for j in range(N + 1)]
            Z[0] = Z[0] + carry
        out, c1 = self._carry(jnp.stack(Z[:N]))
        if not self.lazy:
            # strict mode: inputs canonical => total t = out + c1*2^255 with
            # t < p*(1+p/R) < 2p, c1 in {0,1}. t - p = D + (c1 + borrow)*2^255
            # where (D, borrow) is the borrow-chain of (out - p); taking D
            # whenever c1=1 or borrow=0 yields the canonical t mod p
            pl = jnp.asarray(self.p_limbs).reshape((N,) + (1,) * (out.ndim - 1))
            d, borrow = self._carry(out - pl)
            out = jnp.where((c1 > 0) | (borrow >= 0), d, out)
        return out

    def montsquare(self, x):
        return self.montmul(x, x)

    def to_montgomery(self, x):
        r2 = jnp.asarray(_to_limbs(self.R2), dtype=jnp.int64)
        return self.montmul(x, r2.reshape((N,) + (1,) * (x.ndim - 1)))

    def from_montgomery(self, x):
        one = jnp.zeros_like(x).at[0].set(1)
        return self.montmul(x, one)

    def montmul_f64(self, xf, yf):
        """Float64-storage entry point (the reference's native layout):
        exact f64<->int64 limb casts around the int64 core."""
        return self.to_f64(self.montmul(self.from_f64(xf), self.from_f64(yf)))


@lru_cache(maxsize=None)
def make_fma51_field(p: int) -> Fma51Field:
    return Fma51Field(p)


# ---- exact float64-FMA algebra model ----------------------------------------
#
# The reference's headline 51x5 multiply uses f64 FMA to form exact 102-bit
# partial products: hi = fma(x, y, 2^103) captures the high 51 product bits
# in the mantissa (rounding at ulp 2^51), lo = fma(x, y, c2 - hi) recovers
# the low bits exactly, and reinterpreting the raw float bits as int64 turns
# both into integers once constant exponent prefixes are subtracted — the
# zInitial table pre-subtracts all prefixes per accumulator column
# (`src/51x5/fma.ts:58-63, 226-317`; JS model `fma-js.ts:141-193`). TPU has
# no fast f64 FMA, so this framework executes the 26/25-split int64 algebra
# above in production; this model preserves the FLOAT algebra bit-exactly
# (fma emulated with integer round-to-nearest-even — the reference's own JS
# model must emulate fma as well, JS having no fma operator) as the parity
# artifact + oracle for any future f64-capable backend.

import struct as _struct

_C103 = 1 << 103
_C51X3 = 3 << 51
_C2 = _C103 + _C51X3
_C52 = 1 << 52
_MASK64 = (1 << 64) - 1


def _f64_bits(x: float) -> int:
    return int.from_bytes(_struct.pack("<d", x), "little")


def _bits_f64(b: int) -> float:
    return _struct.unpack("<d", (b & _MASK64).to_bytes(8, "little"))[0]


_HI_PRE = _f64_bits(float(_C103))
_LO_PRE = _f64_bits(float(_C51X3))
_C52N = _f64_bits(float(_C52))
_C51N = _f64_bits(float(_C52))  # c51 == c52 in the reference (common.ts:40-41)


def _fma_rn(a: int, b: int, c: int) -> int:
    """Exact IEEE-754 fma(a, b, c) for integer-valued float64 operands,
    emulated with integer round-to-nearest-even: the exact integer a*b + c
    rounded to the nearest representable float64 (returned as an int —
    every value in this algebra is an integer multiple of its ulp)."""
    v = a * b + c
    if v == 0:
        return 0
    sign = -1 if v < 0 else 1
    m = abs(v)
    ulp_bits = m.bit_length() - 53
    if ulp_bits <= 0:
        return v
    ulp = 1 << ulp_bits
    base, rem = divmod(m, ulp)
    if rem > ulp // 2 or (rem == ulp // 2 and base & 1):
        base += 1
    return sign * base * (1 << ulp_bits) if base.bit_length() <= 53 else (
        sign * (base >> 1) * (1 << (ulp_bits + 1))
    )


def _to_float51(x: int) -> list[int]:
    return [(x >> (W * i)) & MASK51 for i in range(N)]


def montmul_fma_model(p: int, x: int, y: int) -> int:
    """Bit-exact model of the reference's f64-FMA Montgomery multiply
    (`fma-js.ts:141-193` montmulFma): returns x*y*2^-255 mod p computed
    with the float algebra, output in [0, 2p).

    All float values here are integers, so ints stand in for f64 values;
    the bit-reinterpretation steps use real IEEE-754 encoding."""
    assert p < (1 << 255) - (1 << 206)
    X = _to_float51(x)
    Y = _to_float51(y)
    PF = _to_float51(p)
    p_inv = (-pow(p, -1, 1 << W)) % (1 << W)  # pInv = -p^-1 mod 2^51... see note
    # NOTE: the reference multiplies Z0 * pInv with pInv = p^-1? It needs
    # q = Z0 * (-p^-1) so that Z0 + q*p == 0 mod 2^51; mu below matches.
    mu = p_inv

    lo_count = [1, 2, 3, 4, 5, 4, 3, 2, 1, 0]
    hi_count = [0, 1, 2, 3, 4, 5, 4, 3, 2, 1]
    z_init = [
        (-(2 * (hi_count[i] * _HI_PRE + lo_count[i] * _LO_PRE)) & _MASK64)
        for i in range(10)
    ]
    # interpret as signed int64
    def s64(v):
        v &= _MASK64
        return v - (1 << 64) if v >> 63 else v

    zi = [s64(z) for z in z_init]
    Z = [zi[i] for i in range(5)]

    def f2i(f: int) -> int:
        return s64(_f64_bits(float(f)))

    for i in range(5):
        xi = X[i]
        yj = Y[0]
        hi1 = _fma_rn(xi, yj, _C103)
        lo1 = _fma_rn(xi, yj, _C2 - hi1)
        Z[0] = s64(Z[0] + f2i(lo1))  # BigInt64Array stores wrap mod 2^64

        q_bits = ((Z[0] * mu) & MASK51) + _C51N
        qi = int(_bits_f64(q_bits) - _C52)

        hi2 = _fma_rn(qi, PF[0], _C103)
        lo2 = _fma_rn(qi, PF[0], _C2 - hi2)
        carry = f2i(hi1) + f2i(hi2) + (s64(Z[0] + f2i(lo2)) >> W)

        for j in range(1, 5):
            yj = Y[j]
            pj = PF[j]
            hi1 = _fma_rn(xi, yj, _C103)
            hi2 = _fma_rn(qi, pj, _C103)
            lo1 = _fma_rn(xi, yj, _C2 - hi1)
            lo2 = _fma_rn(qi, pj, _C2 - hi2)
            Z[j - 1] = s64(Z[j] + carry + f2i(lo1) + f2i(lo2))
            carry = f2i(hi1) + f2i(hi2)
        Z[4] = s64(zi[5 + i] + carry)
    assert Z[4] >= 0, f"negative top limb {Z[4]}"

    carry = 0
    out = 0
    for i in range(5):
        lo = (Z[i] + carry) & MASK51
        limb = int(_bits_f64(lo + _C52N) - _C52)
        assert limb >= 0
        out |= limb << (W * i)
        carry = Z[i] >> W
    assert carry == 0, f"carry {carry}"
    return out
