"""Vectorized scalar modules: GLV decomposition + signed-digit windowing.

TPU-native equivalents of the reference's scalar WASM modules
(`src/scalar-glv.ts:19-129`, `src/scalar-simple.ts`, `src/wasm/glv.ts:35-229`):

* ``GlvScalar.decompose``: batched lattice (Babai) decomposition
  s = ±s0 + lambda*(±s1) with half-width s0, s1, via multiply-high by
  precomputed rounded constants — all int32 limb arithmetic, no division.
* ``signed_digits``: c-bit signed-digit recoding (digit magnitudes in
  [0, 2^(c-1)], sign flags) matching `msm-batched-affine.ts:177-200`.

Scalars are plain (non-Montgomery) little-endian limb vectors, shape
``(n, *batch)`` int32, radix 2^w.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..bigint.glv import GlvParams, glv_params
from . import limbs as L
from .limbs import DTYPE, LimbScheme

__all__ = ["GlvScalar", "SimpleScalar", "GlvScalarSpecialMsm", "signed_digits", "make_glv_scalar"]


class SimpleScalar:
    """Plain scalar codec + window extraction (non-GLV path, for twisted
    Edwards; cf. `src/scalar-simple.ts`)."""

    def __init__(self, q: int, w: int = 12):
        self.q = q
        self.w = w
        self.bits = q.bit_length()
        self.n = -(-self.bits // w)
        self.scheme = LimbScheme(w, self.n)

    def pack(self, values) -> np.ndarray:
        return L.pack([v % self.q for v in values], self.scheme)

    def unpack(self, arr) -> list[int]:
        return L.unpack(arr, self.scheme)


class GlvScalar(SimpleScalar):
    """GLV decomposition over a batch of scalars.

    Precomputes (at Python level, exact integer math):
      m_i = round(2^K0 * c_i) for the Babai coordinates c0 = v11/det,
      c1 = -v01/det, with K0 = a whole number of limbs >= bits(q) + w.
    Device-side, per scalar s:
      u_i  = floor(s * |m_i| >> K0)          (>= 0, multiply-high)
      x_i  = sign(m_i) * u_i                 (static signs)
      s0   = s - x0*v00 - x1*v10             (mod 2^(w*n_acc), signed)
      s1   = -(x0*v01 + x1*v11)
    then sign/abs split. |s_i| <= 2^(max_bits+2).
    """

    def __init__(self, q: int, lambda_: int, w: int = 12):
        super().__init__(q, w)
        g = glv_params(q, lambda_)
        self.glv = g
        self.lambda_ = lambda_
        # effective bound: basis bound + 2 bits rounding slack
        self.max_bits = g.max_bits + 2
        self.n_half = -(-self.max_bits // w)
        # accumulator wide enough for sign + |s_i|: one extra limb
        self.n_acc = self.n_half + 2
        assert self.n_acc * w > self.max_bits + 1

        K0_limbs = self.n + 1
        self.K0_limbs = K0_limbs
        K0 = K0_limbs * w
        det = g.det

        def rounded(c_num: int) -> tuple[int, int]:
            m = ((c_num << K0) * 2 + det) // (2 * det)  # round to nearest
            sign = 1 if m >= 0 else -1
            return sign, abs(m)

        self.sign_m0, m0 = rounded(g.v11)
        self.sign_m1, m1 = rounded(-g.v01)
        n_m = max(-(-m0.bit_length() // w), -(-m1.bit_length() // w), 1)
        m_scheme = LimbScheme(w, n_m)
        self.m0 = np.array(m_scheme.to_limbs(m0), dtype=np.int32)
        self.m1 = np.array(m_scheme.to_limbs(m1), dtype=np.int32)
        # basis rows with static signs
        self.sv = {}
        for name, v in (("v00", g.v00), ("v01", g.v01), ("v10", g.v10), ("v11", g.v11)):
            sgn = 1 if v >= 0 else -1
            nv = max(-(-abs(v).bit_length() // w), 1)
            self.sv[name] = (sgn, np.array(LimbScheme(w, nv).to_limbs(abs(v)), dtype=np.int32))

    def decompose(self, s):
        """s: (n, B) canonical limbs of scalars in [0, q).

        Returns (sign0, u0, sign1, u1): signs (B,) int32 in {0,1}, u_i
        (n_half, B) canonical limbs with u_i < 2^max_bits, such that
        s == (-1)^sign0 * u0 + lambda * (-1)^sign1 * u1  (mod q).
        """
        w = self.w
        B = s.shape[1:]
        m0 = jnp.asarray(self.m0)[(...,) + (None,) * len(B)]
        m1 = jnp.asarray(self.m1)[(...,) + (None,) * len(B)]

        u0 = L.mul_shift_floor(s, m0, w, self.K0_limbs, self.n_half + 1)
        u1 = L.mul_shift_floor(s, m1, w, self.K0_limbs, self.n_half + 1)

        n_acc = self.n_acc

        def term(u, sign_m, vname):
            sgn_v, vlimbs = self.sv[vname]
            v = jnp.asarray(vlimbs)[(...,) + (None,) * len(B)]
            prod = L.mul_low(u, v, w, n_acc)
            return sign_m * sgn_v, prod  # static sign of x_i * v

        # s0 = s - (x0*v00 + x1*v10); s1 = -(x0*v01 + x1*v11)
        sg_a, t_a = term(u0, self.sign_m0, "v00")
        sg_b, t_b = term(u1, self.sign_m1, "v10")
        sg_c, t_c = term(u0, self.sign_m0, "v01")
        sg_d, t_d = term(u1, self.sign_m1, "v11")

        s_acc = L.carry_chain(s, w, n_acc, drop_overflow=True)
        zero = jnp.zeros_like(s_acc)

        def combine(base, sgn, t):
            if sgn > 0:
                return L.sub_mod_pow2(base, t, w, n_acc)
            return L.add_mod_pow2(base, t, w, n_acc)

        # combine(base, sgn, t) == base - sgn*t
        s0 = combine(combine(s_acc, sg_a, t_a), sg_b, t_b)
        s1 = combine(combine(zero, sg_c, t_c), sg_d, t_d)

        def sign_abs(x):
            top_bit = (x[n_acc - 1] >> (w - 1)) & 1  # two's-complement sign
            neg = L.negate_mod_pow2(x, w, n_acc)
            absx = jnp.where(top_bit.astype(bool), neg, x)
            return top_bit.astype(DTYPE), absx[: self.n_half]

        sign0, a0 = sign_abs(s0)
        sign1, a1 = sign_abs(s1)
        return sign0, a0, sign1, a1

    def pack_half(self, values) -> np.ndarray:
        return L.pack(values, LimbScheme(self.w, self.n_half))

    def unpack_half(self, arr) -> list[int]:
        return L.unpack(arr, LimbScheme(self.w, self.n_half))


class GlvScalarSpecial(SimpleScalar):
    """GLV decomposition by Barrett DIVISION for lambda ~= sqrt(q) — the
    reference's `glvSpecial` track (`src/wasm/glv.ts:248-411`), as batched
    limb arithmetic:

        s1 = floor(s / lambda)  (Barrett: (s * m) >> K, m = floor(2^K / l),
                                 plus a <=2-step conditional correction —
                                 `reduceByOne`, glv.ts:270)
        s0 = s - s1 * lambda

    so s = s0 + lambda * s1 exactly (both halves non-negative, s0 < lambda).
    ``decompose_no_msb`` additionally forces s0 < 2^(b-1) by the conditional
    flip s0 -> lambda - s0, s1 -> s1 + 1 with a sign flag — the NAF-friendly
    form (`decomposeNoMsb`, glv.ts:369).

    Applies when lambda^2 > q (e.g. BLS12-377/381, where lambda = z^2 - 1 ~
    sqrt(q)); the production MSM uses the general lattice path
    (`GlvScalar`), matching the reference's choice (`parallel.ts:54`)."""

    def __init__(self, q: int, lambda_: int, w: int = 12):
        super().__init__(q, w)
        # lambda ~ sqrt(q) within a couple of bits on either side (BLS12-381's
        # lambda = z^2 - 1 sits just BELOW sqrt(q): s1 = s//lambda then needs
        # bits(q) - bits(lambda) + 1 bits)
        assert abs(2 * lambda_.bit_length() - q.bit_length()) <= 3, (
            "glvSpecial needs lambda ~ sqrt(q)"
        )
        self.lambda_ = lambda_
        self.half_bits = max(
            lambda_.bit_length(), q.bit_length() - lambda_.bit_length() + 1
        )
        self.n_half = -(-self.half_bits // w)
        # Barrett constant: m = floor(2^K / lambda), K a limb multiple
        # covering bits(q) + w so the quotient error is <= 2
        self.K_limbs = -(-(q.bit_length() + w) // w)
        K = self.K_limbs * w
        m = (1 << K) // lambda_
        n_m = max(-(-m.bit_length() // w), 1)
        self.m = np.array(LimbScheme(w, n_m).to_limbs(m), dtype=np.int32)
        # n_half + 1 limbs: the correction loop subtracts lambda over the
        # (n_half+1)-limb accumulator, and a short operand would be CLAMPED
        # by jnp's out-of-bounds indexing (silently re-reading the top limb)
        self.l_limbs = np.array(
            LimbScheme(w, self.n_half + 1).to_limbs(lambda_), dtype=np.int32
        )

    def decompose(self, s):
        """s: (n, B) canonical limbs in [0, q). Returns (u0, u1) with
        s == u0 + lambda * u1, u0 < lambda, both canonical (n_half, B)."""
        w = self.w
        B = s.shape[1:]
        m = jnp.asarray(self.m)[(...,) + (None,) * len(B)]
        lam = jnp.asarray(self.l_limbs)[(...,) + (None,) * len(B)]
        n_h = self.n_half

        q1 = L.mul_shift_floor(s, m, w, self.K_limbs, n_h + 1)
        # r = s - q1 * lambda (mod 2^(w*(n_h+1))) — fits: r in [0, ~3 lambda)
        prod = L.mul_low(q1, lam, w, n_h + 1)
        r = L.sub_mod_pow2(s, prod, w, n_h + 1)

        one = jnp.zeros_like(q1).at[0].set(1)
        for _ in range(2):  # quotient error <= 2: two correction rounds
            d = L.sub_mod_pow2(r, lam, w, n_h + 1)
            # r >= lambda  <=>  no borrow out of the top limb
            top = d[n_h] >> (w - 1)  # sign bit of the two's-complement top
            ge = (top & 1) == 0
            r = jnp.where(ge, d, r)
            q1 = jnp.where(ge, L.add_mod_pow2(q1, one, w, n_h + 1), q1)
        return r[:n_h], q1[:n_h]

    def decompose_no_msb(self, s):
        """NAF-friendly variant: returns (sign0, u0, u1) with
        s == (-1)^sign0 * u0 + lambda * u1 and u0 < 2^(half_bits - 1)."""
        u0, u1 = self.decompose(s)
        w = self.w
        n_h = self.n_half
        hb = self.half_bits - 1
        lam = jnp.asarray(self.l_limbs)[(...,) + (None,) * (u0.ndim - 1)]
        big = L.extract_bits(u0, hb, 1, w) != 0
        flipped = L.sub_mod_pow2(lam, u0, w, n_h)
        one = jnp.zeros_like(u1).at[0].set(1)
        u0 = jnp.where(big, flipped, u0)
        u1 = jnp.where(big, L.add_mod_pow2(u1, one, w, n_h), u1)
        return big.astype(DTYPE), u0, u1


class GlvScalarSpecialMsm(SimpleScalar):
    """MSM-pipeline adapter for the glvSpecial track: exposes the same
    decompose surface as `GlvScalar` (two signed halves) over the Barrett-
    division decomposition, so `msm_batched_affine` can run a lambda~sqrt(q)
    curve end-to-end on the special path — the reference's `glvSpecial`
    consumer role (`src/wasm/glv.ts:248-411`; decision point
    `src/parallel.ts:54`). s = (-1)^g0 * u0 + lambda * u1 with
    u0 < 2^(half_bits-1) (decomposeNoMsb's NAF-friendly form), u1 unsigned."""

    def __init__(self, q: int, lambda_: int, w: int = 12):
        super().__init__(q, w)
        # normalize to the ~sqrt(q)-sized eigenvalue: curves may store the
        # conjugate q - lambda_small (BLS12-377 does); dividing by the small
        # one and flipping u1's sign gives s = u0 - lambda*u1 (mod q)
        lam_eff = min(lambda_, q - lambda_)
        self._neg1 = lam_eff != lambda_
        self._sp = GlvScalarSpecial(q, lam_eff, w)
        self.lambda_ = lambda_
        self.max_bits = self._sp.half_bits
        self.n_half = self._sp.n_half

    def decompose(self, s):
        g0, u0, u1 = self._sp.decompose_no_msb(s)
        g1 = jnp.ones_like(g0) if self._neg1 else jnp.zeros_like(g0)
        # zero halves keep sign 0 (signed_digits folds signs per digit; a
        # negative zero is harmless but keep the convention deterministic)
        return g0, u0, g1, u1

    def pack_half(self, values) -> np.ndarray:
        return L.pack(list(values), LimbScheme(self.w, self.n_half))

    def unpack_half(self, arr) -> list[int]:
        return L.unpack(arr, LimbScheme(self.w, self.n_half))


def signed_digits(u, c: int, n_windows: int, w: int, scalar_sign=None):
    """Signed-digit windowing of canonical limb scalars u (n, B).

    Returns (mags, signs): int32 arrays of shape (n_windows, B) with digit
    magnitudes in [0, 2^(c-1)] and sign flags in {0, 1}, such that
    u == sum_k (-1)^signs[k] * mags[k] * 2^(k*c)   (as integers).

    ``n_windows`` must satisfy n_windows*c >= bits(u) + 1 so the final
    carry is absorbed. If ``scalar_sign`` (B,) is given, all digit signs
    are XORed with it (folding a GLV sign flip into the digits).
    """
    mags, signs = [], []
    carry = jnp.zeros(u.shape[1:], dtype=DTYPE)
    half = 1 << (c - 1)
    full = 1 << c
    for k in range(n_windows):
        l = L.extract_bits(u, k * c, c, w) + carry
        big = l > half
        carry = big.astype(DTYPE)
        mag = jnp.where(big, full - l, l)
        sgn = big.astype(DTYPE)
        if scalar_sign is not None:
            sgn = sgn ^ scalar_sign
        # zero digits keep sign 0 for determinism
        sgn = jnp.where(mag == 0, 0, sgn)
        mags.append(mag)
        signs.append(sgn)
    return jnp.stack(mags, axis=0), jnp.stack(signs, axis=0)


@lru_cache(maxsize=None)
def make_glv_scalar(q: int, lambda_: int, w: int = 12) -> GlvScalar:
    return GlvScalar(q, lambda_, w)
