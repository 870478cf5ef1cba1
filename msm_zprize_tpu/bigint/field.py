"""Pure-Python bigint finite-field arithmetic — the test oracle.

This is the spec layer: every vectorized/Pallas kernel in ``msm_zprize_tpu.fields``
is differential-tested against these functions on random inputs.

Capability parity with the reference's bigint field layer
(``/root/reference/src/bigint/field.ts:12-187`` and ``field-util.ts:8-42``):
mod / add / sub / mul / exp / egcd-inverse / Tonelli-Shanks sqrt / isSquare /
rootsOfUnity, plus ``montgomery_params`` computing the limb layout.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from functools import cached_property

__all__ = [
    "mod",
    "field_exp",
    "egcd",
    "inverse",
    "sqrt",
    "is_square",
    "two_adicity",
    "roots_of_unity",
    "montgomery_params",
    "MontgomeryParams",
    "Field",
    "random_field",
    "random_fields",
]


def mod(x: int, p: int) -> int:
    return x % p


def field_exp(a: int, n: int, p: int) -> int:
    """a^n mod p (n >= 0)."""
    return pow(a % p, n, p)


def egcd(a: int, b: int) -> tuple[int, int, int]:
    """Extended gcd: returns (g, s, t) with s*a + t*b = g = gcd(a, b)."""
    old_r, r = a, b
    old_s, s = 1, 0
    old_t, t = 0, 1
    while r != 0:
        q = old_r // r
        old_r, r = r, old_r - q * r
        old_s, s = s, old_s - q * s
        old_t, t = t, old_t - q * t
    return old_r, old_s, old_t


def inverse(a: int, p: int) -> int:
    """a^-1 mod p; raises ZeroDivisionError on a == 0 (mod p).

    Mirrors the must-throw behavior of the reference (`bigint/field.ts:117`).
    """
    a = a % p
    if a == 0:
        raise ZeroDivisionError("inverse of 0 in F_p")
    g, s, _ = egcd(a, p)
    if g != 1:
        raise ZeroDivisionError("not invertible")
    return s % p


def two_adicity(p: int) -> tuple[int, int]:
    """Write p - 1 = 2^S * t with t odd; return (S, t)."""
    t = p - 1
    S = 0
    while t % 2 == 0:
        t //= 2
        S += 1
    return S, t


def is_square(a: int, p: int) -> bool:
    a = a % p
    if a == 0:
        return True
    return pow(a, (p - 1) // 2, p) == 1


def _find_nonsquare(p: int) -> int:
    z = 2
    while is_square(z, p):
        z += 1
    return z


def sqrt(a: int, p: int) -> int | None:
    """Tonelli-Shanks square root; returns None for non-squares.

    Oracle for `bigint/field.ts:127-160` and the WASM sqrt module
    (`field-sqrt.ts`).
    """
    a = a % p
    if a == 0:
        return 0
    if p % 4 == 3:
        r = pow(a, (p + 1) // 4, p)
        return r if r * r % p == a else None
    S, t = two_adicity(p)
    z = _find_nonsquare(p)
    c = pow(z, t, p)
    r = pow(a, (t + 1) // 2, p)
    u = pow(a, t, p)  # u = a^t; invariant r^2 = a * u
    M = S
    while u != 1:
        # find least i with u^(2^i) == 1
        i = 0
        v = u
        while v != 1:
            v = v * v % p
            i += 1
            if i == M:
                return None  # non-square
        b = pow(c, 1 << (M - i - 1), p)
        r = r * b % p
        c = b * b % p
        u = u * c % p
        M = i
    return r


def roots_of_unity(p: int) -> list[int]:
    """[w^(2^0), ..., w^(2^(S-1))] chain of 2^k-th roots, w a generator of the
    2-Sylow subgroup (cf. `bigint/field.ts:161`)."""
    S, t = two_adicity(p)
    z = _find_nonsquare(p)
    w = pow(z, t, p)
    out = [w]
    for _ in range(S - 1):
        w = w * w % p
        out.append(w)
    return out


@dataclass(frozen=True)
class MontgomeryParams:
    """Limb layout for a modulus p at w bits/limb (cf. `field-util.ts:19-41`)."""

    p: int
    w: int  # bits per limb
    n: int  # number of limbs
    K: int  # total bits = n * w
    R: int  # Montgomery radix 2^K
    R2: int  # R^2 mod p
    R_mod_p: int
    p_inv_neg: int  # mu = -p^-1 mod 2^w  (per-limb Montgomery constant)
    mask: int  # 2^w - 1

    @property
    def limbs_p(self) -> list[int]:
        return to_limbs(self.p, self.w, self.n)

    @property
    def limbs_2p(self) -> list[int]:
        return to_limbs(2 * self.p, self.w, self.n)


def montgomery_params(p: int, w: int, min_extra_bits: int = 2) -> MontgomeryParams:
    """Choose limb count n such that R = 2^(n*w) > 2^min_extra_bits * 2p.

    The vectorized engine does unreduced arithmetic in [0, 2p); Montgomery
    multiplication of such inputs stays below 2p iff R > 4p, hence the default
    of 2 extra bits above 2p.
    """
    b = p.bit_length()
    n = -(-(b + 1 + min_extra_bits) // w)  # ceil
    K = n * w
    R = 1 << K
    assert R > (2 * p) << min_extra_bits
    mu = (-pow(p, -1, 1 << w)) % (1 << w)
    return MontgomeryParams(
        p=p,
        w=w,
        n=n,
        K=K,
        R=R,
        R2=R * R % p,
        R_mod_p=R % p,
        p_inv_neg=mu,
        mask=(1 << w) - 1,
    )


def to_limbs(x: int, w: int, n: int) -> list[int]:
    mask = (1 << w) - 1
    return [(x >> (w * i)) & mask for i in range(n)]


def from_limbs(limbs, w: int) -> int:
    x = 0
    for i, l in enumerate(limbs):
        x += int(l) << (w * i)
    return x


def random_field(p: int, rng=None) -> int:
    """Rejection-sampled uniform element of [0, p) (`field-random.ts:30`)."""
    nbytes = (p.bit_length() + 7) // 8
    while True:
        if rng is not None:
            x = rng.getrandbits(8 * nbytes)
        else:
            x = int.from_bytes(secrets.token_bytes(nbytes), "little")
        # mask down to bit length to keep rejection rate < 1/2
        x &= (1 << p.bit_length()) - 1
        if x < p:
            return x


def random_fields(p: int, count: int, rng=None) -> list[int]:
    return [random_field(p, rng) for _ in range(count)]


class Field:
    """Convenience wrapper bundling the modulus (oracle-side only)."""

    def __init__(self, p: int):
        self.p = p

    def mod(self, x):
        return x % self.p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return a * b % self.p

    def square(self, a):
        return a * a % self.p

    def neg(self, a):
        return (-a) % self.p

    def inv(self, a):
        return inverse(a, self.p)

    def exp(self, a, n):
        return pow(a % self.p, n, self.p)

    def sqrt(self, a):
        return sqrt(a, self.p)

    def is_square(self, a):
        return is_square(a, self.p)

    def random(self, rng=None):
        return random_field(self.p, rng)

    @cached_property
    def bit_length(self):
        return self.p.bit_length()
