"""Pure-Python twisted-Edwards curve oracle: -x^2 + y^2 = 1 + d x^2 y^2 (a = -1).

Extended coordinates (X, Y, Z, T) with x = X/Z, y = Y/Z, T = XY/Z; identity is
(0, 1, 1, 0). Strongly-unified addition add-2008-hwcd-3 with k = 2d, mirroring
the reference's ``src/bigint/twisted-edwards.ts:28-211``.
"""

from __future__ import annotations

from dataclasses import dataclass

from .field import Field, inverse, random_field, sqrt

__all__ = ["EdwardsParams", "EdwardsCurve"]


@dataclass(frozen=True)
class EdwardsParams:
    label: str
    modulus: int
    order: int
    cofactor: int
    d: int
    generator: tuple[int, int]


class EdwardsCurve:
    zero = (0, 1, 1, 0)

    def __init__(self, params: EdwardsParams):
        self.params = params
        self.F = Field(params.modulus)
        self.d = params.d % params.modulus
        self.k = 2 * self.d % params.modulus  # add constant k = 2d

    def is_zero(self, P):
        # (0, y, z, 0) with y == z
        p = self.F.p
        X, Y, Z, T = P
        return X % p == 0 and (Y - Z) % p == 0

    def eq(self, P, Q):
        p = self.F.p
        X1, Y1, Z1, _ = P
        X2, Y2, Z2, _ = Q
        return (X1 * Z2 - X2 * Z1) % p == 0 and (Y1 * Z2 - Y2 * Z1) % p == 0

    def neg(self, P):
        X, Y, Z, T = P
        p = self.F.p
        return ((-X) % p, Y, Z, (-T) % p)

    def add(self, P, Q):
        """Strongly unified add-2008-hwcd-3 (`twisted-edwards.ts:52-85`);
        handles doubling and identity with no branches."""
        p = self.F.p
        X1, Y1, Z1, T1 = P
        X2, Y2, Z2, T2 = Q
        A = (Y1 - X1) * (Y2 - X2) % p
        B = (Y1 + X1) * (Y2 + X2) % p
        C = T1 * self.k % p * T2 % p
        D = 2 * Z1 * Z2 % p
        E = (B - A) % p
        F_ = (D - C) % p
        G = (D + C) % p
        H = (B + A) % p
        X3 = E * F_ % p
        Y3 = G * H % p
        T3 = E * H % p
        Z3 = F_ * G % p
        return (X3, Y3, Z3, T3)

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

    def double(self, P):
        return self.add(P, P)

    def scale(self, s: int, P):
        R = self.zero
        Q = P
        while s > 0:
            if s & 1:
                R = self.add(R, Q)
            Q = self.double(Q)
            s >>= 1
        return R

    def to_affine(self, P):
        X, Y, Z, _ = P
        zi = inverse(Z, self.F.p)
        return (X * zi % self.F.p, Y * zi % self.F.p)

    def from_affine(self, xy):
        x, y = xy
        p = self.F.p
        return (x % p, y % p, 1, x * y % p)

    def is_on_curve(self, P) -> bool:
        """-X^2 + Y^2 = Z^2 + d T^2  and  T Z = X Y  (`twisted-edwards.ts:157`)."""
        p = self.F.p
        X, Y, Z, T = P
        if Z % p == 0:
            return False
        lhs = (-X * X + Y * Y - Z * Z - self.d * T % p * T) % p
        return lhs == 0 and (T * Z - X * Y) % p == 0

    def is_in_subgroup(self, P) -> bool:
        return self.is_zero(self.scale(self.params.order, P))

    def random(self, rng=None):
        """Sample y, solve x^2 = (y^2 - 1) / (d y^2 + 1), cofactor-clear
        (`twisted-edwards.ts:269-312`)."""
        p = self.F.p
        while True:
            y = random_field(p, rng)
            denom = (self.d * y * y + 1) % p
            if denom == 0:
                continue
            x2 = (y * y - 1) * inverse(denom, p) % p
            x = sqrt(x2, p)
            if x is None:
                continue
            if rng is not None and rng.getrandbits(1):
                x = (-x) % p
            P = self.from_affine((x, y))
            P = self.scale(self.params.cofactor, P)
            if self.is_zero(P):
                continue
            return P
