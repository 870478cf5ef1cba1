"""Pure-Python short-Weierstrass curve oracle (a = 0): y^2 = x^3 + b.

Affine and projective models, mirroring the reference's
``src/bigint/affine-weierstrass.ts:29-175`` and
``src/bigint/projective-weierstrass.ts:18-232`` (add-1998-cmo-2 /
dbl-1998-cmo-2 formulas). Points:

* affine: ``None`` is the identity, otherwise a ``(x, y)`` tuple of ints.
* projective: ``(X, Y, Z)`` tuple; identity is ``(0, 1, 0)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from .field import Field, inverse, is_square, random_field, sqrt

__all__ = ["WeierstrassParams", "AffineCurve", "ProjectiveCurve"]


@dataclass(frozen=True)
class WeierstrassParams:
    label: str
    modulus: int  # p, base field
    order: int  # q, scalar field (subgroup order)
    cofactor: int
    b: int  # y^2 = x^3 + b  (a = 0 only, like the reference)
    generator: tuple[int, int]
    # endomorphism constants: lambda (cube root of 1 in F_q), beta (in F_p)
    # with lambda * (x, y) = (beta * x, y) on the subgroup
    lambda_: int | None = None
    beta: int | None = None


class AffineCurve:
    """Oracle affine curve ops (`affine-weierstrass.ts:29-175`)."""

    def __init__(self, params: WeierstrassParams):
        self.params = params
        self.F = Field(params.modulus)
        self.b = params.b % params.modulus

    # identity is None
    zero = None

    def is_zero(self, P):
        return P is None

    def eq(self, P, Q):
        return P == Q

    def neg(self, P):
        if P is None:
            return None
        x, y = P
        return (x, (-y) % self.F.p)

    def add(self, P, Q):
        p = self.F.p
        if P is None:
            return Q
        if Q is None:
            return P
        x1, y1 = P
        x2, y2 = Q
        if x1 == x2:
            if (y1 + y2) % p == 0:
                return None
            return self.double(P)
        m = (y2 - y1) * inverse(x2 - x1, p) % p
        x3 = (m * m - x1 - x2) % p
        y3 = (m * (x1 - x3) - y1) % p
        return (x3, y3)

    def double(self, P):
        p = self.F.p
        if P is None:
            return None
        x, y = P
        if y == 0:
            return None
        m = 3 * x * x * inverse(2 * y, p) % p
        x3 = (m * m - 2 * x) % p
        y3 = (m * (x - x3) - y) % p
        return (x3, y3)

    def scale(self, s: int, P):
        """Double-and-add scalar multiplication."""
        R = None
        Q = P
        while s > 0:
            if s & 1:
                R = self.add(R, Q)
            Q = self.double(Q)
            s >>= 1
        return R

    def is_on_curve(self, P) -> bool:
        if P is None:
            return True
        x, y = P
        p = self.F.p
        return (y * y - (x * x * x + self.b)) % p == 0

    def is_in_subgroup(self, P) -> bool:
        return self.scale(self.params.order, P) is None

    def endomorphism(self, P):
        """(x, y) -> (beta * x, y); equals scalar mul by lambda on the subgroup."""
        if P is None:
            return None
        assert self.params.beta is not None
        x, y = P
        return (self.params.beta * x % self.F.p, y)

    def random(self, rng=None):
        """Sample x until x^3 + b is square, take sqrt, clear cofactor
        (`affine-weierstrass.ts:141`)."""
        p = self.F.p
        while True:
            x = random_field(p, rng)
            y2 = (x * x * x + self.b) % p
            y = sqrt(y2, p)
            if y is None:
                continue
            if rng is not None and rng.getrandbits(1):
                y = (-y) % p
            P = (x, y)
            if self.params.cofactor != 1:
                P = self.scale(self.params.cofactor, P)
                if P is None:
                    continue
            return P


class ProjectiveCurve:
    """Oracle projective curve ops (`projective-weierstrass.ts:18-232`)."""

    zero = (0, 1, 0)

    def __init__(self, params: WeierstrassParams):
        self.params = params
        self.F = Field(params.modulus)
        self.b = params.b % params.modulus

    def is_zero(self, P):
        return P[2] == 0

    def eq(self, P, Q):
        # cross-multiply: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1
        p = self.F.p
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        if Z1 == 0 or Z2 == 0:
            return Z1 == Z2
        return (X1 * Z2 - X2 * Z1) % p == 0 and (Y1 * Z2 - Y2 * Z1) % p == 0

    def neg(self, P):
        X, Y, Z = P
        return (X, (-Y) % self.F.p, Z)

    def add(self, P, Q):
        """Complete-ish add (add-1998-cmo-2 with doubling fallback,
        `projective-weierstrass.ts:34-84`)."""
        p = self.F.p
        if P[2] == 0:
            return Q
        if Q[2] == 0:
            return P
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        Y1Z2 = Y1 * Z2 % p
        X1Z2 = X1 * Z2 % p
        Z1Z2 = Z1 * Z2 % p
        u = (Y2 * Z1 - Y1Z2) % p
        v = (X2 * Z1 - X1Z2) % p
        if v == 0:
            if u == 0:
                return self.double(P)
            return self.zero  # P == -Q
        vv = v * v % p
        vvv = vv * v % p
        R = vv * X1Z2 % p
        A = (u * u % p * Z1Z2 - vvv - 2 * R) % p
        X3 = v * A % p
        Y3 = (u * (R - A) - vvv * Y1Z2) % p
        Z3 = vvv * Z1Z2 % p
        return (X3, Y3, Z3)

    def double(self, P):
        """dbl-1998-cmo-2 (`projective-weierstrass.ts:86-136`), a = 0."""
        p = self.F.p
        X1, Y1, Z1 = P
        if Z1 == 0 or Y1 == 0:
            return self.zero
        XX = X1 * X1 % p
        w = 3 * XX % p
        s = Y1 * Z1 % p
        ss = s * s % p
        sss = ss * s % p
        Ry = Y1 * s % p
        B = X1 * Ry % p
        h = (w * w - 8 * B) % p
        X3 = 2 * h * s % p
        Y3 = (w * (4 * B - h) - 8 * Ry * Ry) % p
        Z3 = 8 * sss % p
        return (X3, Y3, Z3)

    def sub(self, P, Q):
        return self.add(P, self.neg(Q))

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
        X, Y, Z = P
        if Z == 0:
            return None
        zi = inverse(Z, self.F.p)
        return (X * zi % self.F.p, Y * zi % self.F.p)

    def from_affine(self, P):
        if P is None:
            return self.zero
        x, y = P
        return (x, y, 1)

    def is_on_curve(self, P) -> bool:
        X, Y, Z = P
        p = self.F.p
        if Z == 0:
            return (X, Y % p) == (0, 1) or X == 0  # any (0, Y, 0) accepted
        # Y^2 Z = X^3 + b Z^3
        return (Y * Y % p * Z - (X * X * X + self.b * Z * Z % p * Z)) % p == 0

    def random(self, rng=None, random_z: bool = True):
        A = AffineCurve(self.params)
        x, y = A.random(rng)
        if random_z:
            z = random_field(self.F.p, rng)
            if z == 0:
                z = 1
            return (x * z % self.F.p, y * z % self.F.p, z)
        return (x, y, 1)
