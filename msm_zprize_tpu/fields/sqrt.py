"""Vectorized square roots: branchless Tonelli-Shanks over the device field.

TPU-native equivalent of the reference's sqrt module (`src/field-sqrt.ts:9-265`):
the reference walks a precomputed roots-of-unity chain with data-dependent
control flow; here the chain walk is re-expressed as a FIXED-depth loop with
per-lane masks (constant shape, no branches) so one call takes square roots
of a whole batch.

Algorithm (classic constant-time Tonelli-Shanks): write p - 1 = Q * 2^M with
Q odd. Precompute c0 = z^Q for a non-residue z. Given x:
    t = x^Q, r = x^((Q+1)/2)
    for i = M, M-1, ..., 2:
        d = t^(2^(i-2))
        if d != 1:  r *= c;  t *= c^2
        c = c^2
Total ~bits(Q) + M^2/2 multiplies, all vectorized over the batch.

For p ≡ 3 (mod 4) (M = 1) this degenerates to the single exponentiation
r = x^((p+1)/4).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from .fp import MontgomeryFp

__all__ = ["FieldSqrt", "make_sqrt"]


def _nonresidue(p: int) -> int:
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    return z


class FieldSqrt:
    """Batched sqrt + quadratic-residue test for one field."""

    def __init__(self, F: MontgomeryFp):
        self.F = F
        p = F.p
        Q = p - 1
        M = 0
        while Q % 2 == 0:
            Q //= 2
            M += 1
        self.Q = Q
        self.M = M
        self.z = _nonresidue(p)
        # c0 = z^Q in Montgomery form (a primitive 2^M-th root of unity)
        self.c0_mont = pow(self.z, Q, p) * F.R % p

    def is_square(self, x):
        """Euler criterion x^((p-1)/2) == 1; x = 0 counts as square.
        x in Montgomery form (any representative)."""
        F = self.F
        e = F.exp_const(x, (F.p - 1) // 2)
        return F.is_equal(e, F.ones_mont(*x.shape[1:])) | F.is_zero(x)

    def sqrt(self, x):
        """Principal square root of x (Montgomery form, batch).

        Returns (root, ok): root*root == x where ok; lanes with non-residue
        x have ok=False (root contents unspecified). sqrt(0) = 0, ok=True.
        """
        F = self.F
        batch = x.shape[1:]
        if self.M == 1:
            r = F.exp_const(x, (F.p + 1) // 4)
        else:
            import jax

            t = F.exp_const(x, self.Q)
            r = F.exp_const(x, (self.Q + 1) // 2)
            c = jnp.broadcast_to(F._col(self.c0_mont, x), x.shape).astype(x.dtype)
            one = F.ones_mont(*batch)

            # scan over i = M..2; the (i-2)-fold squaring chain is a
            # dynamic-trip-count fori_loop so the trace stays O(1) montmuls
            # (runtime is the unavoidable ~M^2/2 sequential squarings)
            def body(carry, i):
                t, r, c = carry
                d = jax.lax.fori_loop(
                    0, i - 2, lambda _, v: F.montsquare(v), t
                )
                flag = ~F.is_equal(d, one)
                c2 = F.montsquare(c)
                r = jnp.where(flag, F.montmul(r, c), r)
                t = jnp.where(flag, F.montmul(t, c2), t)
                return (t, r, c2), None

            (t, r, c), _ = jax.lax.scan(
                body, (t, r, c), jnp.arange(self.M, 1, -1)
            )
        ok = F.is_equal(F.montsquare(r), x) | F.is_zero(x)
        r = jnp.where(F.is_zero(x), jnp.zeros_like(r), r)
        return r, ok


@lru_cache(maxsize=None)
def make_sqrt(p: int, w: int = 12) -> FieldSqrt:
    from .fp import make_field

    return FieldSqrt(make_field(p, w))
