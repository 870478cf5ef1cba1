"""Barrett reduction over limb vectors — parity with the reference's
`src/wasm/barrett.ts:79-293` (there used for GLV scalar division; Montgomery
stays faster for field muls, `doc/zprize22.md:199`).

Algorithm (same derivation as the reference's comment `barrett.ts:7-78`):
for b-bit modulus p, k = b - 1, N = n*w (a whole number of limbs so shifts
are limb moves), m = floor(2^(k+N) / p):

    l = ((x >> k) * m) >> N        (floor; error <= 2 vs exact quotient)
    r = x - l*p                     (fits in ~b+2 bits)
    while r >= p: r -= p            (at most 3 conditional subtracts)

Everything is vectorized over the trailing batch axes in int32 limb space;
the only data movement is one sub-w bit shift across limbs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import limbs as L
from .limbs import DTYPE, LimbScheme

__all__ = ["BarrettReducer"]


def _shift_right_bits(x, s: int, w: int, n_out: int):
    """floor(x >> s) of a canonical (n, B) limb vector, s arbitrary bits."""
    n = x.shape[0]
    q, r = divmod(s, w)
    mask = (1 << w) - 1
    zero = jnp.zeros_like(x[0])
    out = []
    for i in range(n_out):
        lo = x[i + q] if i + q < n else zero
        if r == 0:
            out.append(lo)
        else:
            hi = x[i + q + 1] if i + q + 1 < n else zero
            out.append(((lo >> r) | (hi << (w - r))) & mask)
    return jnp.stack(out, axis=0)


class BarrettReducer:
    """x mod p for x < p * 2^(k+1) (in particular any x < p^2), x given as a
    canonical (nx, B) limb vector with nx <= 2n."""

    def __init__(self, p: int, w: int = 12):
        self.p = p
        self.w = w
        self.b = p.bit_length()
        self.k = self.b - 1
        self.n = -(-self.b // w)
        self.scheme = LimbScheme(w, self.n)
        self.N = self.n * w
        m = (1 << (self.k + self.N)) // p
        self.n_m = max(-(-m.bit_length() // w), 1)
        self.m_limbs = np.array(LimbScheme(w, self.n_m).to_limbs(m), dtype=np.int32)
        self.p_limbs = np.array(self.scheme.to_limbs(p), dtype=np.int32)

    def reduce(self, x):
        """x: (nx, B) canonical limbs, value < p*2^(k+1). Returns (n, B)
        canonical limbs of x mod p."""
        w, n = self.w, self.n
        batch = x.shape[1:]
        # l = ((x >> k) * m) >> N   (x >> k has <= k+2 bits of headroom here)
        n_hi = -(-(x.shape[0] * w - self.k) // w) + 1
        xhi = _shift_right_bits(x, self.k, w, n_hi)
        m = jnp.asarray(self.m_limbs).reshape((self.n_m,) + (1,) * len(batch))
        l = L.mul_shift_floor(xhi, m, w, self.n, n + 1)
        # r = x - l*p mod 2^(w*(n+1)): true remainder < 4p fits
        lp = L.mul_low(l, jnp.asarray(self.p_limbs).reshape((n,) + (1,) * len(batch)), w, n + 1)
        r = L.sub_mod_pow2(x, lp, w, n + 1)
        # up to 3 conditional subtracts of p (quotient error <= 2 plus the
        # initial r < 2p slack)
        pl = jnp.asarray(self.p_limbs).reshape((n,) + (1,) * len(batch))
        pext = jnp.concatenate(
            [pl, jnp.zeros((1,) + (1,) * len(batch), dtype=DTYPE)], axis=0
        )
        for _ in range(3):
            t = L.sub_mod_pow2(r, pext, w, n + 1)
            # underflow iff top limb wraps negative-high (two's complement)
            under = (t[n] >> (w - 1)) & 1
            r = jnp.where(under.astype(bool), r, t)
        return r[:n]
