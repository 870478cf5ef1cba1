"""Vectorized Montgomery field arithmetic over int32 limb vectors.

The TPU-native re-design of the reference's runtime-generated WASM field
kernels (`src/wasm/multiply-montgomery.ts:31-345`, `field-arithmetic.ts`,
`inverse.ts`, `exp.ts`): instead of one scalar field op per call on a
pointer into shared memory, every op here is vectorized over an arbitrary
batch — thousands of field elements per invocation, limbs unrolled at trace
time (tracing *is* the codegen; constants like the limbs of p, 2p, mu are
baked into the program exactly like the reference bakes them into WASM).

Representation invariants (mirroring `doc/zprize22.md:195`):

* limbs canonical in [0, 2^w), value unreduced in [0, 2p)
* ``sub_positive`` may return values in [0, 4p) — safe as multiply input
  because R > 16p for all supported schemes
* Montgomery form everywhere: stored x' = x*R mod p, R = 2^(n*w)
"""

from __future__ import annotations

from functools import cached_property, lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.field import montgomery_params
from . import limbs as L
from .limbs import DTYPE, LimbScheme

__all__ = ["MontgomeryFp", "make_field"]


class MontgomeryFp:
    """Vectorized field F_p in Montgomery form, radix-2^w int32 limbs."""

    def __init__(self, p: int, w: int = 12, min_extra_bits: int = 4):
        mp = montgomery_params(p, w, min_extra_bits)
        # int32 column accumulators must hold 2n products of w-bit limbs
        assert 2 * mp.n * (1 << (2 * w)) < (1 << 31), "column accumulator overflow"
        # sub_positive outputs in [0,4p): montmul stays below 2p iff R > 16p
        assert mp.R > 16 * p, "need R > 16p for unreduced-input closure"
        self.p = p
        self.w = w
        self.n = mp.n
        self.mask = mp.mask
        self.mu = mp.p_inv_neg  # -p^-1 mod 2^w
        self.R = mp.R
        self.scheme = LimbScheme(w, mp.n)
        # per-limb constants (python ints; turned into traced constants on use)
        self.p_limbs = tuple(mp.limbs_p)
        self.two_p_limbs = tuple(mp.limbs_2p)
        self.mont_one = mp.R_mod_p  # R mod p == to_montgomery(1)
        self.R2 = mp.R2

    # ---- constants ------------------------------------------------------

    def _col(self, x: int, ref):
        """(n, 1, ..) constant limb column broadcastable against ref (n, *B)."""
        c = np.array(self.scheme.to_limbs(x), dtype=np.int32)
        return jnp.asarray(c.reshape((self.n,) + (1,) * (ref.ndim - 1)))

    def zeros(self, *batch):
        return jnp.zeros((self.n,) + tuple(batch), dtype=DTYPE)

    def ones_mont(self, *batch):
        """Montgomery form of 1, broadcast to batch shape."""
        one = self._col(self.mont_one, jnp.zeros((self.n,) + tuple(batch)))
        return jnp.broadcast_to(one, (self.n,) + tuple(batch)).astype(DTYPE)

    # ---- I/O ------------------------------------------------------------

    def pack(self, values, montgomery: bool = True) -> np.ndarray:
        """Python ints -> (n, B) limbs (optionally converted to Montgomery
        form on the host — exact integer math)."""
        if montgomery:
            values = [v * self.R % self.p for v in values]
        return L.pack(values, self.scheme)

    def unpack(self, arr, montgomery: bool = True, reduce: bool = True) -> list[int]:
        out = L.unpack(arr, self.scheme)
        if montgomery:
            r_inv = pow(self.R, -1, self.p)
            out = [v * r_inv % self.p for v in out]
        elif reduce:
            out = [v % self.p for v in out]
        return out

    # ---- add / sub / reduce ---------------------------------------------
    # cf. src/wasm/field-arithmetic.ts:29-176

    def _carry(self, limbs_list):
        """Full sequential carry chain; list of per-limb (B,) -> same."""
        mask, w = self.mask, self.w
        out = []
        carry = None
        for i, t in enumerate(limbs_list):
            if carry is not None:
                t = t + carry
            out.append(t & mask)
            carry = t >> w
        return out, carry

    def _sub_const_select(self, s, const_limbs):
        """Given canonical s (list of n (B,) arrays), compute t = s - const;
        return select(t >= 0, t, s) stacked. One borrow chain + select."""
        mask, w = self.mask, self.w
        t = []
        borrow = None
        for i in range(self.n):
            d = s[i] - const_limbs[i]
            if borrow is not None:
                d = d + borrow
            t.append(d & mask)
            borrow = d >> w  # 0 or -1
        keep_s = borrow < 0  # underflow -> keep s
        out = [jnp.where(keep_s, s[i], t[i]) for i in range(self.n)]
        return jnp.stack(out, axis=0)

    def add(self, x, y):
        """x + y in [0, 2p): limbwise add, carry, conditional -2p."""
        s, carry = self._carry([x[i] + y[i] for i in range(self.n)])
        # carry out of top limb is impossible: x, y < 2p and R > 16p
        return self._sub_const_select(s, self.two_p_limbs)

    def sub(self, x, y):
        """x - y in [0, 2p): subtract, on underflow add 2p."""
        mask, w = self.mask, self.w
        t = []
        borrow = None
        for i in range(self.n):
            d = x[i] - y[i]
            if borrow is not None:
                d = d + borrow
            t.append(d & mask)
            borrow = d >> w
        underflow = borrow < 0
        # add 2p back where underflowed
        u = []
        carry = None
        for i in range(self.n):
            a = t[i] + self.two_p_limbs[i]
            if carry is not None:
                a = a + carry
            u.append(a & mask)
            carry = a >> w
        out = [jnp.where(underflow, u[i], t[i]) for i in range(self.n)]
        return jnp.stack(out, axis=0)

    def sub_positive(self, x, y):
        """x - y + 2p, branch-free, result in [0, 4p) — safe multiply input
        (cf. `field-arithmetic.ts:117` subtractPositive)."""
        s = [x[i] - y[i] + self.two_p_limbs[i] for i in range(self.n)]
        out, _ = self._carry(s)
        return jnp.stack(out, axis=0)

    def neg(self, x):
        """2p - x in [0, 2p] (negation of unreduced values)."""
        s = [self.two_p_limbs[i] - x[i] for i in range(self.n)]
        out, _ = self._carry(s)
        return jnp.stack(out, axis=0)

    def cneg(self, x, flag):
        """Conditionally negate: where(flag, -x, x). flag broadcasts over batch."""
        return jnp.where(flag, self.neg(x), x)

    def reduce(self, x):
        """[0, 2p) -> [0, p): one conditional subtract of p
        (cf. `field-arithmetic.ts:142`)."""
        s = [x[i] for i in range(self.n)]
        return self._sub_const_select(s, self.p_limbs)

    def fully_reduce(self, x):
        """[0, 4p) -> [0, p): two conditional subtracts."""
        s = [x[i] for i in range(self.n)]
        r = self._sub_const_select(s, self.two_p_limbs)
        return self._sub_const_select([r[i] for i in range(self.n)], self.p_limbs)

    # ---- predicates ------------------------------------------------------

    def is_zero(self, x):
        """x ≡ 0 (mod p) for x in [0, 2p)."""
        r = self.reduce(x)
        nz = r[0] != 0
        for i in range(1, self.n):
            nz = nz | (r[i] != 0)
        return ~nz

    def is_equal(self, x, y):
        """x ≡ y (mod p) for x, y in [0, 2p)."""
        rx = self.reduce(x)
        ry = self.reduce(y)
        eq = rx[0] == ry[0]
        for i in range(1, self.n):
            eq = eq & (rx[i] == ry[i])
        return eq

    # ---- Montgomery multiply --------------------------------------------

    def montmul(self, x, y):
        """Montgomery product x*y*R^-1 mod p (in [0,2p) for inputs < 4p).

        Product-scanning with int32 columns; no intra-loop carries needed
        because columns stay < 2^31 by the scheme invariant — the vectorized
        analog of the reference's deferred-carry CIOS
        (`src/wasm/multiply-montgomery.ts:31-137`).
        """
        n, w, mask = self.n, self.w, self.mask
        batch = jnp.broadcast_shapes(x.shape[1:], y.shape[1:])
        # phase 1: schoolbook columns of x*y -> C (2n, B)
        C = jnp.zeros((2 * n,) + batch, dtype=DTYPE)
        for j in range(n):
            C = C.at[j : j + n].add(x * y[j])
        # phase 2: n reduction steps, one column consumed per step
        p_col = self._col(self.p, C)
        for i in range(n):
            qi = (C[i] * self.mu) & mask  # exact low bits despite int32 wrap
            C = C.at[i : i + n].add(p_col * qi)
            # column i is now ≡ 0 mod 2^w; push its carry up and retire it
            C = C.at[i + 1].add(C[i] >> w)
        # result = columns n..2n-1, final carry chain
        out, _ = self._carry([C[n + i] for i in range(n)])
        return jnp.stack(out, axis=0)

    def montsquare(self, x):
        return self.montmul(x, x)

    def to_montgomery(self, x):
        return self.montmul(x, self._col(self.R2, x))

    def from_montgomery(self, x):
        one = jnp.zeros_like(x).at[0].set(1)
        return self.montmul(x, one)

    # ---- exponentiation / inverse ---------------------------------------

    def exp_const(self, x, e: int):
        """x^e for a *static* exponent, in Montgomery form.

        lax.scan over the exponent bits (LSB-first square-and-multiply) keeps
        the trace at ~2 montmuls (cf. `src/wasm/exp.ts`).
        """
        nbits = max(e.bit_length(), 1)
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.int32)
        )
        acc0 = self.ones_mont(*x.shape[1:])

        def body(carry, bit):
            acc, base = carry
            acc = jnp.where(bit, self.montmul(acc, base), acc)
            base = self.montsquare(base)
            return (acc, base), None

        (acc, _), _ = jax.lax.scan(body, (acc0, x), bits)
        return acc

    def inverse(self, x):
        """x^-1 in Montgomery form via Fermat (x^(p-2)); fully vectorized.

        The reference uses Kaliski almost-inverse (`src/wasm/inverse.ts:25`)
        which is branch-heavy; on TPU a fixed-length exponentiation is the
        idiomatic constant-shape formulation. inverse(0) returns 0-garbage
        (no trap) — callers mask, as in the batched kernels.
        """
        return self.exp_const(x, self.p - 2)

    def batch_inverse(self, x, cols: int = 128):
        """Vectorized Montgomery batch inversion over the last batch axis.

        Blocked prefix-product design replacing the reference's O(B)
        sequential chain (`src/wasm/inverse.ts:220-271`): sequential scan
        along B/cols rows (full vector width), log-depth tree across the
        ``cols`` column totals, ONE Fermat inversion of the grand total,
        then unwind. ~3B + 4*cols muls, sequential depth ~2*(B/cols) +
        2*log2(cols) + bits(p).

        All inputs must be nonzero mod p (callers mask zeros to 1 first).
        """
        n = self.n
        batch = x.shape[1:]
        assert len(batch) == 1, "batch_inverse expects (n, B)"
        B = batch[0]
        if B <= 2:
            return self.inverse(x)
        cols = min(cols, B)
        while B % cols != 0:
            cols //= 2
        rows = B // cols
        xr = x.reshape(n, rows, cols)

        # 1) prefix products down the rows: P[r] = prod_{r'<=r} x[r']
        def scan_body(carry, xrow):
            prod = self.montmul(carry, xrow)
            return prod, prod

        init = self.ones_mont(cols)
        total_per_col, prefixes = jax.lax.scan(
            scan_body, init, jnp.moveaxis(xr, 1, 0)
        )  # prefixes: (rows, n, cols)

        # 2) tree-reduce column totals, storing levels for the unwind
        levels = []  # each: (n, width) products at that level
        cur = total_per_col
        while cur.shape[-1] > 1:
            width = cur.shape[-1]
            half = width // 2
            left = cur[:, :half]
            right = cur[:, half : 2 * half]
            merged = self.montmul(left, right)
            if width % 2:  # odd leftover rides along
                merged = jnp.concatenate([merged, cur[:, -1:]], axis=1)
                levels.append((cur, half, True))
            else:
                levels.append((cur, half, False))
            cur = merged

        # 3) one inversion of the grand total
        inv = self.inverse(cur)  # (n, 1)

        # 4) unwind the tree: inv(left) = inv(parent)*right, etc.
        for cur_level, half, odd in reversed(levels):
            left = cur_level[:, :half]
            right = cur_level[:, half : 2 * half]
            if odd:
                inv_pair = inv[:, :half+1]
                inv_left = self.montmul(inv_pair[:, :half], right)
                inv_right = self.montmul(inv_pair[:, :half], left)
                inv = jnp.concatenate([inv_left, inv_right, inv[:, half : half + 1]], axis=1)
            else:
                inv_left = self.montmul(inv[:, :half], right)
                inv_right = self.montmul(inv[:, :half], left)
                inv = jnp.concatenate([inv_left, inv_right], axis=1)
        inv_col_totals = inv  # (n, cols): inverse of each column's total

        # 5) unwind the rows backwards: inv_x[r] = suffix_inv * prefix[r-1]
        prefixes_shifted = jnp.concatenate(
            [init[None], prefixes[:-1]], axis=0
        )  # (rows, n, cols): product of rows < r

        def unwind_body(suffix_inv, args):
            xrow, pref = args
            inv_row = self.montmul(suffix_inv, pref)
            suffix_inv = self.montmul(suffix_inv, xrow)
            return suffix_inv, inv_row

        _, inv_rows = jax.lax.scan(
            unwind_body,
            inv_col_totals,
            (jnp.moveaxis(xr, 1, 0), prefixes_shifted),
            reverse=True,
        )
        return jnp.moveaxis(inv_rows, 0, 1).reshape(n, B)


@lru_cache(maxsize=None)
def make_field(p: int, w: int = 12) -> MontgomeryFp:
    return MontgomeryFp(p, w)
