"""Vectorized Montgomery field arithmetic over int32 limb vectors.

The TPU-native re-design of the reference's runtime-generated WASM field
kernels (`src/wasm/multiply-montgomery.ts:31-345`, `field-arithmetic.ts`,
`inverse.ts`, `exp.ts`): instead of one scalar field op per call on a
pointer into shared memory, every op here is vectorized over an arbitrary
batch — thousands of field elements per invocation — and expressed with a
deliberately tiny HLO footprint:

* limb products = ONE batched int32 convolution (per-batch polynomial
  multiply via grouped `conv_general_dilated`); constant-operand products
  use a shared-filter conv
* carry/borrow propagation = ONE `lax.scan` over the limb axis
* Montgomery reduction is the non-interleaved 3-multiplication form
  (T = x*y;  q = -T*p^{-1} mod R;  out = (T + q*p) / R), with the
  intermediate q column values kept < 2^31 by splitting accumulated columns
  into w-bit pieces before constant convs.

Representation invariants (mirroring `doc/zprize22.md:195`):

* limbs canonical in [0, 2^w), value unreduced in [0, 2p)
* ``sub_positive`` may return values in [0, 4p) — still a safe multiply
  input because R > 16p for all supported schemes
* Montgomery form everywhere: stored x' = x*R mod p, R = 2^(n*w)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..bigint.field import montgomery_params
from ..utils.vma import pvary_like, vma_of
from . import limbs as L
from .limbs import DTYPE, LimbScheme

__all__ = ["MontgomeryFp", "make_field", "set_montmul_impl"]

# montmul implementation: "auto" picks the Pallas kernel on TPU backends and
# the conv+scan XLA path elsewhere; override via set_montmul_impl or the
# MSM_TPU_MONTMUL env var ("conv" | "pallas" | "auto").
import os as _os

_MONTMUL_IMPL = _os.environ.get("MSM_TPU_MONTMUL", "auto")


def set_montmul_impl(impl: str):
    global _MONTMUL_IMPL
    assert impl in ("auto", "conv", "pallas")
    _MONTMUL_IMPL = impl


def _montmul_impl() -> str:
    if _MONTMUL_IMPL != "auto":
        return _MONTMUL_IMPL
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "conv"


def _polymul(x, y):
    """Per-batch polynomial product: (nx, B) x (ny, B) -> (nx+ny-1, B).

    Pad-accumulate formulation: ~2*nx simple HLO ops (multiply + shifted
    add), no convs/scatters — XLA:CPU compiles grouped convs and scatters
    pathologically slowly, and on TPU the hot path is the Pallas kernel
    anyway. Columns bounded by min(nx,ny) * max(x) * max(y).
    """
    nx, B = x.shape
    ny = y.shape[0]
    cols = nx + ny - 1
    T = jnp.zeros((cols, B), dtype=DTYPE)
    for i in range(nx):
        row = x[i : i + 1] * y  # (ny, B)
        T = T + jnp.pad(row, ((i, cols - ny - i), (0, 0)))
    return T


def _polymul_const(x, const: np.ndarray):
    """(nx, B) x constant (m,) -> (nx+m-1, B) columns.

    Backend-dependent lowering: ONE int32 matmul with the banded convolution
    matrix A[k, i] = const[k - i] on CPU (the unrolled pad-accumulate
    compiles ~10x slower on XLA:CPU), but unrolled scalar-constant
    multiply-adds on TPU — a single int32 dot takes ~30 s to COMPILE on the
    TPU backend (measured v5e: 28.5 s vs 0.8 s for the unrolled form), and
    zero limbs of the constant are skipped entirely."""
    nx, B = x.shape
    m = const.shape[0]
    cols = nx + m - 1
    if jax.default_backend() != "cpu":
        T = jnp.zeros((cols, B), dtype=DTYPE)
        for j in range(m):
            cj = int(const[j])
            if cj == 0:
                continue
            T = T + jnp.pad(x * cj, ((j, cols - nx - j), (0, 0)))
        return T
    A = np.zeros((cols, nx), dtype=np.int32)
    for i in range(nx):
        A[i : i + m, i] = const
    return jax.lax.dot(jnp.asarray(A), x, preferred_element_type=DTYPE)


def _scan_carry(cols, w: int):
    """Sequential carry/borrow propagation over the limb axis.

    cols: (m, *batch) int32 (may be signed). Returns (digits, final_carry):
    digits canonical in [0, 2^w), carry the signed overflow past the top.

    Backend-dependent lowering: UNROLLED adds on TPU (a 32-step lax.scan of
    trivial bodies would serialize the VPU and add loop overhead per field
    op), lax.scan on CPU (keeps test-suite XLA compile times sane — the
    trace is ~3 ops instead of ~3*n).
    """
    mask = (1 << w) - 1
    if jax.default_backend() != "cpu":
        m = cols.shape[0]
        digits = []
        carry = jnp.zeros(cols.shape[1:], dtype=DTYPE)
        for i in range(m):
            t = cols[i] + carry
            digits.append(t & mask)
            carry = t >> w
        return jnp.stack(digits, axis=0), carry

    def body(c, col):
        t = col + c
        return t >> w, t & mask

    init = pvary_like(jnp.zeros(cols.shape[1:], dtype=DTYPE), vma_of(cols))
    carry, digits = jax.lax.scan(body, init, cols)
    return digits, carry


class MontgomeryFp:
    """Vectorized field F_p in Montgomery form, radix-2^w int32 limbs."""

    def __init__(self, p: int, w: int = 12, min_extra_bits: int = 4):
        mp = montgomery_params(p, w, min_extra_bits)
        assert 2 * mp.n * (1 << (2 * w)) < (1 << 31), "column accumulator overflow"
        assert mp.R > 16 * p, "need R > 16p for unreduced-input closure"
        self.p = p
        self.w = w
        self.n = mp.n
        self.mask = mp.mask
        self.R = mp.R
        self.scheme = LimbScheme(w, mp.n)
        self.p_limbs = np.array(mp.limbs_p, dtype=np.int32)
        self.two_p_limbs = np.array(mp.limbs_2p, dtype=np.int32)
        # -p^-1 mod R, canonical limbs (for the 3-mul Montgomery reduction)
        pn = (-pow(p, -1, mp.R)) % mp.R
        self.pn_limbs = np.array(self.scheme.to_limbs(pn), dtype=np.int32)
        self.mont_one = mp.R_mod_p
        self.R2 = mp.R2

    # ---- shape plumbing --------------------------------------------------

    def _flatten(self, *arrays):
        """Common-batch broadcast + flatten to (n_i, B); returns arrays+shape."""
        batch = jnp.broadcast_shapes(*(a.shape[1:] for a in arrays))
        out = []
        for a in arrays:
            a = a.reshape(a.shape + (1,) * (len(batch) - (a.ndim - 1)))
            a = jnp.broadcast_to(a, a.shape[:1] + batch)
            out.append(a.reshape(a.shape[0], -1))
        return out, batch

    def _col(self, x: int, ref):
        c = np.array(self.scheme.to_limbs(x), dtype=np.int32)
        return jnp.asarray(c.reshape((self.n,) + (1,) * (ref.ndim - 1)))

    def zeros(self, *batch):
        return jnp.zeros((self.n,) + tuple(batch), dtype=DTYPE)

    def ones_mont(self, *batch):
        one = self._col(self.mont_one, jnp.zeros((self.n,) + tuple(batch)))
        return jnp.broadcast_to(one, (self.n,) + tuple(batch)).astype(DTYPE)

    # ---- I/O ------------------------------------------------------------

    def pack(self, values, montgomery: bool = True) -> np.ndarray:
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

    def _sub_const_select(self, s, const_limbs: np.ndarray):
        """select(s - const >= 0, s - const, s): one borrow scan + where."""
        cl = jnp.asarray(const_limbs).reshape((self.n,) + (1,) * (s.ndim - 1))
        t, borrow = _scan_carry(s - cl, self.w)
        return jnp.where(borrow < 0, s, t)

    def add(self, x, y):
        """x + y in [0, 2p): add, carry scan, conditional -2p."""
        s, _ = _scan_carry(x + y, self.w)
        return self._sub_const_select(s, self.two_p_limbs)

    def sub(self, x, y):
        """x - y in [0, 2p): subtract; on underflow add 2p."""
        t, borrow = _scan_carry(x - y, self.w)
        tp = jnp.asarray(self.two_p_limbs).reshape((self.n,) + (1,) * (x.ndim - 1))
        u, _ = _scan_carry(t + tp, self.w)
        return jnp.where(borrow < 0, u, t)

    def sub_positive(self, x, y):
        """x - y + 2p branch-free, in [0, 4p) (`field-arithmetic.ts:117`)."""
        tp = jnp.asarray(self.two_p_limbs).reshape((self.n,) + (1,) * (x.ndim - 1))
        out, _ = _scan_carry(x - y + tp, self.w)
        return out

    def neg(self, x):
        """2p - x in [0, 2p] for x in [0, 2p) ONLY — downstream sub /
        sub_positive assume operands < 2p. Values in the fused kernels'
        wider [0, 4p) storage form must be negated in-kernel
        (`pallas_field.f_neg`, bound-tracked), not here."""
        tp = jnp.asarray(self.two_p_limbs).reshape((self.n,) + (1,) * (x.ndim - 1))
        out, _ = _scan_carry(tp - x, self.w)
        return out

    def cneg(self, x, flag):
        return jnp.where(flag, self.neg(x), x)

    def canon(self, x):
        """Canonicalize limbs to [0, 2^w) (value unchanged; value must be in
        [0, R), which all contracts guarantee). Needed before limbwise
        comparisons when inputs may be in the fused kernels' relaxed form."""
        out, _ = _scan_carry(x, self.w)
        return out

    def reduce(self, x):
        """[0, 2p) -> [0, p): one conditional subtract (`field-arithmetic.ts:142`)."""
        return self._sub_const_select(self.canon(x), self.p_limbs)

    def fully_reduce(self, x):
        """[0, 4p) -> [0, p)."""
        r = self._sub_const_select(self.canon(x), self.two_p_limbs)
        return self._sub_const_select(r, self.p_limbs)

    # ---- predicates ------------------------------------------------------

    def is_zero(self, x):
        r = self.fully_reduce(x)
        return jnp.all(r == 0, axis=0)

    def is_equal(self, x, y):
        return jnp.all(self.fully_reduce(x) == self.fully_reduce(y), axis=0)

    # ---- Montgomery multiply --------------------------------------------

    def _montmul_flat(self, x, y):
        """Core on flat (n, B) canonical inputs (values < 4p).

        Same phase structure as the Pallas kernel: carry T's low half to
        canonical digits first, then ONE constant convolution for q (keeps
        the HLO footprint small — this path is the CPU-test fallback)."""
        n, w, mask = self.n, self.w, self.mask
        # T = x * y: columns <= n * 2^24 < 2^29
        T = _polymul(x, y)  # (2n-1, B)
        # t_lo = canonical digits of T mod R (one scan over low n columns)
        t_lo, carry_low_T = _scan_carry(T[:n], w)
        # q = (t_lo * -p^-1) mod R: one constant conv, columns < n*2^24
        qc = _polymul_const(t_lo, self.pn_limbs)[:n]
        q, _ = _scan_carry(qc, w)  # canonical q in [0, R)
        # U = q * p; low half of (t_lo + U) is divisible by R: carry only
        U = _polymul_const(q, self.p_limbs)  # (2n-1, B)
        low = t_lo + U[:n]
        _, carry_low = _scan_carry(low, w)
        # out = T_hi + U_hi + carries (the division by R)
        hiT = jnp.concatenate(
            [T[n:], jnp.zeros((1,) + T.shape[1:], dtype=DTYPE)], axis=0
        )
        hiU = U[n:]
        pad = jnp.zeros((n - hiU.shape[0],) + U.shape[1:], dtype=DTYPE)
        hi = hiT + jnp.concatenate([hiU, pad], axis=0)
        hi = hi.at[0].add(carry_low + carry_low_T)
        out, _ = _scan_carry(hi, w)  # (n, B), value < 2p
        return out

    def montmul(self, x, y):
        """Montgomery product x*y*R^-1 mod p, output in [0, 2p).

        Dispatches to the Pallas TPU kernel on TPU backends (the hot path —
        VMEM-resident interleaved product scan), or the conv+scan XLA
        formulation elsewhere (non-interleaved 3-multiplication Montgomery;
        both are vectorized analogs of the reference's deferred-carry CIOS,
        `src/wasm/multiply-montgomery.ts:31-137`).

        Small batches always take the XLA path even on TPU: a Pallas call
        pads the batch to a 4096-lane block and costs a separate kernel
        launch, which for the ~470-deep sequential chains inside Fermat
        inversion (1-lane operands) is pure overhead — inline HLO fuses into
        the surrounding program instead.
        """
        from .pallas_mul import BLOCK

        batch_elems = 1
        for d in jnp.broadcast_shapes(x.shape[1:], y.shape[1:]):
            batch_elems *= d
        if _montmul_impl() == "pallas" and batch_elems >= BLOCK // 2:
            from .pallas_mul import montmul_pallas

            return montmul_pallas(self, x, y)
        (xf, yf), batch = self._flatten(x, y)
        out = self._montmul_flat(xf, yf)
        return out.reshape((self.n,) + batch)

    def montsquare(self, x):
        return self.montmul(x, x)

    def left_shift(self, x, k: int):
        """x * 2^k, Montgomery-form preserving (multiply by the constant
        2^k*R mod p; cf. `multiply-montgomery.ts:224` leftShift)."""
        c = self._col((1 << k) * self.R % self.p, x)
        return self.montmul(x, jnp.broadcast_to(c, x.shape).astype(x.dtype))

    def to_montgomery(self, x):
        return self.montmul(x, self._col(self.R2, x))

    def from_montgomery(self, x):
        one = jnp.zeros_like(x).at[0].set(1)
        return self.montmul(x, one)

    # ---- exponentiation / inverse ---------------------------------------

    def exp_const(self, x, e: int, window: int = 4):
        """x^e for a *static* exponent, in Montgomery form (cf. `src/wasm/exp.ts`).

        Fixed-window (2^window-entry table) square-and-multiply as ONE
        lax.scan over the exponent's windows, MSB-first: the scan keeps the
        trace small (compile speed) and the windowing cuts the *sequential
        multiply depth* to ~bits + bits/window — sequential depth is the
        scarce resource on TPU, not multiply throughput."""
        if e == 0:
            return self.ones_mont(*x.shape[1:])
        if _montmul_impl() == "pallas" and e.bit_length() > 16:
            # long chains (Fermat inverse, sqrt towers): the scan issues 2
            # kernel launches per bit and launch overhead dominates on the
            # tiny batches these run at — the fused kernel does the whole
            # chain in ONE invocation (in-kernel fori_loop)
            from .pallas_mul import exp_const_pallas

            return exp_const_pallas(self, x, e)
        nbits = e.bit_length()
        n_win = -(-nbits // window)
        digits = np.array(
            [(e >> (window * i)) & ((1 << window) - 1) for i in range(n_win)][::-1],
            dtype=np.int32,
        )
        # table[j] = x^j, j in [0, 2^window), built by ONE scan (trace size)
        def tbl_body(prev, _):
            nxt = self.montmul(prev, x)
            return nxt, nxt

        one = self.ones_mont(*x.shape[1:])
        _, higher = jax.lax.scan(tbl_body, x, None, length=(1 << window) - 2)
        tbl = jnp.concatenate([one[None], x[None], higher], axis=0)

        def body(acc, d):
            for _ in range(window):
                acc = self.montsquare(acc)
            step = jax.lax.dynamic_index_in_dim(tbl, d, axis=0, keepdims=False)
            return self.montmul(acc, step), None

        # first window needs no leading squarings: start from table[digits[0]]
        acc0 = jax.lax.dynamic_index_in_dim(
            tbl, jnp.asarray(digits[0]), axis=0, keepdims=False
        )
        acc, _ = jax.lax.scan(body, acc0, jnp.asarray(digits[1:]))
        return acc

    def exp_dyn(self, x, e):
        """x^e for a RUNTIME exponent (the reference's `exp`,
        `src/wasm/exp.ts`, takes a runtime exponent too; `exp_const` above
        only covers static ones). e: (n_e, *batch) canonical limb vector.
        Masked square-and-multiply, MSB-first, ONE lax.scan over all
        n_e*w exponent bits (fixed trip count, branch-free)."""
        n_e = e.shape[0]
        w = self.w
        bits = n_e * w
        one = self.ones_mont(*x.shape[1:])

        # bit i (MSB-first): limb (bits-1-i)//w, position (bits-1-i)%w
        idx = jnp.arange(bits - 1, -1, -1, dtype=jnp.int32)
        limb_ix = idx // w
        bit_ix = idx % w

        def body(acc, iw):
            li, bi = iw
            bit = (e[li] >> bi) & 1
            acc = self.montsquare(acc)
            stepped = self.montmul(acc, x)
            acc = jnp.where(bit.astype(bool), stepped, acc)
            return acc, None

        acc, _ = jax.lax.scan(body, pvary_like(one, vma_of(x, e)), (limb_ix, bit_ix))
        return acc

    def inverse(self, x):
        """x^-1 in Montgomery form via Fermat (x^(p-2)); fully vectorized.

        The reference's Kaliski almost-inverse (`src/wasm/inverse.ts:25`) is
        branch-heavy; a fixed-length exponentiation is the idiomatic
        constant-shape TPU formulation. inverse(0) returns 0 (harmless
        garbage) — callers mask, as in the batched kernels.
        """
        return self.exp_const(x, self.p - 2)

    def batch_inverse(self, x, rows: int = 8):
        """Vectorized Montgomery batch inversion over the last batch axis.

        Blocked prefix-product design replacing the reference's O(B)
        sequential chain (`src/wasm/inverse.ts:220-271`): a SHORT unrolled
        prefix chain of ``rows`` full-width multiplies, a log-depth tree
        across the B/rows column totals, ONE windowed-Fermat inversion of
        the grand total, then unwind both. ~3B + 4*cols muls; sequential
        depth ~2*rows + 2*log2(B/rows) + ~1.25*bits(p) — depth, not
        throughput, is the scarce resource on TPU.

        All inputs must be nonzero mod p (callers mask zeros to 1 first).
        """
        n = self.n
        batch = x.shape[1:]
        if len(batch) != 1:
            flat = x.reshape(n, -1)
            return self.batch_inverse(flat, rows).reshape(x.shape)
        B = batch[0]
        if B <= 4:
            return self.inverse(x)
        rows = max(min(rows, B), 1)
        while B % rows != 0:
            rows -= 1
        cols = B // rows
        xr = x.reshape(n, rows, cols)

        # prefix products down the rows (ONE scan: trace has 1 montmul)
        def pref_body(acc, xrow):
            nxt = self.montmul(acc, xrow)
            return nxt, nxt

        _, prefixes = jax.lax.scan(
            pref_body,
            pvary_like(self.ones_mont(cols), vma_of(x)),
            jnp.moveaxis(xr, 1, 0),
        )  # (rows, n, cols)
        total_per_col = prefixes[-1]  # (n, cols)

        # tree-reduce column totals, storing levels for the unwind
        levels = []
        cur = total_per_col
        while cur.shape[-1] > 1:
            width = cur.shape[-1]
            half = width // 2
            left = cur[:, :half]
            right = cur[:, half : 2 * half]
            merged = self.montmul(left, right)
            if width % 2:
                merged = jnp.concatenate([merged, cur[:, -1:]], axis=1)
                levels.append((cur, half, True))
            else:
                levels.append((cur, half, False))
            cur = merged

        inv = self.inverse(cur)  # (n, 1)

        for cur_level, half, odd in reversed(levels):
            left = cur_level[:, :half]
            right = cur_level[:, half : 2 * half]
            inv_left = self.montmul(inv[:, :half], right)
            inv_right = self.montmul(inv[:, :half], left)
            if odd:
                inv = jnp.concatenate(
                    [inv_left, inv_right, inv[:, half : half + 1]], axis=1
                )
            else:
                inv = jnp.concatenate([inv_left, inv_right], axis=1)
        inv_col_totals = inv  # (n, cols)

        # unwind the row prefix chain (ONE reverse scan):
        # inv(x_i) = inv(P_i) * P_{i-1};  inv(P_{i-1}) = inv(P_i) * x_i
        prev_prefix = jnp.concatenate(
            [self.ones_mont(cols)[None], prefixes[:-1]], axis=0
        )

        def unwind_body(inv_P, args):
            xrow, pref = args
            inv_row = self.montmul(inv_P, pref)
            return self.montmul(inv_P, xrow), inv_row

        _, inv_rows = jax.lax.scan(
            unwind_body,
            inv_col_totals,
            (jnp.moveaxis(xr, 1, 0), prev_prefix),
            reverse=True,
        )
        return jnp.moveaxis(inv_rows, 0, 1).reshape(n, B)


@lru_cache(maxsize=None)
def make_field(p: int, w: int = 12) -> MontgomeryFp:
    return MontgomeryFp(p, w)
