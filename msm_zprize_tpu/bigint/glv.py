"""GLV scalar-decomposition oracle.

Given the scalar field F_q with a cube root of unity ``lambda`` acting on the
curve as the cheap endomorphism (x, y) -> (beta x, y), decompose any scalar
s into (sign0, s0, sign1, s1) with

    s  ==  (-1)^sign0 * s0  +  lambda * (-1)^sign1 * s1   (mod q)

and s0, s1 of roughly half the bit length of q. The short lattice basis comes
from a half-GCD (`/root/reference/src/glv/glv.ts:22-50` — stop the extended
Euclid on (q, lambda) once the remainder drops below sqrt(q)); the rounded
Babai step mirrors `src/wasm/glv.ts:35-229` in exact integer math.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["GlvParams", "glv_params", "decompose", "egcd_stop_early"]


def egcd_stop_early(lambda_: int, q: int) -> tuple[tuple[int, int], tuple[int, int]]:
    """Half-GCD on (q, lambda): returns two short rows (v00, v01), (v10, v11)
    each satisfying v_i0 + v_i1 * lambda == 0 (mod q), |v_ij| ~ sqrt(q);
    the basis determinant is +-q."""
    # invariants: r_i = s_i * q + t_i * lambda, so (r_i, -t_i) + (-t_i)-row dot
    # (1, lambda) ≡ 0 (mod q). Consecutive Euclid rows have determinant ±q.
    # Some lambdas (e.g. BLS12-381's z^2 - 1 ≈ sqrt(q)) make the naive
    # "stop at r^2 < q" window unbalanced, so collect all rows and pick the
    # consecutive pair with the smallest max component.
    rows = []
    old_r, r = q, lambda_ % q
    old_t, t = 0, 1
    rows.append((old_r, -old_t))
    rows.append((r, -t))
    while r != 0:
        quo = old_r // r
        old_r, r = r, old_r - quo * r
        old_t, t = t, old_t - quo * t
        rows.append((r, -t))
    best = None
    for i in range(len(rows) - 1):
        (a, b), (c, d) = rows[i], rows[i + 1]
        det = a * d - b * c
        if abs(det) != q:
            continue
        size = max(abs(a), abs(b), abs(c), abs(d))
        if best is None or size < best[0]:
            best = (size, (rows[i], rows[i + 1]))
    assert best is not None, "no consecutive row pair with determinant ±q"
    v0, v1 = best[1]
    return v0, v1


def _round_div(a: int, b: int) -> int:
    """Round a/b to nearest integer (ties toward +inf), exact integer math."""
    if b < 0:
        a, b = -a, -b
    return (2 * a + b) // (2 * b)


@dataclass(frozen=True)
class GlvParams:
    q: int
    lambda_: int
    v00: int
    v01: int
    v10: int
    v11: int
    det: int
    max_bits: int  # bound on bit length of decomposed halves


def glv_params(q: int, lambda_: int) -> GlvParams:
    (v00, v01), (v10, v11) = egcd_stop_early(lambda_, q)
    det = v00 * v11 - v01 * v10
    # |s_i| <= max component sum bound; conservative: |v00|+|v10| etc. plus rounding slack
    bound = max(abs(v00) + abs(v10), abs(v01) + abs(v11)) + 1
    return GlvParams(
        q=q, lambda_=lambda_, v00=v00, v01=v01, v10=v10, v11=v11, det=det,
        max_bits=bound.bit_length(),
    )


def decompose(s: int, g: GlvParams) -> tuple[int, int, int, int]:
    """Returns (sign0, abs_s0, sign1, abs_s1); signs are 0/1."""
    s = s % g.q
    # Babai rounding: (x0, x1) = round((s, 0) · V^{-1})
    # V^{-1} = 1/det * [[v11, -v01], [-v10, v00]]
    x0 = _round_div(s * g.v11, g.det)
    x1 = _round_div(-s * g.v01, g.det)
    s0 = s - (x0 * g.v00 + x1 * g.v10)
    s1 = -(x0 * g.v01 + x1 * g.v11)
    assert (s0 + g.lambda_ * s1 - s) % g.q == 0
    sign0, a0 = (1, -s0) if s0 < 0 else (0, s0)
    sign1, a1 = (1, -s1) if s1 < 0 else (0, s1)
    assert a0.bit_length() <= g.max_bits and a1.bit_length() <= g.max_bits
    return sign0, a0, sign1, a1
