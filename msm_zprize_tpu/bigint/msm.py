"""Pure-Python MSM oracle: S = sum_i s_i * G_i.

Generic Pippenger over any curve object exposing ``zero / add / double /
is_zero`` plus a naive double-and-add cross-check — the judge for every
device MSM (cf. reference ``src/bigint/msm.ts:8-53``: unsigned windows,
c = max(log2 N - 1, 1)).
"""

from __future__ import annotations

__all__ = ["msm", "msm_naive"]


def msm_naive(curve, scalars, points):
    """Sum of scale(s_i, P_i); O(N * bits) — cross-check only."""
    acc = curve.zero
    for s, P in zip(scalars, points):
        acc = curve.add(acc, curve.scale(s, P))
    return acc


def msm(curve, scalars, points, scalar_bits: int, c: int | None = None):
    """Unsigned-window Pippenger, the reference oracle (`bigint/msm.ts:8`).

    ``points`` are curve-native representations (projective/extended tuples).
    """
    N = len(scalars)
    assert N == len(points) and N > 0
    if c is None:
        c = max(N.bit_length() - 1 - 1, 1)  # log2ceil(N) - 1, min 1
    K = -(-(scalar_bits) // c)  # number of windows
    L = 1 << c

    # bucket accumulation per window
    window_sums = []
    for k in range(K):
        buckets = [curve.zero] * L  # bucket 0 unused
        for s, P in zip(scalars, points):
            l = (s >> (k * c)) & (L - 1)
            if l != 0:
                buckets[l] = curve.add(buckets[l], P)
        # triangle sum: sum_l l * B_l via running suffix sums
        running = curve.zero
        total = curve.zero
        for l in range(L - 1, 0, -1):
            running = curve.add(running, buckets[l])
            total = curve.add(total, running)
        window_sums.append(total)

    # horner: result = sum_k 2^(k*c) W_k
    acc = window_sums[-1]
    for k in range(K - 2, -1, -1):
        for _ in range(c):
            acc = curve.double(acc)
        acc = curve.add(acc, window_sums[k])
    return acc
