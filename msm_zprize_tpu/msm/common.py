"""Shared MSM machinery: window sizing and the sorted-bucket pairing schedule.

TPU-native replacement for the reference's counting-sort + pointer-walk bucket
organization (`src/msm-common.ts:8-188`, `msm-batched-affine.ts:411-490`):
on TPU there are no shared-memory atomics, so points are organized by ONE
argsort per window and all subsequent pair-halving layouts are derived from
the per-bucket counts with pure int32 vector math (cumsums + searchsorted) —
deterministic, static-shaped, and sort-free after the first step.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "window_size",
    "default_windows",
    "sort_by_bucket",
    "bucket_counts",
    "halving_layout",
]


def window_size(curve_kind: str, log_n: int) -> int:
    """Window size c per curve type and log2(point count).

    Tuned tables analogous to `msm-common.ts:33-57`; TPU numbers favor
    slightly smaller c than the reference (bucket-reduction lanes are cheap,
    sorted-array width L + 2N/2^m per halving step grows with L).
    """
    if curve_kind == "batched-affine":
        table = {8: 6, 10: 8, 12: 10, 14: 11, 16: 12, 18: 13, 20: 14, 22: 16}
    else:
        table = {8: 6, 10: 7, 12: 9, 14: 10, 16: 11, 18: 12, 20: 13, 22: 14}
    if log_n <= 8:
        # floor of 6: tiny c explodes the window count (trace size) for no
        # benefit — buckets are cheap when mostly empty
        return 6
    keys = sorted(table)
    for k in keys:
        if log_n <= k:
            return table[k]
    return table[keys[-1]]


def default_windows(scalar_bits: int, c: int) -> int:
    """Number of c-bit signed windows covering scalar_bits (+1 carry bit)."""
    return -(-(scalar_bits + 1) // c)


def sort_by_bucket(digits):
    """Stable argsort of digit rows.

    digits: (K, B) int32 bucket ids (0 = skip). Returns (order, sorted_digits)
    both (K, B). The sort is the only O(B log B) data movement per window —
    the analog of the reference's counting sort (`msm-batched-affine.ts:444`).
    """
    order = jnp.argsort(digits, axis=-1, stable=True)
    sorted_digits = jnp.take_along_axis(digits, order, axis=-1)
    return order, sorted_digits


def bucket_counts(sorted_digits, n_buckets: int):
    """Per-bucket counts from sorted digit rows.

    sorted_digits: (K, B) with values in [0, n_buckets]. Returns
    counts (K, n_buckets+1) — deterministic segment-sum replacement for the
    reference's Atomics.add counting (`msm-batched-affine.ts:194`).
    """
    K, B = sorted_digits.shape
    one_hot_sum = jnp.zeros((K, n_buckets + 1), dtype=jnp.int32)
    ones = jnp.ones((K, B), dtype=jnp.int32)
    return one_hot_sum.at[
        jnp.arange(K)[:, None], sorted_digits
    ].add(ones)


def halving_layout(counts, width: int):
    """Compute the compacted layout for one pair-halving level.

    counts: (K, L1) current per-bucket element counts (bucket 0 row included
    but always zero there — bucket 0 digits are parked in a sentinel).
    width: static output width (>= max possible sum of ceil(counts/2)).

    Returns (bucket_of_slot, rank_of_slot, valid_slot): each (K, width):
    slot s of the *next* level holds the pair-sum of ranks (2j, 2j+1) of its
    bucket at the *current* level, where j = rank_of_slot.
    """
    K, L1 = counts.shape
    next_counts = (counts + 1) >> 1  # ceil(c/2)
    offsets = jnp.cumsum(next_counts, axis=-1) - next_counts  # exclusive prefix
    totals = offsets[:, -1] + next_counts[:, -1]
    slots = jnp.arange(width, dtype=jnp.int32)[None, :]  # (1, width)
    # bucket_of_slot via searchsorted on each row's offsets
    import jax

    bucket = jax.vmap(
        lambda off, s: jnp.searchsorted(off, s, side="right") - 1
    )(offsets, jnp.broadcast_to(slots, (K, width)))
    bucket = jnp.clip(bucket, 0, L1 - 1).astype(jnp.int32)
    rank = slots - jnp.take_along_axis(offsets, bucket, axis=-1)
    valid = slots < totals[:, None]
    return bucket, rank.astype(jnp.int32), valid, next_counts
