"""Shared MSM machinery: window sizing and the sorted-bucket pairing schedule.

TPU-native replacement for the reference's counting-sort + pointer-walk bucket
organization (`src/msm-common.ts:8-188`, `msm-batched-affine.ts:411-490`):
on TPU there are no shared-memory atomics, so points are organized by ONE
argsort per window and all subsequent pair-halving layouts are derived from
the per-bucket counts with pure int32 vector math (cumsums + searchsorted) —
deterministic, static-shaped, and sort-free after the first step.
"""

from __future__ import annotations

import jax
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
        # measured on v5e. Round-4 engine (M = mean + 4.8*sqrt(mean) slots,
        # compare-based counts): 2^16 c=12 at 107 ms; 2^18 c=13 (355.6 ms)
        # beats c=14 (464.3) by 23% — smaller L more than pays for itself
        # now that slot headroom scales with sqrt(mean) instead of mean
        # (slot count ~ K*(mean+4.8*sqrt(mean))*L favors bigger mean).
        # 2^20: c=13 (see artifacts/run_2e20_r4.txt) on the same argument.
        # Earlier 2x-mean-era numbers (sweep_2e16_r3.txt) preferred c=14
        # at 2^18/2^20; superseded.
        table = {8: 6, 10: 8, 12: 10, 14: 11, 16: 12, 18: 13, 20: 13, 22: 14}
    else:
        # edwards/basic track, re-measured r5 (compact-residual engine,
        # T=2048): 2^20 c=12 1842 ms beats c=13 1913 and c=14 2349
        table = {8: 6, 10: 7, 12: 9, 14: 10, 16: 11, 18: 12, 20: 12, 22: 13}
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


def sort_by_bucket(digits, payload=None):
    """Sort digit rows, carrying the permutation as a payload.

    digits: (K, B) int32 bucket ids. Returns (order, sorted_digits) both
    (K, B). ONE `lax.sort` produces both (key = id, payload = position) —
    cheaper than argsort + a batched take_along_axis re-gather, and the only
    O(B log B) data movement per window (the analog of the reference's
    counting sort, `msm-batched-affine.ts:444`). Unstable: bucket contents
    may pair in any order, which curve addition doesn't care about.

    ``payload`` overrides the default position payload (used to ride extra
    per-point bits — e.g. the digit sign — through the sort so downstream
    consumers need ONE gather instead of two).
    """
    K, B = digits.shape
    if payload is None:
        payload = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :], (K, B))
    sorted_digits, order = jax.lax.sort(
        [digits, payload], dimension=1, num_keys=1, is_stable=False
    )
    return order, sorted_digits


def bucket_counts(sorted_digits, n_buckets: int):
    """Per-bucket counts from digit rows (sorted or not — a histogram).

    sorted_digits: (K, B) with values in [0, n_buckets]. Returns
    counts (K, n_buckets+1) — deterministic segment-sum replacement for the
    reference's Atomics.add counting (`msm-batched-affine.ts:194`).

    Formulated as a broadcast-compare + reduction over B-chunks: XLA:TPU
    fuses the (K, n_buckets, chunk) compare into the chunk reduction, and
    the VPU eats it at ~2.2x the scatter-add's speed at MSM shapes
    (scripts/counts_probe.py: 8.7 vs 19.5 ms at K=11, B=2^17, L=2^11 —
    scatter pays ~9 ns per UPDATE, compare pays per-element-compare which
    vectorizes). The scan keeps the compare tile in VMEM-sized pieces.
    """
    K, B = sorted_digits.shape
    n_out = n_buckets + 1
    if n_buckets > (1 << 14):
        # the compare formulation does O(n_buckets * B) work — fine at the
        # padded engine's L <= 8192, pathological for the halving path's
        # giant-window edge cases (L up to 2^21, e.g. the c=22 sharded
        # test). Scatter-add is O(B) and wins there.
        rows = jnp.arange(K, dtype=jnp.int32)[:, None]
        out = jnp.zeros((K, n_out), jnp.int32)
        return out.at[rows, jnp.minimum(sorted_digits, n_out - 1)].add(1)
    iota = jnp.arange(n_out, dtype=jnp.int32)
    C = 8192
    if B % C or B <= C:
        return (
            sorted_digits[:, None, :] == iota[None, :, None]
        ).sum(axis=-1, dtype=jnp.int32)

    chunks = jnp.moveaxis(sorted_digits.reshape(K, B // C, C), 1, 0)

    def body(carry, chunk):
        return (
            carry
            + (chunk[:, None, :] == iota[None, :, None]).sum(
                axis=-1, dtype=jnp.int32
            ),
            None,
        )

    counts, _ = jax.lax.scan(body, jnp.zeros((K, n_out), jnp.int32), chunks)
    return counts


def _fill_runs(vals, starts, width: int, kind: str):
    """Run-length fill: output slot s of row k gets vals[k, b] where b is the
    bucket owning slot s, i.e. b = max{l : starts[k, l] <= s}.

    Works by scattering vals at their run-start positions and completing
    with a cumulative min/max along the row — valid when vals are
    monotonically non-increasing ("min") or non-decreasing ("max") in l,
    which makes the owner's value the extremum among colliding run starts
    (empty runs share a start with their successor). Pure vector ops: no
    batched gathers, no searchsorted (XLA:TPU lowers those to slow
    per-element loops — measured 175x slower than this formulation).
    """
    K, L1 = vals.shape
    rows = jnp.arange(K, dtype=jnp.int32)[:, None]
    pos = jnp.minimum(starts, width - 1)
    if kind == "min":
        big = jnp.int32(2**31 - 1)
        vals = jnp.where(starts < width, vals, big)
        grid = jnp.full((K, width), big, dtype=jnp.int32)
        grid = grid.at[rows, pos].min(vals)
        return jax.lax.cummin(grid, axis=1)
    vals = jnp.where(starts < width, vals, jnp.int32(-1))
    grid = jnp.full((K, width), -1, dtype=jnp.int32)
    grid = grid.at[rows, pos].max(vals)
    return jax.lax.cummax(grid, axis=1)


def halving_layout(counts, width: int, cur_width: int):
    """Pair positions for one compacted halving level.

    counts: (K, L1) current per-bucket element counts over the current
    level's packed array (bucket b occupies rows [cur_off[b], cur_off[b] +
    counts[b])). width: static output width (>= max Σ ceil(counts/2)).

    Slot s of the next level holds the pair-sum of current positions
    (pos0, pos0+1) of its owning bucket. Returns (pos0, has_partner, valid,
    next_counts); all position math is derived with run-length fills:

        pos0[s]  = cur_off[b] + 2*(s - next_off[b]) = 2s + adj[b],
                   adj = cur_off - 2*next_off   (non-increasing -> min-fill)
        partner  = pos0+1 < end[b],  end = cur_off + counts
                   (non-decreasing -> max-fill)
    """
    K, L1 = counts.shape
    next_counts = (counts + 1) >> 1  # ceil(c/2)
    next_off = jnp.cumsum(next_counts, axis=-1) - next_counts
    cur_off = jnp.cumsum(counts, axis=-1) - counts
    totals = next_off[:, -1] + next_counts[:, -1]
    slots = jnp.arange(width, dtype=jnp.int32)[None, :]  # (1, width)
    adj = _fill_runs(cur_off - 2 * next_off, next_off, width, "min")
    end = _fill_runs(cur_off + counts, next_off, width, "max")
    pos0 = 2 * slots + adj
    valid = slots < totals[:, None]
    has_partner = (pos0 + 1 < end) & valid
    pos0 = jnp.clip(pos0, 0, cur_width - 1)
    return pos0, has_partner, valid, next_counts
