"""Generic Pippenger engine: bucket accumulation, reduction, Horner.

The structure mirrors the reference's flagship pipeline
(`src/msm-batched-affine.ts:50-588`, call stack in SURVEY.md §3.2) but every
phase is re-expressed as static-shaped vector programs:

* counting sort + pointer walks  ->  one argsort per window + layouts derived
  from bucket counts by cumsum/searchsorted (`common.halving_layout`)
* batchAdd pair lists at stride m ->  per-level compacted pair arrays, ALL
  windows concatenated into one batch so each level is a single wide
  batched-add (one shared inversion per level, not per window)
* reduceBucketsColumnProjective    ->  block triangle/row suffix sums over a
  (windows x blocks)-wide lane dimension
* main-thread horner               ->  lax.scan over windows

The engine is generic over a point-ops adapter so the same code drives
batched-affine Weierstrass (flagship), projective Weierstrass, and twisted
Edwards (msm-basic analog, `src/msm-basic.ts:45-223`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.vma import pvary_like, vma_of
from .common import bucket_counts, halving_layout, sort_by_bucket

__all__ = [
    "accumulate_buckets",
    "accumulate_buckets_padded",
    "reduce_buckets",
    "horner",
    "msm_pipeline",
    "slot_count",
]


def slot_count(B: int, L: int) -> int:
    """Slots per bucket M for the padded engine's MAIN round.

    The gather that fills the (M, K, L) slot layout is INDEX-count bound
    (~13-16 ns/index on v5e regardless of row count, scripts/gather_bench4
    and r5_probe: the 2-step composed gather is ~46 ms of the 80 ms
    accumulation at 2^16), and the tree does M-1 adds per bucket — so M is
    the accumulation phase's unit cost. Rounds-4's schedule cleared the
    MAXIMUM Poisson occupancy over all K*L buckets (mean + 4.8*sqrt(mean),
    ~4.5 sigma at the 2^16 shape) because the only overflow handler was a
    GLOBAL M/4-slot residual round — almost as expensive as the main one.
    Round 5 adds a COMPACTED top-T residual (top_k overflowing buckets
    only, ~1k gather indices per round), so the main round now budgets
    just mean + 2*sqrt(mean): ~2.3% of buckets overflow into a residual
    whose cost is ~100x smaller per slot. Below mean 16 the sqrt margin
    reaches 2x-mean anyway; keep 2x there. M is a multiple of 4 and even
    everywhere (the fused first-level kernel halves the slot axis)."""
    import math

    mean = max(B // L, 1)
    if mean >= 16:
        return (mean + math.ceil(2.0 * math.sqrt(mean)) + 3) & ~3
    return max(2 * mean, 2)


def _take_flat(pts, flat_idx):
    """Gather point leaves (..., W) by a FLAT 1-D index vector.

    The one gather shape XLA:TPU executes at memory speed; every other
    formulation tried (batched take_along_axis, searchsorted, dyn-slice
    scans) lowers to per-element loops 100x+ slower (scripts/gather_bench*).
    """
    return type(pts)(*(jnp.take(a, flat_idx, axis=-1) for a in pts))


def _stack(pts):
    """Concatenate a point pytree's leaves ((n_i, W) or (W,)) into ONE
    (R, W) array. A gather's cost scales with its index count, not its row
    count, so moving all coordinates as one array amortizes the per-index
    overhead across the whole point. Returns (stacked, row_splits, type)."""
    leaves = [a if a.ndim == 2 else a[None] for a in pts]
    splits, shapes = [], []
    off = 0
    for a in pts:
        r = a.shape[0] if a.ndim == 2 else 1
        splits.append((off, off + r, a.ndim))
        off += r
    return jnp.concatenate(leaves, axis=0), tuple(splits), type(pts)


def _unstack(arr, splits, pt_type):
    out = []
    for lo, hi, ndim in splits:
        a = arr[lo:hi]
        out.append(a if ndim == 2 else a[0])
    return tuple(out) if pt_type is tuple else pt_type(*out)


def _select(mask, a, b):
    return type(a)(*(jnp.where(mask, fa, fb) for fa, fb in zip(a, b)))


def accumulate_buckets(points, digits, signs, L: int, pair_add, prepare, zero_like):
    """Accumulate signed points into per-window buckets.

    points:  point pytree with leaves (..., B) — the base points
    digits:  (K, B) int32 magnitudes in [0, L] (0 = skip)
    signs:   (K, B) int32 sign flags
    L:       number of buckets (weights 1..L)
    pair_add(P0, P1, has_partner, valid) -> point pytree: adds lanes where
        has_partner&valid, passes P0 through where not
    prepare(P, flag): applied once after the initial gather — conditional
        negation plus any representation change (e.g. affine -> projective),
        done post-gather so the gather moves the narrowest form
    zero_like(K, L): (K, L)-batched identity points

    Point leaves are kept FLAT (..., K*W) throughout — every per-level
    pairing is ONE flat gather per operand (see _take_flat).

    Returns bucket sums as a point pytree with leaves (..., K, L) plus an
    ``empty`` mask (K, L) marking buckets that received no points.
    """
    K, B = digits.shape
    # bucket ids: magnitude-1 in [0, L-1]; zero digits -> sentinel L
    ids = jnp.where(digits == 0, L, digits - 1).astype(jnp.int32)
    order, sorted_ids = sort_by_bucket(ids)
    counts = bucket_counts(sorted_ids, L + 1)[:, :L]  # (K, L), sentinel dropped
    rows = jnp.arange(K, dtype=jnp.int32)[:, None]

    # initial level: ALL point leaves stacked into one (R, B) array so the
    # big reorder is ONE flat gather (a gather's cost is dominated by the
    # index count, not the row count — stacking amortizes it across every
    # coordinate); signs are per-window so their flat index needs the row
    # offset. prepare() (sign application / representation change) runs
    # post-gather on the unstacked leaves.
    stacked, splits, pt_type = _stack(points)
    g = jnp.take(stacked, order.reshape(-1), axis=-1)  # (R, K*B)
    sorted_signs = jnp.take(signs.reshape(-1), (order + rows * B).reshape(-1))
    P = prepare(_unstack(g, splits, pt_type), sorted_signs)
    P, splits, pt_type = _stack(P)  # leaves may have changed shape/count

    def one_level(P, cur_counts, width, next_width):
        pos0, has_partner, valid, next_counts = halving_layout(
            cur_counts, next_width, width
        )
        flat0 = (pos0 + rows * width).reshape(-1)
        flat1 = (jnp.minimum(pos0 + 1, width - 1) + rows * width).reshape(-1)
        P0 = jnp.take(P, flat0, axis=-1)
        P1 = jnp.take(P, flat1, axis=-1)
        out = pair_add(
            _unstack(P0, splits, pt_type),
            _unstack(P1, splits, pt_type),
            has_partner.reshape(-1),
            valid.reshape(-1),
        )
        return _stack(out)[0], next_counts

    # exactly ceil(log2(B)) halving levels guarantee every count reaches <= 1
    # in the worst case (all points in one bucket); real inputs finish far
    # sooner. Schedule: a geometrically-shrinking EXACT-width prefix
    # (unrolled; widths are worst-case bounds derived from B and L, so they
    # stay static), then a constant-width plateau as ONE lax.while_loop that
    # EXITS as soon as every bucket holds <= 1 element — near-uniform digit
    # distributions leave the plateau after ~1-2 iterations instead of the
    # ~log2(B/L) the worst case requires. (An earlier revision quantized
    # widths to a half-octave grid to cap Mosaic kernel-shape compiles; the
    # exact schedule costs a few more cached compiles but ~30% fewer
    # slot-lanes of gather+add — the dominant MSM cost.)
    n_levels = max((B - 1).bit_length(), 0)
    plateau_w = 2 * L  # smallest w with (w+L)//2+1 <= w (L is a power of 2)

    widths = [B]
    need = B
    while True:
        need = (need + L) // 2 + 1
        if need >= widths[-1] or widths[-1] <= plateau_w:
            break
        widths.append(max(need, plateau_w))
    n_prefix = len(widths) - 1

    width = B
    cur_counts = counts
    for level in range(n_prefix):
        P, cur_counts = one_level(P, cur_counts, widths[level], widths[level + 1])
        width = widths[level + 1]

    n_plateau = n_levels - n_prefix
    if n_plateau > 0:

        def cond(carry):
            _, cur_counts, it = carry
            return (it < n_plateau) & jnp.any(cur_counts > 1)

        def body(carry):
            Pc, cur_counts, it = carry
            Pn, next_counts = one_level(Pc, cur_counts, width, width)
            return (Pn, next_counts, it + 1)

        P, cur_counts, _ = jax.lax.while_loop(
            cond, body, (P, cur_counts, pvary_like(jnp.int32(0), vma_of(P)))
        )

    # final: bucket b's sum (count<=1) sits at offsets[:, b]
    offsets = jnp.cumsum(cur_counts, axis=-1) - cur_counts
    idx = jnp.clip(offsets, 0, width - 1) + rows * width
    sums = _unstack(jnp.take(P, idx.reshape(-1), axis=-1), splits, pt_type)
    sums = type(sums)(*(a.reshape(a.shape[:-1] + (K, L)) for a in sums))
    empty = cur_counts == 0
    zero = pvary_like(zero_like(K, L), vma_of(empty))
    sums = _select(empty, zero, sums)
    return sums, empty


def accumulate_buckets_padded(
    point_leaves,
    digits,
    signs,
    L: int,
    pair_add,
    prepare,
    zero_like,
    pair_level1=None,
    window_chunks: int = 1,
):
    """Bucket accumulation via a PADDED (window, bucket, slot) layout.

    The halving engine above pays ~2 data-dependent gathers per level —
    and on TPU a gather's cost is dominated by a large fixed per-op
    component (scripts/gather_bench2: ~9 ms/op nearly independent of index
    count at MSM shapes), so ~20 level-gathers dominate the whole MSM.
    This path instead does ONE composed gather into a dense (K, L, M)
    layout (M = 2x the mean bucket occupancy, a power of two) and then
    log2(M) levels of REGULAR pairwise complete adds (reshape-only data
    movement at memory speed, no gathers). Requires ``pair_add`` to be a
    COMPLETE group law (identity lanes flow through unmasked), which the
    Renes-Costello-Batina projective formulas and the unified Edwards add
    both are.

    point_leaves: tuple of arrays, each (r, B) or (B,) — the per-point
        coordinate data to gather (narrowest form, e.g. affine x, y).
    digits:  (K, B) int32 magnitudes in [0, L] (0 = skip).
    signs:   (K, B) int32 sign flags.
    pair_add(leaves_a, leaves_b) -> leaves: complete add, identity-safe.
    prepare(gathered_leaves, sign, valid) -> accumulator-form leaves with
        the EXACT identity element wherever ``valid`` is False.
    zero_like(K, L) -> accumulator-form identity leaves (.., K, L).

    Occupancy equalization: windows whose digits occupy fewer than L
    distinct values (the top GLV window occupies FAR fewer — its digit
    range is truncated by the scalar bound and biased small by the Babai
    remainder distribution) get their buckets SPREAD over L virtual ids.
    Virtual bucket (id, r), r in [0, S_k), holds the points at sorted
    positions offset[id] + r + S_k*j — i.e. spreading is by WITHIN-BUCKET
    RANK, which balances deterministically: occupancy is exactly
    ceil(count_id / S_k) (an earlier index-residue spread
    `id*S + (i & (S-1))` left binomial noise — measured max 158 vs the
    124 ideal at 2^16, tripping a ~150 ms residual round for ~1k points).
    S_k is computed from the DATA: S_k = floor(L / (max_id_k + 1)) — an
    ARBITRARY integer, not a power of two (a pow2 restriction wastes up
    to half the virtual space for partial top windows whose digit range
    is not a power of two). Shapes stay static — S is a traced (K, 1)
    vector, the mapping is pure index arithmetic post-sort, and the
    virtual run [l*S, (l+1)*S) is re-folded onto logical id l by log2(L)
    strided masked-add levels plus one tiny gather after accumulation.

    Residual rounds: occupancies above M are handled by a lax.while_loop
    over further M-slot rounds — entered only for adversarial digit
    distributions (e.g. many duplicate scalars), and correct (though
    linear-time) for those; cf. the safe/halving path which stays O(log)
    in the worst case.

    ``pair_level1``, when given, fuses sign application + identity
    encoding + the FIRST tree level into one call:
    pair_level1(leaves_a, leaves_b, sign_a, sign_b, valid_a, valid_b) ->
    accumulator-form leaves of the pairwise sums (e.g. the unit-Z RCB
    kernel, `curves/pallas_curve.py::rcb7_unitz` — 9 muls instead of
    12 and no HBM round-trip for the prepared operands). The digit sign
    bit rides the sort payload (bit 30), so each round needs ONE index
    gather instead of separate position and sign gathers.

    ``window_chunks`` streams the window axis in chunks via ONE lax.scan:
    the (M, Kc, L) slot buffers (gather output + tree levels) are the
    dominant live memory, so chunking divides peak HBM by ~chunks at no
    extra arithmetic — this is what fits 2^20 on a 16 GB chip (the analog
    of the reference's 4 GB discipline, `doc/zprize23.md:27`).

    Returns accumulator leaves (.., K, L); empty buckets hold the identity.
    """
    K, B = digits.shape
    assert B < (1 << 30), "sort payload packs position | sign << 30"
    ids_all = jnp.where(digits == 0, L, digits - 1).astype(jnp.int32)
    signs_all = signs.astype(jnp.int32)

    M = slot_count(B, L)
    pos_bits = max((B - 1).bit_length(), 1)
    id_bits = (L + 1).bit_length()  # ids range [0, L] inclusive (sentinel)
    packed = id_bits + 1 + pos_bits <= 31
    sign_shift = pos_bits if packed else 30
    POS_MASK = (1 << sign_shift) - 1
    vma = vma_of(digits)

    stacked, splits, pt_type = _stack(tuple(point_leaves))

    def window_block(ids, sgn):
        """Full accumulation for a block of Kc windows -> (.., Kc, L)."""
        Kc = ids.shape[0]
        max_id = jnp.max(jnp.where(ids == L, 0, ids), axis=1)  # (Kc,)
        # spread factor: ARBITRARY integer S = floor(L / range) (a power-of-2
        # restriction wastes up to half the virtual-bucket space for
        # order-dependent partial top windows — e.g. ed-on-bls12-377's
        # bits-242..253 window has range 299, where S=2 left occupancy 131
        # vs M=128, tripping residual rounds; S=3 gives 73)
        S = jnp.maximum(L // (max_id + 1), 1).astype(jnp.int32)[:, None]

        iota = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None, :], (Kc, B))
        if packed:
            # pack (id, sign, position) into ONE int32 key: a single-operand
            # lax.sort is cheaper than key+payload, and the sign rides
            # along for free. Feasible whenever c + log2(B) fits the budget
            # (e.g. 2^16 points at c <= 13).
            key = (ids << (pos_bits + 1)) | (sgn << pos_bits) | iota
            key = jax.lax.sort(key, dimension=1, is_stable=False)
            sorted_ids = key >> (pos_bits + 1)
            order = key & ((1 << (pos_bits + 1)) - 1)  # sign@pos_bits | pos
        else:
            payload = iota | (sgn << 30)
            order, sorted_ids = sort_by_bucket(ids, payload)
        counts = bucket_counts(sorted_ids, L + 1)[:, :L]  # (Kc, L)
        offsets = jnp.cumsum(counts, axis=-1) - counts
        # per-virtual-bucket occupancy bound: ceil(count/S) (deterministic)
        max_occ = jnp.max((counts + S - 1) // S)

        # virtual id v -> (id, r): id = v // S_k, r = v % S_k;
        # its j-th point sits at sorted position offset[id] + r + S_k * j.
        vid = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
        v_id = vid // S  # (Kc, L)
        v_r = vid - v_id * S  # (Kc, L)
        rowsL = jnp.arange(Kc, dtype=jnp.int32)[:, None] * L
        v_off = jnp.take(
            offsets.reshape(-1), (v_id + rowsL).reshape(-1)
        ).reshape(Kc, L)
        v_cnt = jnp.take(
            counts.reshape(-1), (v_id + rowsL).reshape(-1)
        ).reshape(Kc, L)

        order_flat = order.reshape(-1)  # packed position | sign

        def tree_from(cur, m: int, lanes: int | None = None):
            # cur: accumulator leaves (.., m, lanes); pairwise adds down to
            # 1. Slot-half j pairs with j + m/2 (contiguous HALVES of the
            # major slot axis). Any pairing is valid — the tree just sums
            # all slots — and identity padding flows through the complete
            # add. Odd m folds the last slot into the first (one extra
            # lanes-wide add), so M need not be a power of two — the 1.5x-
            # mean slot schedule produces chains like 96 -> ... -> 3.
            if lanes is None:
                lanes = Kc * L
            while m > 1:
                if m % 2:
                    first = pair_add(
                        tuple(a[..., :1, :] for a in cur),
                        tuple(a[..., m - 1 : m, :] for a in cur),
                    )
                    cur = tuple(
                        jnp.concatenate([f, a[..., 1 : m - 1, :]], axis=-2)
                        for f, a in zip(first, cur)
                    )
                    m -= 1
                half = m // 2
                cur = pair_add(
                    tuple(a[..., :half, :] for a in cur),
                    tuple(a[..., half:, :] for a in cur),
                )
                m = half
            return tuple(a.reshape(a.shape[:-2] + (lanes,)) for a in cur)

        def one_round(acc, p, m: int):
            # slot layout (m, Kc, L): the slot axis is MAJOR so each tree
            # level slices contiguous halves of the leading batch axis —
            # the lane (minor) dimension stays Kc*L-wide at every level
            # instead of shrinking 128 -> 1 through sublane/lane relayouts.
            kbase = jnp.broadcast_to(
                (jnp.arange(Kc, dtype=jnp.int32) * B)[None, :, None],
                (m, Kc, L),
            ).reshape(-1)
            j = jnp.arange(m, dtype=jnp.int32)[:, None, None]  # (m, 1, 1)
            rank = v_r[None] + (p + j) * S[None]  # (m, Kc, L)
            valid = (rank < v_cnt[None]).reshape(-1)
            pos = jnp.clip(v_off[None] + rank, 0, B - 1)
            flat = pos.reshape(-1) + kbase
            src2 = jnp.take(order_flat, flat)  # (m*Kc*L,) packed pos|sign
            src = src2 & POS_MASK
            sg = src2 >> sign_shift
            g = jnp.take(stacked, src, axis=-1)
            leaves = _unstack(g, splits, pt_type)
            if pair_level1 is not None:
                # fused sign+identity+first-level kernel: m -> m/2 slots
                half = m // 2
                hsz = half * Kc * L
                a = tuple(x[..., :hsz] for x in leaves)
                b = tuple(x[..., hsz:] for x in leaves)
                P = pair_level1(
                    a, b, sg[:hsz], sg[hsz:], valid[:hsz], valid[hsz:]
                )
                cur = tuple(
                    x.reshape(x.shape[:-1] + (half, Kc * L)) for x in P
                )
                sums = tree_from(cur, half)
            else:
                P = prepare(leaves, sg, valid)
                cur = tuple(x.reshape(x.shape[:-1] + (m, Kc * L)) for x in P)
                sums = tree_from(cur, m)
            return pair_add(acc, sums)

        acc0 = pvary_like(
            tuple(
                a.reshape(a.shape[:-2] + (Kc * L,)) for a in zero_like(Kc, L)
            ),
            vma,
        )

        # The MAIN rounds cover ranks [0, M_cov). M budgets only
        # mean + 2*sqrt(mean) (slot_count); when M*Kc*L exceeds the slot
        # budget, the main round streams the SLOT axis in sub-rounds of m1
        # slots — same total gather indices and tree adds, one extra
        # full-width accumulate per sub-round, and the live gather/tree
        # buffers shrink by the round count (2^21's 13.8M-slot chunk was
        # 1.8 GB over HBM as a single round). Remaining overflow (~2% of
        # buckets) is handled by a COMPACTED residual: top_k picks the T
        # highest-occupancy virtual buckets and further rounds gather only
        # (MR, T) slots (~1k indices, vs M/4 * Kc * L ~ 0.5M for the old
        # global residual). The global path remains as the fallback for
        # adversarial inputs (e.g. duplicate scalars) where more than T
        # buckets overflow at once.
        import os as _os2

        budget = int(_os2.environ.get("MSM_TPU_MAX_SLOTS", str(8 << 20)))
        n_rounds = max(1, -(-(M * Kc * L) // budget))
        m1 = -(-M // n_rounds)
        m1 += m1 & 1  # fused level-1 kernel splits slots into equal halves
        M_cov = n_rounds * m1  # ranks covered by the main rounds (>= M)
        acc = acc0
        for r in range(n_rounds):
            acc = one_round(acc, jnp.int32(r * m1), m1)

        # per-VIRTUAL-bucket occupancy: virtual bucket v=(id, r) holds
        # ranks r, r+S, ... < cnt  =>  occ = ceil((cnt - r) / S)
        occ = jnp.maximum((v_cnt - v_r + S - 1) // S, 0)  # (Kc, L)
        n_over = jnp.sum(occ > M_cov)
        # T must cover a WHOLE over-occupied top window (a window whose
        # digit range is just over L/2 gets S=1 from the spread and its
        # every bucket runs ~range/L above the global mean — e.g. Edwards
        # c=12 has 1127 such buckets, which overflowed a T of 1024 and fell
        # back to the global residual, ~140 ms of the 2^18 MSM)
        T = min(2048, Kc * L)
        MR = min(32, M)
        MR += MR & 1  # fused level-1 kernel needs an even slot split

        def compact_residual(acc):
            top_occ, top_idx = jax.lax.top_k(occ.reshape(-1), T)
            g_off = jnp.take(v_off.reshape(-1), top_idx)
            g_vr = jnp.take(v_r.reshape(-1), top_idx)
            g_S = jnp.take(jnp.broadcast_to(S, (Kc, L)).reshape(-1), top_idx)
            g_cnt = jnp.take(v_cnt.reshape(-1), top_idx)
            kbase_t = (top_idx // L) * B  # window offset into order_flat
            maxo = top_occ[0]

            def one_round_t(accT, p):
                j = jnp.arange(MR, dtype=jnp.int32)[:, None]  # (MR, 1)
                rank = g_vr[None, :] + (p + j) * g_S[None, :]  # (MR, T)
                valid = (rank < g_cnt[None, :]).reshape(-1)
                pos = jnp.clip(g_off[None, :] + rank, 0, B - 1)
                flat = (pos + kbase_t[None, :]).reshape(-1)
                src2 = jnp.take(order_flat, flat)
                src = src2 & POS_MASK
                sg = src2 >> sign_shift
                g = jnp.take(stacked, src, axis=-1)
                leaves = _unstack(g, splits, pt_type)
                if pair_level1 is not None:
                    half = MR // 2
                    hsz = half * T
                    a = tuple(x[..., :hsz] for x in leaves)
                    b = tuple(x[..., hsz:] for x in leaves)
                    P = pair_level1(
                        a, b, sg[:hsz], sg[hsz:], valid[:hsz], valid[hsz:]
                    )
                    cur = tuple(x.reshape(x.shape[:-1] + (half, T)) for x in P)
                    sums = tree_from(cur, half, lanes=T)
                else:
                    P = prepare(leaves, sg, valid)
                    cur = tuple(x.reshape(x.shape[:-1] + (MR, T)) for x in P)
                    sums = tree_from(cur, MR, lanes=T)
                return pair_add(accT, sums)

            accT = pvary_like(
                tuple(a.reshape(a.shape[:-2] + (T,)) for a in zero_like(1, T)),
                vma,
            )

            def condt(carry):
                _, p = carry
                return p < maxo

            def bodyt(carry):
                a, p = carry
                return one_round_t(a, p), p + MR

            accT, _ = jax.lax.while_loop(
                condt, bodyt, (accT, pvary_like(jnp.int32(M_cov), vma))
            )
            # ONE full-width combine: scatter the T partial sums into an
            # identity-valued delta (non-overflowing top entries carry the
            # identity — a no-op under the complete add)
            idz = pvary_like(
                tuple(
                    a.reshape(a.shape[:-2] + (Kc * L,)) for a in zero_like(Kc, L)
                ),
                vma,
            )
            delta = tuple(
                z.at[..., top_idx].set(t, mode="drop", unique_indices=True)
                for z, t in zip(idz, accT)
            )
            return pair_add(acc, delta)

        def global_residual(acc):
            # residual slot count must be EVEN: the fused pair_level1
            # branch splits the slots into two equal halves (M//4 can be
            # odd, e.g. mean 32 -> M=60 -> 15)
            M2 = max(M // 4, 2)
            M2 += M2 & 1

            def cond(carry):
                _, p = carry
                return p < max_occ

            def body(carry):
                a, p = carry
                return one_round(a, p, M2), p + M2

            acc2, _ = jax.lax.while_loop(
                cond, body, (acc, pvary_like(jnp.int32(M_cov), vma))
            )
            return acc2

        import os as _os

        _rmode = _os.environ.get("MSM_TPU_RESIDUAL", "auto")
        if _rmode == "off":  # DIAGNOSIS ONLY: drops overflow contributions
            pass
        elif _rmode == "global":
            acc = global_residual(acc)
        elif _rmode == "compact":
            acc = compact_residual(acc)
        else:
            acc = jax.lax.cond(
                n_over == 0,
                lambda a: a,
                lambda a: jax.lax.cond(
                    n_over <= T, compact_residual, global_residual, a
                ),
                acc,
            )
        acc = tuple(a.reshape(a.shape[:-1] + (Kc, L)) for a in acc)

        # fold virtual buckets back to logical ids. Logical id l owns the
        # CONTIGUOUS virtual run [l*S, (l+1)*S); ceil(log2 L) levels of
        # strided masked adds collapse each run onto its first position
        # (v absorbs v+step iff both are in the same run — valid for
        # ARBITRARY S, not just powers of two), then one tiny (Kc*L)
        # gather moves position l*S to position l. Windows with S = 1
        # pass through untouched (every mask is False).
        vidx = jnp.arange(L, dtype=jnp.int32)[None, :]  # (1, L)
        in_run = vidx - (vidx // S) * S  # v % S, (Kc, L)
        step = 1
        while step < L:
            can = (in_run + step) < S  # absorb v+step into v
            shifted = tuple(
                jnp.concatenate(
                    [a[..., step:], z[..., : step]], axis=-1
                )
                for a, z in zip(acc, pvary_like(zero_like(Kc, L), vma))
            )
            comb = pair_add(acc, shifted)
            acc = tuple(jnp.where(can, cmb, a) for cmb, a in zip(comb, acc))
            step *= 2
        # gather logical sums: l <- virtual position l*S (clipped positions
        # for l >= ceil(L/S) hold garbage but correspond to ids the digits
        # never produced — their bucket sums are only ever multiplied by
        # weights of EMPTY buckets... they do receive weight in the
        # reduction, so force them to the identity explicitly.
        lidx = jnp.arange(L, dtype=jnp.int32)[None, :]
        src_pos = jnp.minimum(lidx * S, L - 1)  # (Kc, L)
        n_logical = (max_id + 1)[:, None]  # ids ever produced are < this
        rowsL2 = jnp.arange(Kc, dtype=jnp.int32)[:, None] * L
        flat_pos = (src_pos + rowsL2).reshape(-1)
        idz = pvary_like(zero_like(Kc, L), vma)
        out = []
        for a, z in zip(acc, idz):
            g = jnp.take(
                a.reshape(a.shape[:-2] + (Kc * L,)), flat_pos, axis=-1
            ).reshape(a.shape[:-2] + (Kc, L))
            out.append(jnp.where(lidx < n_logical, g, z))
        return tuple(out)

    chunks = max(1, min(window_chunks, K))
    if chunks == 1:
        return window_block(ids_all, signs_all)

    Kc = -(-K // chunks)
    # POWER-OF-TWO lane widths (Kc * L with both factors pow2) hit a
    # pathological XLA:TPU path in the chunked scan — measured 3-4x at
    # 2^18/2^20 (Kc=4: 1066 ms, Kc=5: 308 ms, Kc=3: 365 ms; the r5
    # regression from r4's 2^20 was exactly a Kc 3 -> 4 shift). Bump Kc to
    # the next non-power-of-two; the slot-buffer budget is a soft target
    # and the extra padding windows are all-sentinel (near-zero work).
    if Kc & (Kc - 1) == 0 and Kc < K:
        Kc += 1
    chunks = -(-K // Kc)
    pad_k = chunks * Kc - K
    if pad_k:
        # padding windows are all-sentinel: zero rounds, identity sums
        ids_all = jnp.concatenate(
            [ids_all, jnp.full((pad_k, B), L, dtype=jnp.int32)], axis=0
        )
        signs_all = jnp.concatenate(
            [signs_all, jnp.zeros((pad_k, B), dtype=jnp.int32)], axis=0
        )

    def scan_body(_, xs):
        i, s = xs
        return None, window_block(i, s)

    _, outs = jax.lax.scan(
        scan_body,
        None,
        (
            ids_all.reshape(chunks, Kc, B),
            signs_all.reshape(chunks, Kc, B),
        ),
    )
    res = []
    for a in outs:  # (chunks, .., Kc, L)
        a = jnp.moveaxis(a, 0, -3)  # (.., chunks, Kc, L)
        a = a.reshape(a.shape[:-3] + (chunks * Kc, L))[..., :K, :]
        res.append(a)
    return tuple(res)


def reduce_buckets(bucket_sums, empty, c0: int, acc_ops):
    """Per-window weighted bucket reduction S_k = sum_l (l+1) * B[k, l].

    Block decomposition (cf. the reference's fully-affine sub-partition
    reduction, `msm-batched-affine-single-thread.ts:522-667`): split L = D *
    2^c0; per block compute triangle T_d = sum_j (j+1) B[d,j] and row
    R_d = sum_j B[d,j] with one 2^c0-step suffix loop over (K*D)-wide lanes;
    then S = sum_d T_d + 2^c0 * sum_d d*R_d.

    acc_ops must provide: zero(K, D) accumulators, add_point(acc, bucket_pt,
    mask) (accumulator + masked bucket point), add(acc, acc), double(acc),
    and narrow(acc[..., K, D] -> per-window reduce over D is done here via
    log-tree of add).

    Returns per-window accumulator pytree with leaves (..., K).
    """
    leaves = bucket_sums[0]
    K, L = leaves.shape[-2], leaves.shape[-1]
    assert L & (L - 1) == 0, "bucket count must be a power of two"
    block = 1 << c0
    while L % block != 0:
        block //= 2
        c0 -= 1
    D = L // block  # power of two since L and block are
    # reshape leaves (..., K, D, block)
    bs = type(bucket_sums)(*(a.reshape(a.shape[:-1] + (D, block)) for a in bucket_sums))
    emp = empty.reshape(K, D, block)

    # suffix-sum scan over the block axis (j = block-1 .. 0):
    #   running += B[.., j]; total += running  => total = sum_j (j+1) B_j
    pt_type = type(bucket_sums)
    bs_moved = tuple(jnp.moveaxis(a, -1, 0) for a in bs)  # (block, n?, K, D)
    emp_moved = jnp.moveaxis(emp, -1, 0)  # (block, K, D)

    def tri_body(carry, xs):
        running, total = carry
        bj_leaves, mask = xs
        bj = pt_type(*bj_leaves)
        running = acc_ops.add_point(running, bj, ~mask)
        total = acc_ops.add(total, running)
        return (running, total), None

    vma = vma_of(*bucket_sums)
    init = pvary_like((acc_ops.zero(K, D), acc_ops.zero(K, D)), vma)
    (running, total), _ = jax.lax.scan(
        tri_body, init, (bs_moved, emp_moved), reverse=True
    )
    # total[d] = T_d; running[d] = R_d

    # weighted row sums: sum_d d*R_d via suffix scan over d = D-1 .. 1
    if D > 1:
        acc_type = type(running)
        r_moved = tuple(jnp.moveaxis(a[..., 1:], -1, 0) for a in running)

        def row_body(carry, rd_leaves):
            wr, racc = carry
            racc = acc_ops.add(racc, acc_type(*rd_leaves))
            wr = acc_ops.add(wr, racc)
            return (wr, racc), None

        initw = pvary_like((acc_ops.zero(K), acc_ops.zero(K)), vma)
        (wr, _), _ = jax.lax.scan(row_body, initw, r_moved, reverse=True)
        wr = type(wr)(*(a[..., None] for a in wr))  # (.., K, 1)
    else:
        wr = pvary_like(acc_ops.zero(K, 1), vma)
    # sum_d T_d: log-tree over D (power of two)
    tot = total
    Dcur = D
    while Dcur > 1:
        half = Dcur // 2
        left = type(tot)(*(a[..., :half] for a in tot))
        right = type(tot)(*(a[..., half:] for a in tot))
        tot = acc_ops.add(left, right)
        Dcur = half
    # S = tot + 2^c0 * wr
    dk = getattr(acc_ops, "double_k", None)
    if dk is not None and c0 > 0:
        wr = dk(wr, c0)
    else:
        for _ in range(c0):
            wr = acc_ops.double(wr)
    S = acc_ops.add(tot, wr)  # (..., K, 1)
    return type(S)(*(a[..., 0] for a in S))


def reduce_buckets_log(bucket_sums, c0: int, acc_ops):
    """Per-window weighted bucket reduction S_k = sum_l (l+1) * B[k, l] in
    LOG depth, for bucket sums already in accumulator form (projective /
    extended — identity lanes flow through the complete adds).

    The sequential variant (`reduce_buckets`) runs 2*block scan steps on
    (K*D)-lane arrays — latency-bound on TPU (measured ~9 ms of the 2^16
    MSM for ~0.5 Mmul of work). Here every step is a (K*D*block)-wide
    shifted add:

      suffix[j] = sum_{l >= j} B[l]          log2(block) doubling rounds
      T_d = sum_j suffix[j] = sum_j (j+1)B_j log2(block) tree levels
      R_d = suffix[0]
      W   = sum_d d*R_d = sum_{j>=1} suffixR[j]   (same trick over D)
      S   = sum_d T_d + 2^c0 * W

    ~4*log2(L) wide pair-adds instead of 2*block sequential steps."""
    pt_type = type(bucket_sums)
    leaves = bucket_sums[0]
    K, L = leaves.shape[-2], leaves.shape[-1]
    assert L & (L - 1) == 0, "bucket count must be a power of two"
    block = 1 << c0
    while L % block != 0:
        block //= 2
        c0 -= 1
    D = L // block
    vma = vma_of(*bucket_sums)
    bs = pt_type(*(a.reshape(a.shape[:-1] + (D, block)) for a in bucket_sums))

    def shift_add(x, step, axis):
        def sh(a, z):
            idx = [slice(None)] * a.ndim
            idx[axis] = slice(step, None)
            zidx = [slice(None)] * a.ndim
            zidx[axis] = slice(0, step)
            return jnp.concatenate([a[tuple(idx)], z[tuple(zidx)]], axis=axis)

        # identity leaves shaped like x: batch dims = everything after the
        # leading limb-rows axis
        zero = pvary_like(pt_type(*acc_ops.zero(*x[0].shape[1:])), vma)
        shifted = pt_type(*(sh(a, z) for a, z in zip(x, zero)))
        return acc_ops.add(x, shifted)

    def tree_sum(x, axis, n):
        while n > 1:
            half = n // 2

            def sl(a, lo, hi):
                idx = [slice(None)] * a.ndim
                idx[axis] = slice(lo, hi)
                return a[tuple(idx)]

            x = acc_ops.add(
                pt_type(*(sl(a, 0, half) for a in x)),
                pt_type(*(sl(a, half, 2 * half) for a in x)),
            )
            n = half
        return x

    # suffix over the block axis (axis -1)
    suf = bs
    step = 1
    while step < block:
        suf = shift_add(suf, step, -1)
        step *= 2
    R = pt_type(*(a[..., 0] for a in suf))  # (.., K, D)
    T = tree_sum(suf, -1, block)  # (.., K, D, 1)
    T = pt_type(*(a[..., 0] for a in T))  # (.., K, D)
    tot = tree_sum(T, -1, D)  # (.., K, 1)

    if D > 1:
        sufR = R
        step = 1
        while step < D:
            sufR = shift_add(sufR, step, -1)
            step *= 2
        # W = sum_{j>=1} sufR[j] = (sum_j sufR[j]) - sufR[0]; cheaper: drop
        # j=0 then tree-sum the remaining D-1 (pad one identity to D)
        zero = pvary_like(pt_type(*acc_ops.zero(K, 1)), vma)
        tail = pt_type(
            *(
                jnp.concatenate([a[..., 1:], z], axis=-1)
                for a, z in zip(sufR, zero)
            )
        )
        W = tree_sum(tail, -1, D)  # (.., K, 1)
    else:
        W = pvary_like(pt_type(*acc_ops.zero(K, 1)), vma)
    dk = getattr(acc_ops, "double_k", None)
    if dk is not None and c0 > 0:
        W = dk(W, c0)
    else:
        for _ in range(c0):
            W = acc_ops.double(W)
    S = acc_ops.add(tot, W)  # (.., K, 1)
    return pt_type(*(a[..., 0] for a in S))


def horner(window_sums, c: int, add, double, zero1, double_k=None):
    """result = sum_k 2^(k*c) * W_k via Horner from the top window.

    window_sums: pytree leaves (..., K); returns leaves (..., 1).
    ``double_k(P, k)``, when given, performs k chained doublings in one
    call (the fused TPU kernel): per-invocation overhead dominates this
    tail (tiny batch), so c*(K-1) separate doubles cost ~8 ms at 2^16.
    """
    leaves = window_sums[0]
    K = leaves.shape[-1]
    acc = type(window_sums)(*(a[..., K - 1 : K] for a in window_sums))
    if K == 1:
        return acc
    ws = type(window_sums)(*(jnp.moveaxis(a[..., : K - 1], -1, 0) for a in window_sums))

    def body(carry, wk):
        if double_k is not None:
            carry = double_k(carry, c)
        else:
            # c doublings as a fori_loop: 1 traced double instead of c
            carry = jax.lax.fori_loop(0, c, lambda _, v: double(v), carry)
        # restore the explicit trailing batch dim the scan sliced away
        carry = add(carry, type(window_sums)(*(a[..., None] for a in wk)))
        return carry, None

    # scan from window K-2 down to 0
    rev = tuple(a[::-1] for a in ws)
    acc, _ = jax.lax.scan(body, acc, rev)
    return acc
