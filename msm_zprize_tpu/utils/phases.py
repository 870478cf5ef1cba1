"""Per-phase MSM profiling + analytic multiply counts.

The analog of the reference's deferred per-phase logs and `multiplyCount`
(`src/msm-common.ts:192-230`, `src/wasm/multiply-montgomery.ts:50-54`,
printed like `msm-batched-affine.ts:262-269`). The whole MSM runs as ONE
XLA program, so phases cannot be timed from inside it; instead each phase
boundary is measured by jitting a PREFIX of the pipeline with a
scalar-reduced output and timing its steady-state run — phase cost = the
difference of consecutive prefixes (same method as the committed stage
benches). Multiply counts are analytic: the engine's shapes determine the
number of Montgomery muls each phase issues, the way the reference counts
them with a WASM global.

Entry point: `profile_msm(curve, scalars, points, c)` -> list of
PhaseRow(label, ms, mmuls, ns_per_mul). Used by `run_msm.py --verbose`.
"""

from __future__ import annotations

import time
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..curves.weierstrass import AffinePoints
from ..msm import engine
from ..msm.batched_affine import (
    accumulate_glv_projective,
    finalize_projective_buckets,
    glv_prep,
)
from ..msm.common import default_windows, window_size

__all__ = ["PhaseRow", "profile_msm", "print_phase_table"]


class PhaseRow(NamedTuple):
    label: str
    ms: float
    mmuls: float  # analytic Montgomery-mul count, millions

    @property
    def ns_per_mul(self) -> float:
        return self.ms * 1e6 / (self.mmuls * 1e6) if self.mmuls else 0.0


def _timed(fn, args, reps=3):
    from .sync import sync

    def red(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "sum")]
        return sum((l.sum(dtype=jnp.int32) for l in leaves), jnp.int32(0))

    jf = jax.jit(lambda *a: red(fn(*a)))
    sync(jf(*args))  # compile + 1st
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(jf(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def profile_msm(curve, scalars, points: AffinePoints, c: int | None = None,
                reps: int = 3) -> list[PhaseRow]:
    """Prefix-time the flagship projective pipeline on the current device.

    scalars: (n, N) device array; points: affine batch (N). Returns
    cumulative-to-incremental phase rows incl. analytic mul counts.
    """
    W, S = curve.ops, curve.scalar
    N = points.x.shape[-1]
    if c is None:
        c = window_size("batched-affine", max(N.bit_length() - 1, 1))
    K = default_windows(S.max_bits, c)
    L = 1 << (c - 1)
    B = 2 * N
    M = engine.slot_count(B, L)

    args = (scalars, points.x, points.y, points.inf)

    def p_prep(s, px, py, pinf):
        return glv_prep(W, S, s, AffinePoints(px, py, pinf), c)

    def p_accum(s, px, py, pinf):
        return accumulate_glv_projective(W, S, s, AffinePoints(px, py, pinf), c)

    def p_full(s, px, py, pinf):
        sums, _ = accumulate_glv_projective(W, S, s, AffinePoints(px, py, pinf), c)
        return finalize_projective_buckets(W, sums, c)

    # bare dispatch+RPC roundtrip (the axon tunnel costs ~25 ms per
    # dispatch); subtracted from the absolute prefix times so phase rows
    # reflect device time — deltas are unaffected either way
    rpc = _timed(lambda s, *a: s[:1, :1], args, reps)
    t_prep = max(_timed(p_prep, args, reps) - rpc, 0.0)
    t_accum = max(_timed(p_accum, args, reps) - rpc, t_prep)
    t_full = max(_timed(p_full, args, reps) - rpc, t_accum)

    # ---- analytic Montgomery-mul counts (static shapes, 1st round) -------
    slots = M * K * L
    m_prep = N / 1e6  # endomorphism: one mul per point
    m_l1 = 9 * (slots // 2) / 1e6  # unit-Z level-1 kernel
    m_tree = 12 * (slots // 2 - K * L) / 1e6  # remaining tree levels
    m_acc_add = 12 * K * L / 1e6  # round-accumulator add
    import math

    m_fold = 12 * (L // 2) * K * math.ceil(math.log2(max(L, 2))) / 1e6
    m_accum = m_l1 + m_tree + m_acc_add + m_fold
    c0 = max((c - 1) // 2, 1)
    block = 1 << c0
    D = L // block
    m_reduce = (12 + 12) * block * K * D / 1e6 + 12 * (D + 2 * c0) * K / 1e6
    m_horner = (K - 1) * (8 * c + 12) / 1e6

    return [
        PhaseRow("prep (decompose+endo+digits)", t_prep, m_prep),
        PhaseRow("bucket accumulation", t_accum - t_prep, m_accum),
        PhaseRow("reduce + horner", t_full - t_accum, m_reduce + m_horner),
        PhaseRow("TOTAL (prefix-timed)", t_full, m_prep + m_accum + m_reduce + m_horner),
    ]


def print_phase_table(rows: list[PhaseRow], n_points: int, out=None):
    import sys

    out = out or sys.stderr
    out.write(f"{'phase':34s} {'ms':>9s} {'Mmul':>8s} {'ns/mul':>8s}\n")
    for r in rows:
        out.write(
            f"{r.label:34s} {r.ms:9.1f} {r.mmuls:8.2f} {r.ns_per_mul:8.2f}\n"
        )
    total = rows[-1]
    out.write(
        f"{'':34s} {total.ms / n_points * 1e6:.0f} ns/point over {n_points} points\n"
    )
