"""Benchmark driver: BLS12-377 Pippenger MSM on one TPU chip.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}.

Baseline: the reference WASM implementation's published 2^16-point BLS12-377
MSM at 122 ms on a 16-thread laptop (`BASELINE.md`, doc/zprize23.md:119-124).
Methodology mirrors the reference harness (`scripts/msm-weierstrass.ts:20-48`):
warmup runs, then median of timed runs, fixed points, fresh scalars per run.
"""

import json
import os
import statistics
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.parallel.api import Weierstrass
from msm_zprize_tpu.utils.sync import sync

BASELINE_MS = 122.0  # reference: BLS12-377 2^16 multi-threaded WASM
LOG_N = int(os.environ.get("BENCH_LOG_N", "16"))
N = 1 << LOG_N
# reference discipline (`scripts/msm-weierstrass.ts:27-48`): 5 warmups,
# 10 timed runs, median +- stddev, fresh scalars per run
WARMUP = int(os.environ.get("BENCH_WARMUP", "5"))
RUNS = int(os.environ.get("BENCH_RUNS", "10"))
R_INNER = int(os.environ.get("BENCH_R_INNER", "8"))


def main():
    import jax.numpy as jnp

    dev = jax.devices()[0]
    curve = Weierstrass.create(BLS12_377)

    from msm_zprize_tpu.utils.point_cache import cached_random_points

    t0 = time.time()
    points = cached_random_points(curve, N, seed=1)
    jax.block_until_ready(points)
    sys.stderr.write(f"[bench] random points ({N}): {time.time() - t0:.1f}s\n")

    # Fresh scalars per run (reference methodology), device-RESIDENT before
    # the timer starts. TWO measurements, both reported:
    #   * single-dispatch LATENCY — one MSM per dispatch, wall-clock incl.
    #     the axon tunnel's RPC roundtrip. The headline JSON metric.
    #   * amortized THROUGHPUT — R_INNER MSMs over R_INNER different scalar
    #     sets in ONE dispatch via lax.scan (sequential, no overlap),
    #     divided by R_INNER; amortizes the per-dispatch roundtrip.
    from msm_zprize_tpu.curves.weierstrass import AffinePoints
    from msm_zprize_tpu.msm.batched_affine import msm_batched_affine

    def stack_scalars(seed0):
        sets = [curve.random_scalars(N, seed=seed0 + i) for i in range(R_INNER)]
        return jax.device_put(jnp.stack(sets, axis=0), dev)

    MODE = os.environ.get("BENCH_MODE", "projective")

    def fn_one(s, px, py, pinf):
        return tuple(
            msm_batched_affine(
                curve.ops, curve.scalar, s, AffinePoints(px, py, pinf),
                None, safe=False, mode=MODE,
            )
        )

    def fn_many(scal_stack, px, py, pinf):
        def body(_, s):
            res = msm_batched_affine(
                curve.ops, curve.scalar, s, AffinePoints(px, py, pinf),
                None, safe=False, mode=MODE,
            )
            return None, tuple(res)

        _, outs = jax.lax.scan(body, None, scal_stack)
        return outs

    batches = [stack_scalars(100 * i) for i in range(WARMUP + RUNS + 1)]
    sync([b[:1, :1, :1] for b in batches])

    # trace/lower once per (shape, mode) EVER: jax.export artifacts on disk
    # skip retracing in later processes (utils/aot_cache.py)
    from msm_zprize_tpu.utils.aot_cache import exported_fn

    t0 = time.time()
    ex_args_one = (batches[0][0], points.x, points.y, points.inf)
    ex_args_many = (batches[0], points.x, points.y, points.inf)
    msm_one = exported_fn(
        f"msm1_{curve.label}_{LOG_N}_{MODE}", fn_one, ex_args_one, verbose=True
    )
    msm_many = exported_fn(
        f"msm{R_INNER}_{curve.label}_{LOG_N}_{MODE}", fn_many, ex_args_many,
        verbose=True,
    )
    sys.stderr.write(f"[bench] program build (trace or AOT load): {time.time() - t0:.1f}s\n")

    # bare dispatch+RPC roundtrip of a PRE-COMPILED trivial program (jit the
    # function ONCE: re-jitting a fresh lambda per call measures retracing,
    # ~350 ms, not the tunnel)
    tiny = jax.jit(lambda a: a.sum())
    sync(tiny(batches[0][:1, :1, :1]))
    rts = []
    for _ in range(5):
        t0 = time.time()
        sync(tiny(batches[0][:1, :1, :1]))
        rts.append(time.time() - t0)
    rpc_ms = sorted(rts)[2] * 1e3
    sys.stderr.write(f"[bench] RPC roundtrip (pre-compiled dispatch): {rpc_ms:.1f} ms\n")

    def run_one(batch):
        t0 = time.time()
        outs = msm_one(batch[0], points.x, points.y, points.inf)
        sync(tuple(a[:1, :1] for a in outs))
        return time.time() - t0

    def run_many(batch):
        t0 = time.time()
        outs = msm_many(batch, points.x, points.y, points.inf)
        sync(tuple(a[:, :1, :1] for a in outs))
        return (time.time() - t0) / R_INNER

    t0 = time.time()
    run_one(batches[0])
    run_many(batches[0])  # compile
    sys.stderr.write(f"[bench] first run (compile): {time.time() - t0:.1f}s\n")
    for i in range(WARMUP):
        run_one(batches[1 + i])
        run_many(batches[1 + i])
    times, thrpt = [], []
    for i in range(RUNS):
        dt1 = run_one(batches[1 + WARMUP + i])
        dtm = run_many(batches[1 + WARMUP + i])
        times.append(dt1 * 1e3)
        thrpt.append(dtm * 1e3)
        sys.stderr.write(
            f"[bench] run {i}: {dt1 * 1e3:.1f} ms single-dispatch latency; "
            f"{dtm * 1e3:.1f} ms/msm amortized ({R_INNER} msms/dispatch)\n"
        )
    med_thr = statistics.median(thrpt)
    sd_thr = statistics.stdev(thrpt) if len(thrpt) > 1 else 0.0
    sys.stderr.write(
        f"[bench] amortized throughput: {med_thr:.1f} +- {sd_thr:.1f} ms/msm "
        f"(median +- stddev of {RUNS}; vs_baseline {BASELINE_MS / med_thr:.3f}); "
        f"derived per-dispatch "
        f"overhead {(statistics.median(times) - med_thr) * R_INNER / (R_INNER - 1):.1f} ms "
        f"vs measured RPC {rpc_ms:.1f} ms\n"
    )

    # correctness spot check at small N against the bigint oracle
    import random as _r

    from msm_zprize_tpu.bigint.msm import msm as msm_oracle

    rng = _r.Random(7)
    A, C = curve.oracle_affine, curve.oracle_projective
    pts_s = [A.random(rng) for _ in range(8)]
    scs_s = [rng.randrange(BLS12_377.order) for _ in range(8)]
    got = curve.msm_bigint(scs_s, pts_s)
    want = C.to_affine(msm_oracle(C, scs_s, [C.from_affine(p) for p in pts_s], 253))
    assert got == want, "MSM correctness check FAILED"
    sys.stderr.write("[bench] correctness check vs oracle: OK\n")

    med = statistics.median(times)
    sd = statistics.stdev(times) if len(times) > 1 else 0.0
    sys.stderr.write(
        f"[bench] single-dispatch latency: {med:.1f} +- {sd:.1f} ms "
        f"(median +- stddev of {RUNS} runs after {WARMUP} warmups)\n"
    )
    print(
        json.dumps(
            {
                "metric": f"bls12-377 msm 2^{LOG_N} latency ({dev.device_kind})",
                "value": round(med, 2),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / med, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
