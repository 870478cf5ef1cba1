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
WARMUP = 1
RUNS = 3
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
    # the timer starts. Each timed dispatch runs R_INNER MSMs over R_INNER
    # DIFFERENT scalar sets via one lax.scan: the axon tunnel's RPC
    # roundtrip (~25 ms, measured by a trivial scalar sync below) is paid
    # once per dispatch and amortized 1/R_INNER into the reported number —
    # a conservative upper bound on per-MSM device time (no subtraction).
    from msm_zprize_tpu.msm.batched_affine import msm_batched_affine

    def stack_scalars(seed0):
        sets = [curve.random_scalars(N, seed=seed0 + i) for i in range(R_INNER)]
        return jax.device_put(jnp.stack(sets, axis=0), dev)

    @jax.jit
    def msm_many(scal_stack, px, py, pinf):
        from msm_zprize_tpu.curves.weierstrass import AffinePoints

        def body(_, s):
            res = msm_batched_affine(
                curve.ops, curve.scalar, s, AffinePoints(px, py, pinf),
                None, safe=False, mode="projective",
            )
            return None, tuple(res)

        _, outs = jax.lax.scan(body, None, scal_stack)
        return outs

    batches = [stack_scalars(100 * i) for i in range(WARMUP + RUNS + 1)]
    sync([b[:1, :1, :1] for b in batches])

    # measure the bare RPC roundtrip for the log (not subtracted)
    tiny = jax.jit(lambda a: a.sum())(batches[0][:1, :1, :1])
    sync(tiny)
    rts = []
    for _ in range(5):
        t0 = time.time()
        sync(jax.jit(lambda a: a.sum())(batches[0][:1, :1, :1]))
        rts.append(time.time() - t0)
    sys.stderr.write(f"[bench] RPC roundtrip: {sorted(rts)[2]*1e3:.1f} ms\n")

    def run(batch):
        t0 = time.time()
        outs = msm_many(batch, points.x, points.y, points.inf)
        sync(tuple(a[:, :1, :1] for a in outs))
        return (time.time() - t0) / R_INNER, outs

    t0 = time.time()
    run(batches[0])  # compile
    sys.stderr.write(f"[bench] first run (compile): {time.time() - t0:.1f}s\n")
    for i in range(WARMUP):
        run(batches[1 + i])
    times = []
    for i in range(RUNS):
        dt, outs = run(batches[1 + WARMUP + i])
        times.append(dt * 1e3)
        sys.stderr.write(
            f"[bench] run {i}: {dt * 1e3:.1f} ms/msm ({R_INNER} msms/dispatch)\n"
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
