"""CLI MSM runner/benchmark — analog of the reference's run scripts
(`scripts/run-msm-{pallas,377,ed-377,pallas-projective}.ts`,
`scripts/msm-weierstrass.ts:20-48`, `msm-twisted-edwards.ts`).

Usage:
    python scripts/run_msm.py <curve> <logN> [--devices D] [--mode affine|projective]
                              [--c C] [--runs R] [--warmup W] [--evaluate]

curve: bls12-377 | bls12-381 | pallas | ed-on-bls12-377
Benchmark method mirrors the reference: warmup runs, then median +- stddev of
timed runs with fixed points and fresh scalars per run; results are
cross-checked against the bigint oracle for logN < 14
(`scripts/msm-weierstrass.ts:100-110`).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve", choices=["bls12-377", "bls12-381", "pallas", "ed-on-bls12-377"])
    ap.add_argument("logN", type=int)
    ap.add_argument("--devices", type=int, default=1, help="mesh size (1 = single chip)")
    ap.add_argument("--mode", choices=["affine", "projective", "halving", "fma51", "packed"], default=None)
    ap.add_argument("--c", type=int, default=None, help="window size override")
    ap.add_argument("--runs", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--evaluate", action="store_true", help="always cross-check vs oracle")
    ap.add_argument("--amortize", type=int, default=0, metavar="R",
                    help="ALSO time R MSMs per dispatch (lax.scan over R "
                         "scalar sets; amortizes the tunnel RPC roundtrip, "
                         "like bench.py's dual metric)")
    ap.add_argument("--verbose", action="store_true",
                    help="print a per-phase timing + mul-count table "
                         "(single-chip Weierstrass projective pipeline)")
    args = ap.parse_args()

    from msm_zprize_tpu.bigint.msm import msm as msm_oracle
    from msm_zprize_tpu.curves.params import (
        BLS12_377, BLS12_381, ED_ON_BLS12_377, PALLAS,
    )
    from msm_zprize_tpu.parallel.api import TwistedEdwards, Weierstrass
    from msm_zprize_tpu.parallel.mesh import make_mesh

    N = 1 << args.logN
    mesh = make_mesh(args.devices) if args.devices > 1 else None

    if args.curve == "ed-on-bls12-377":
        curve = TwistedEdwards.create(ED_ON_BLS12_377)
        msm_kwargs = dict(c=args.c, mesh=mesh)
    else:
        params = {"bls12-377": BLS12_377, "bls12-381": BLS12_381, "pallas": PALLAS}[args.curve]
        curve = Weierstrass.create(params)
        msm_kwargs = dict(c=args.c, mesh=mesh, mode=args.mode)

    print(f"[{args.curve}] N=2^{args.logN}, devices={args.devices}", file=sys.stderr)
    from msm_zprize_tpu.utils.point_cache import cached_random_points

    t0 = time.time()
    points = cached_random_points(curve, N, seed=1)
    jax.block_until_ready(points)
    print(f"random points: {time.time()-t0:.1f}s", file=sys.stderr)

    from msm_zprize_tpu.utils.sync import sync

    # device-resident fresh scalars per run; sync() readback (the axon
    # tunnel returns from block_until_ready without waiting)
    dev = jax.devices()[0]
    scalar_sets = [
        jax.device_put(curve.random_scalars(N, seed=run), dev)
        for run in range(args.warmup + args.runs)
    ]
    sync([s[:1, :1] for s in scalar_sets])

    times = []
    result = None
    for run in range(args.warmup + args.runs):
        scalars = scalar_sets[run]
        t0 = time.time()
        result = curve.msm(scalars, points, **msm_kwargs)
        sync(result)
        dt = time.time() - t0
        if run >= args.warmup:
            times.append(dt)
        print(f"  run {run}: {dt*1e3:.1f} ms", file=sys.stderr, flush=True)
    med = statistics.median(times)
    std = statistics.pstdev(times)
    print(f"msm {args.curve} 2^{args.logN}: {med*1e3:.1f} +- {std*1e3:.1f} ms "
          f"({med/N*1e9:.0f} ns/point)")

    if args.amortize and mesh is None:
        # amortized THROUGHPUT: R MSMs over R scalar sets in ONE dispatch
        # (sequential lax.scan — no overlap), divided by R; amortizes the
        # per-dispatch tunnel roundtrip like bench.py's dual metric
        import jax.numpy as jnp

        R = args.amortize
        if args.curve == "ed-on-bls12-377":
            from msm_zprize_tpu.curves.edwards import ExtPoints
            from msm_zprize_tpu.msm.basic import msm_basic_edwards

            def one(s, pts):
                return tuple(
                    msm_basic_edwards(
                        curve.ops, s, ExtPoints(*pts), curve.scalar.bits, c=args.c
                    )
                )
        else:
            from msm_zprize_tpu.curves.weierstrass import AffinePoints
            from msm_zprize_tpu.msm.batched_affine import msm_batched_affine

            def one(s, pts):
                return tuple(
                    msm_batched_affine(
                        curve.ops, curve.scalar, s, AffinePoints(*pts),
                        args.c, safe=False,
                        mode=args.mode or "projective",
                    )
                )

        def fn_many(stack, *pts):
            def body(_, s):
                return None, one(s, pts)

            _, outs = jax.lax.scan(body, None, stack)
            return outs

        jf = jax.jit(fn_many)
        n_batches = args.warmup + args.runs
        stacks = [
            jax.device_put(
                jnp.stack(
                    [curve.random_scalars(N, seed=1000 + r * R + i) for i in range(R)],
                    axis=0,
                ),
                dev,
            )
            for r in range(n_batches)
        ]
        sync([s[:1, :1, :1] for s in stacks])
        amor = []
        for run in range(n_batches):
            t0 = time.time()
            outs = jf(stacks[run], *points)
            sync(tuple(a[:, :1, :1] for a in outs))
            dt = (time.time() - t0) / R
            if run >= args.warmup:
                amor.append(dt)
            print(f"  amortized run {run}: {dt*1e3:.1f} ms/msm ({R}/dispatch)",
                  file=sys.stderr, flush=True)
        meda = statistics.median(amor)
        stda = statistics.pstdev(amor)
        print(f"msm {args.curve} 2^{args.logN} amortized ({R}/dispatch): "
              f"{meda*1e3:.1f} +- {stda*1e3:.1f} ms/msm ({meda/N*1e9:.0f} ns/point)")

    if args.verbose and args.curve != "ed-on-bls12-377" and mesh is None:
        from msm_zprize_tpu.utils.phases import print_phase_table, profile_msm

        rows = profile_msm(curve, scalar_sets[0], points, c=args.c)
        print_phase_table(rows, N)

    if args.evaluate or args.logN < 14:
        # bit-exact cross-check vs the bigint oracle on the last run's inputs
        scs = (curve.scalar.unpack if hasattr(curve.scalar, "unpack") else None)(
            __import__("numpy").asarray(scalars)
        )
        if args.curve == "ed-on-bls12-377":
            pts = curve.ops.unpack(points)
            C = curve.oracle
            want = C.to_affine(msm_oracle(C, scs, pts, curve.scalar.bits))
            got = curve.result_to_int(result)
        else:
            pts_a = curve.ops.unpack_affine(points)
            C = curve.oracle_projective
            want = C.to_affine(
                msm_oracle(C, scs, [C.from_affine(p) for p in pts_a], curve.scalar.bits)
            )
            got = curve.result_to_int(result)
        assert got == want, "MSM mismatch vs bigint oracle"
        print("oracle cross-check: OK", file=sys.stderr)


if __name__ == "__main__":
    main()
