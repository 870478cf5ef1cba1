"""Scaling-efficiency harness: sharded MSM wall-clock vs mesh size.

BASELINE asks for 1-chip / 1-host / N-host efficiency >= 80% of linear.
Real multi-chip hardware is not available in this environment, so the
harness measures the FULL sharded program (shard_map + all_to_all bucket
redistribution + per-shard reduction, `parallel/mesh.py`) on a virtual
CPU device mesh: relative scaling of the collective pipeline is
meaningful there (identical program structure; absolute times are not
TPU times). On a real pod the same script runs unchanged.

Run (CPU mesh):  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
                   python scripts/scaling_bench.py bls12-377 14
Writes a table + efficiency column; commit the output as an artifact.
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_scaling"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve", nargs="?", default="bls12-377")
    ap.add_argument("logN", nargs="?", type=int, default=13)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--devices", type=str, default=None,
                    help="comma list of mesh sizes (default: 1,2,4,.. up to all)")
    args = ap.parse_args()

    from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, PALLAS
    from msm_zprize_tpu.parallel.api import Weierstrass
    from msm_zprize_tpu.parallel.mesh import make_mesh
    from msm_zprize_tpu.utils.sync import sync

    params = {"bls12-377": BLS12_377, "bls12-381": BLS12_381, "pallas": PALLAS}[args.curve]
    curve = Weierstrass.create(params)
    N = 1 << args.logN

    n_avail = len(jax.devices())
    if args.devices:
        sizes = [int(s) for s in args.devices.split(",")]
    else:
        sizes = []
        d = 1
        while d <= n_avail:
            sizes.append(d)
            d *= 2

    print(f"# scaling: {args.curve} 2^{args.logN}, backend={jax.default_backend()}, "
          f"{n_avail} devices", flush=True)

    points = curve.random_points_fast(N, seed=1)
    jax.block_until_ready(points)
    scalar_sets = [curve.random_scalars(N, seed=3 + r) for r in range(args.runs + 1)]

    base = None
    rows = []
    for d in sizes:
        mesh = make_mesh(d)
        t0 = time.time()
        sync(curve.msm_unsafe(scalar_sets[0], points, mesh=mesh, mode="projective"))
        compile_s = time.time() - t0
        ts = []
        for r in range(args.runs):
            t0 = time.time()
            sync(curve.msm_unsafe(scalar_sets[1 + r], points, mesh=mesh, mode="projective"))
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        if base is None:
            base = med
        eff = base / (med * d)
        rows.append((d, med, eff))
        print(f"devices={d:2d}: {med*1e3:9.1f} ms   speedup={base/med:5.2f}x "
              f"efficiency={eff*100:5.1f}%   (compile+1st {compile_s:.1f}s)",
              flush=True)

    # correctness spot-check on the largest mesh
    import random

    from msm_zprize_tpu.bigint.msm import msm as msm_oracle

    rng = random.Random(5)
    n_small = 2 * sizes[-1]
    pts = [curve.oracle_affine.random(rng) for _ in range(n_small)]
    scs = [rng.randrange(params.order) for _ in range(n_small)]
    mesh = make_mesh(sizes[-1])
    res = curve.msm(curve.scalars_from_ints(scs), curve.points_from_ints(pts),
                    c=6, mesh=mesh)
    got = curve.result_to_int(res)
    C = curve.oracle_projective
    want = C.to_affine(msm_oracle(C, scs, [C.from_affine(p) for p in pts], 253))
    assert got == want, "sharded MSM mismatch vs oracle"
    print("oracle cross-check (max mesh): OK", flush=True)


if __name__ == "__main__":
    main()
