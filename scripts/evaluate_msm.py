"""Window-size sweep — analog of `scripts/evaluate-msm-377.ts:20-60`:
times the MSM at several window sizes c around the tuned default and prints
the best, to (re)derive the `window_size` table for the current hardware.

Usage: python scripts/evaluate_msm.py [curve] [logN] [--cmin C] [--cmax C]
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
    ap.add_argument("curve", nargs="?", default="bls12-377",
                    choices=["bls12-377", "bls12-381", "pallas", "ed-on-bls12-377"])
    ap.add_argument("logN", nargs="?", type=int, default=14)
    ap.add_argument("--cmin", type=int, default=None)
    ap.add_argument("--cmax", type=int, default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from msm_zprize_tpu.curves.params import (
        BLS12_377, BLS12_381, ED_ON_BLS12_377, PALLAS,
    )
    from msm_zprize_tpu.msm.common import window_size
    from msm_zprize_tpu.parallel.api import TwistedEdwards, Weierstrass

    N = 1 << args.logN
    if args.curve == "ed-on-bls12-377":
        curve = TwistedEdwards.create(ED_ON_BLS12_377)
        kind = "basic"
    else:
        params = {"bls12-377": BLS12_377, "bls12-381": BLS12_381, "pallas": PALLAS}[args.curve]
        curve = Weierstrass.create(params)
        kind = "batched-affine"

    c_default = window_size(kind, args.logN)
    cmin = args.cmin or max(4, c_default - 2)
    cmax = args.cmax or c_default + 2

    from msm_zprize_tpu.utils.sync import sync

    dev = jax.devices()[0]
    points = curve.random_points_fast(N, seed=1)
    jax.block_until_ready(points)
    # device-resident scalar sets; sync() readback (the axon tunnel returns
    # from block_until_ready without waiting) — same method as bench.py
    scalar_sets = [
        jax.device_put(curve.random_scalars(N, seed=10 + r), dev)
        for r in range(args.runs + 1)
    ]
    sync([s[:1, :1] for s in scalar_sets])

    best = (None, float("inf"))
    for c in range(cmin, cmax + 1):
        t0 = time.time()
        sync(curve.msm(scalar_sets[0], points, c=c))  # compile + warmup
        sys.stderr.write(f"[c={c}] compile+1st {time.time()-t0:.1f}s\n")
        ts = []
        for r in range(args.runs):
            t0 = time.time()
            sync(curve.msm(scalar_sets[1 + r], points, c=c))
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        star = " *default" if c == c_default else ""
        print(f"c={c:2d}: {med*1e3:9.1f} ms{star}", flush=True)
        if med < best[1]:
            best = (c, med)
    print(f"best: c={best[0]} ({best[1]*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
