"""End-to-end flagship MSM on the real TPU with per-phase timing.

Usage: python scripts/msm_tpu_probe.py [log_n] [c] [mode]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

from msm_zprize_tpu.bigint.msm import msm as msm_oracle
from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.parallel.api import Weierstrass
from msm_zprize_tpu.utils.sync import sync

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
C = int(sys.argv[2]) if len(sys.argv) > 2 else None
MODE = sys.argv[3] if len(sys.argv) > 3 else "projective"
N = 1 << LOG_N


def main():
    curve = Weierstrass.create(BLS12_377)
    t0 = time.time()
    points = curve.random_points_fast(N, seed=1)
    sync(points.inf[:1])
    print(f"[probe] random_points_fast({N}): {time.time()-t0:.1f}s", flush=True)

    scalars = curve.random_scalars(N, seed=7)
    t0 = time.time()
    res = curve.msm_unsafe(scalars, points, c=C, mode=MODE)
    out = sync(res)
    print(f"[probe] msm 2^{LOG_N} first (compile+run): {time.time()-t0:.1f}s", flush=True)

    times = []
    for i in range(5):
        scalars = curve.random_scalars(N, seed=100 + i)
        t0 = time.time()
        res = curve.msm_unsafe(scalars, points, c=C, mode=MODE)
        sync(res)
        times.append(time.time() - t0)
    times.sort()
    print(f"[probe] msm 2^{LOG_N} steady: {times[2]*1e3:.1f} ms (min {times[0]*1e3:.1f})", flush=True)

    # correctness spot-check: recompute same MSM at tiny N vs oracle
    rng = random.Random(3)
    A, Cp = curve.oracle_affine, curve.oracle_projective
    pts_s = [A.random(rng) for _ in range(16)]
    scs_s = [rng.randrange(BLS12_377.order) for _ in range(16)]
    got = curve.result_to_int(
        curve.msm_unsafe(
            curve.scalars_from_ints(scs_s), curve.points_from_ints(pts_s),
            mode=MODE,
        )
    )
    want = Cp.to_affine(
        msm_oracle(Cp, scs_s, [Cp.from_affine(p) for p in pts_s], 253)
    )
    assert got == want, "correctness FAILED"
    print("[probe] correctness vs oracle: OK", flush=True)


if __name__ == "__main__":
    main()
