"""Microbenchmark of the fused Pallas curve kernels on the real TPU.

Usage: MSM_TPU_SUBLANES=16 python scripts/kernel_bench.py [log2_lanes] [chain]

Reports Mosaic+XLA compile time and steady-state ns/op per lane for
proj_add / proj_add_mixed / proj_double, plus a correctness check vs the
bigint oracle on a handful of lanes.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

from msm_zprize_tpu.bigint.weierstrass import ProjectiveCurve
from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.curves.weierstrass import ProjectivePoints, WeierstrassOps

LOG_B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
CHAIN = int(sys.argv[2]) if len(sys.argv) > 2 else 16
B = 1 << LOG_B


def main():
    W = WeierstrassOps(BLS12_377)
    C = ProjectiveCurve(BLS12_377)
    rng = random.Random(0)
    n_seed = 8
    pts = [C.random(rng) for _ in range(n_seed)]
    qts = [C.random(rng) for _ in range(n_seed)]
    P0 = W.pack_projective(pts)
    Q0 = W.pack_projective(qts)
    reps = B // n_seed
    P = ProjectivePoints(*(jnp.tile(a, (1, reps)) for a in P0))
    Q = ProjectivePoints(*(jnp.tile(a, (1, reps)) for a in Q0))

    from msm_zprize_tpu.curves.pallas_curve import BLOCK, SUBLANES

    print(f"[kbench] B=2^{LOG_B} SUBLANES={SUBLANES} chain={CHAIN}")

    def bench(name, step, args):
        @jax.jit
        def chain_fn(*a):
            acc = ProjectivePoints(*a[:3])
            rest = a[3:]
            for _ in range(CHAIN):
                acc = step(acc, *rest)
            return tuple(acc)

        from msm_zprize_tpu.utils.sync import sync

        t0 = time.time()
        out = chain_fn(*args)
        sync(out[0][:1, :1])  # device_get: the tunneled backend's
        # block_until_ready returns without waiting
        t_compile = time.time() - t0
        # steady state: median of 5 (subtract the measured RPC roundtrip)
        rt = []
        for _ in range(3):
            t0 = time.time()
            sync(out[0][:1, :1])
            rt.append(time.time() - t0)
        roundtrip = sorted(rt)[1]
        times = []
        for _ in range(5):
            t0 = time.time()
            out = chain_fn(*args)
            sync(out[0][:1, :1])
            times.append(time.time() - t0)
        times.sort()
        t = max(times[2] - roundtrip, 1e-9)
        per_op = t / CHAIN
        print(
            f"[kbench] {name}: compile {t_compile:.1f}s, "
            f"{t*1e3:.2f} ms/chain, {per_op*1e6:.1f} us/call, "
            f"{per_op/B*1e9:.2f} ns/lane-op"
        )
        return out

    out = bench(
        "proj_add",
        lambda acc, qx, qy, qz: W.proj_add(acc, ProjectivePoints(qx, qy, qz)),
        tuple(P) + tuple(Q),
    )
    # correctness on the first n_seed lanes
    got = W.unpack_projective(ProjectivePoints(*(a[:, :n_seed] for a in out)))
    for g, p, q in zip(got, pts, qts):
        want = p
        for _ in range(CHAIN):
            want = C.add(want, q)
        assert C.eq(g, want), "proj_add chain mismatch"
    print("[kbench] proj_add correctness: OK")

    bench("proj_dbl", lambda acc: W.proj_double(acc), tuple(P))

    from msm_zprize_tpu.curves.weierstrass import AffinePoints

    A0 = W.pack_affine([C.to_affine(q) for q in qts])
    A = AffinePoints(*(jnp.tile(a, (1, reps) if a.ndim > 1 else reps) for a in A0))
    out = bench(
        "proj_madd",
        lambda acc, ax, ay, ai: W.proj_add_affine(acc, AffinePoints(ax, ay, ai)),
        tuple(P) + tuple(A),
    )
    got = W.unpack_projective(ProjectivePoints(*(a[:, :n_seed] for a in out)))
    for g, p, q in zip(got, pts, qts):
        want = p
        for _ in range(CHAIN):
            want = C.add(want, q)
        assert C.eq(g, want), "proj_madd chain mismatch"
    print("[kbench] proj_madd correctness: OK")

    if "--fma51" in sys.argv:
        fma51_ab()


def fma51_ab():
    """A/B: Pallas-curve proj_add with NATIVE w=12 storage vs 51x5 pair
    storage (codec decode/encode at the kernel boundary) — the committed
    comparison BASELINE config #5 asks for. Same formula, same digit
    engine; the delta is the 51x5 representation's codec cost."""
    import random

    from msm_zprize_tpu.curves.params import PALLAS
    from msm_zprize_tpu.curves.weierstrass51 import Fma51WeierstrassOps
    from msm_zprize_tpu.utils.sync import sync

    Wn = WeierstrassOps(PALLAS)
    W51 = Fma51WeierstrassOps(PALLAS)
    C = ProjectiveCurve(PALLAS)
    rng = random.Random(1)
    n_seed = 8
    pts = [C.random(rng) for _ in range(n_seed)]
    qts = [C.random(rng) for _ in range(n_seed)]
    reps = B // n_seed

    def run(label, ops, pack):
        P = ProjectivePoints(*(jnp.tile(a, (1, reps)) for a in pack(pts)))
        Q = ProjectivePoints(*(jnp.tile(a, (1, reps)) for a in pack(qts)))

        @jax.jit
        def chain_fn(*a):
            acc = ProjectivePoints(*a[:3])
            q = ProjectivePoints(*a[3:])
            for _ in range(CHAIN):
                acc = ops.proj_add(acc, q)
            return tuple(acc)

        t0 = time.time()
        out = chain_fn(*P, *Q)
        sync(out[0][:1, :1])
        t_compile = time.time() - t0
        times = []
        for _ in range(5):
            t0 = time.time()
            out = chain_fn(*P, *Q)
            sync(out[0][:1, :1])
            times.append(time.time() - t0)
        times.sort()
        per = times[2] / CHAIN / B * 1e9
        print(f"[kbench] {label}: compile {t_compile:.1f}s, "
              f"{per:.2f} ns/lane-op")
        return out

    def pack_native(ps):
        return Wn.pack_projective(ps)

    def pack51(ps):
        cd = W51.codec
        R = W51.R
        p = W51.p
        return ProjectivePoints(
            *(jnp.asarray(cd.pack([pt[i] * R % p for pt in ps])) for i in range(3))
        )

    out_n = run("pallas-curve proj_add (native w=12)", Wn, pack_native)
    out_5 = run("pallas-curve proj_add (51x5 pairs) ", W51, pack51)
    got = W51.unpack_projective(ProjectivePoints(*(a[:, :8] for a in out_5)))
    for g, p0, q in zip(got, pts, qts):
        want = p0
        for _ in range(CHAIN):
            want = C.add(want, q)
        assert C.eq(g, want), "51x5 chain mismatch"
    print("[kbench] 51x5 correctness: OK")


if __name__ == "__main__":
    main()
