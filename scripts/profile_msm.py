"""Phase-level TPU profiling for the flagship MSM (dev tool).

Times: montmul throughput, random point generation, each MSM phase
(prep/accumulate/reduce/horner) separately, and the full pipeline, at a
given logN. Usage: python scripts/profile_msm.py [logN] [--mode affine|projective]
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


def _sync(tree):
    """device_get a tiny reduction of each leaf: forces completion even on
    backends where block_until_ready is a no-op (axon), without paying a
    large-array transfer."""
    leaves = jax.tree_util.tree_leaves(tree)
    jax.device_get([jnp.sum(a.ravel()[:1]) for a in leaves])
    return tree


def t(label, fn, *args, n=3, **kw):
    t0 = time.time()
    out = _sync(fn(*args, **kw))
    compile_s = time.time() - t0
    times = []
    for _ in range(n):
        t0 = time.time()
        out = _sync(fn(*args, **kw))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{label:42s} compile+1st {compile_s*1e3:9.1f} ms   best {best*1e3:9.1f} ms", flush=True)
    return out, best


def main():
    logN = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    mode = "affine"
    if "--mode" in sys.argv:
        mode = sys.argv[sys.argv.index("--mode") + 1]
    N = 1 << logN
    print(f"device: {jax.devices()[0].device_kind}, N=2^{logN}, mode={mode}", flush=True)

    from msm_zprize_tpu.curves.params import BLS12_377
    from msm_zprize_tpu.msm import batched_affine as BA
    from msm_zprize_tpu.msm.common import window_size
    from msm_zprize_tpu.parallel.api import Weierstrass

    curve = Weierstrass.create(BLS12_377)
    W, S = curve.ops, curve.scalar
    F = W.F

    # --- montmul throughput ---
    B = 1 << 19
    x = jnp.ones((F.n, B), dtype=jnp.int32)
    _, dt = t(f"montmul batch 2^19 ({F.n} limbs)", jax.jit(F.montmul), x, x)
    print(f"  -> {dt / B * 1e9:8.2f} ns/mul   {B / dt / 1e9:6.2f} Gmul/s", flush=True)

    _, dt = t("batch_inverse 2^16", jax.jit(F.batch_inverse), x[:, : 1 << 16])
    print(f"  -> {dt / (1<<16) * 1e9:8.2f} ns/inv", flush=True)

    # --- inputs ---
    t0 = time.time()
    points = curve.random_points_fast(N, seed=1)
    jax.block_until_ready(points)
    print(f"random_points_fast({N}): {time.time()-t0:.1f} s", flush=True)
    scalars = curve.random_scalars(N, seed=2)

    c = window_size("batched-affine", logN)
    print(f"window c={c}", flush=True)

    # --- phases ---
    prep = jax.jit(lambda s, p: BA.glv_prep(W, S, s, p, c)[:3])
    (pts2, mags, signs), _ = t("prep (GLV decompose + slice)", prep, scalars, points)

    if mode == "affine":
        acc = jax.jit(lambda s, p: BA.accumulate_batched_affine(W, S, s, p, c, False))
        (sums, empty), _ = t("accumulate (batched-affine)", acc, scalars, points)
        fin = jax.jit(lambda su, em: BA.finalize_affine_buckets(W, su, em, c))
        _, _ = t("reduce+horner", fin, sums, empty)
    else:
        acc = jax.jit(lambda s, p: BA.accumulate_glv_projective(W, S, s, p, c))
        (sums, empty), _ = t("accumulate (projective)", acc, scalars, points)
        fin = jax.jit(lambda su: BA.finalize_projective_buckets(W, su, c))
        _, _ = t("reduce+horner", fin, sums)

    full = jax.jit(
        lambda s, px, py, pinf: BA.msm_batched_affine(
            W, S, s, type(points)(px, py, pinf), c=c, safe=False, mode=mode
        )
    )
    _, dt = t("FULL msm", full, scalars, points.x, points.y, points.inf)
    print(f"TOTAL best: {dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
