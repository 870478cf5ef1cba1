"""Field-operation microbenchmarks — analog of the reference's
`scripts/field-benchmarks/field-benchmark.ts` (ns/op over a large batch of
muls; the reference runs 1e7 muls in a WASM loop).

Usage: python scripts/field_benchmark.py [curve] [--batch B] [--iters I]

Reports ns/op (amortized over the batch) for: montmul (active impl), add,
sub, reduce, batch inverse, sqrt, and the 51x5 float-limb track's montmul
(CPU/x64 research track).
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)  # compile + warmup
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curve", nargs="?", default="bls12-377",
                    choices=["bls12-377", "bls12-381", "pallas"])
    ap.add_argument("--batch", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from msm_zprize_tpu.bigint.field import random_fields
    from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, PALLAS
    from msm_zprize_tpu.fields.fp import make_field
    from msm_zprize_tpu.fields.sqrt import make_sqrt

    params = {"bls12-377": BLS12_377, "bls12-381": BLS12_381, "pallas": PALLAS}[args.curve]
    p = params.modulus
    F = make_field(p)
    B = args.batch
    import random
    rng = random.Random(0)
    xs = jnp.asarray(F.pack(random_fields(p, 256, rng) * (B // 256)))
    ys = jnp.asarray(F.pack(random_fields(p, 256, rng) * (B // 256)))

    print(f"[{args.curve}] p ~ 2^{p.bit_length()}, n={F.n} limbs x w={F.w} bits, "
          f"batch={B}, backend={jax.default_backend()}")

    mul = jax.jit(F.montmul)
    t = bench(mul, xs, ys, iters=args.iters)
    print(f"montmul:        {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    sq = jax.jit(F.montsquare)
    t = bench(sq, xs, iters=args.iters)
    print(f"montsquare:     {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    add = jax.jit(F.add)
    t = bench(add, xs, ys, iters=args.iters)
    print(f"add:            {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    sub = jax.jit(F.sub)
    t = bench(sub, xs, ys, iters=args.iters)
    print(f"sub:            {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    red = jax.jit(F.reduce)
    t = bench(red, xs, iters=args.iters)
    print(f"reduce:         {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    binv = jax.jit(F.batch_inverse)
    t = bench(binv, xs, iters=args.iters)
    print(f"batch_inverse:  {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)")

    S = make_sqrt(p)
    sq_in = jax.jit(lambda v: S.sqrt(F.montmul(v, v)))
    small = jnp.asarray(F.pack(random_fields(p, 256, rng) * 16))
    t = bench(sq_in, small, iters=args.iters)
    print(f"sqrt (B=4096):  {t/4096*1e9:8.2f} ns/op")

    if p < (1 << 255) - (1 << 206):
        from msm_zprize_tpu.fields.fma51 import make_fma51_field
        with jax.enable_x64(True):
            F51 = make_fma51_field(p)
            xs51 = F51.pack(random_fields(p, 256, rng) * (B // 256))
            ys51 = F51.pack(random_fields(p, 256, rng) * (B // 256))
            mul51 = jax.jit(F51.montmul)
            t = bench(mul51, xs51, ys51, iters=args.iters)
            print(f"montmul 51x5:   {t/B*1e9:8.2f} ns/op   ({B/t/1e6:8.1f} Mops/s)  [research track]")


if __name__ == "__main__":
    main()
