"""Gather cost vs row count and index pattern at MSM shapes (round 4).

Motivation: accum_probe shows the composed slot gather at ~40 ms of the
97 ms accumulation phase (2^16, c=12: 2.88M indices x 64 int32 rows =
737 MB).  Questions:
  1. does gather time scale with ROW count (then dense-packing the
     coordinate storage halves it)?
  2. do duplicate indices on invalid slots (all 0) beat clipped
     near-random ones?
  3. index count scaling (fixed overhead vs volume).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 131072
IDX = 128 * 11 * 2048  # M * K * L at 2^16 c=12

rng = np.random.default_rng(0)
idx_rand = jnp.asarray(rng.integers(0, B, (IDX,), dtype=np.int32))
# half valid / half pointing at 0 (dummy column)
half = rng.integers(0, B, (IDX,), dtype=np.int32)
half[rng.random(IDX) < 0.5] = 0
idx_half0 = jnp.asarray(half)
# sorted-ish (bucket-local) indices
idx_sorted = jnp.asarray(np.sort(rng.integers(0, B, (IDX,), dtype=np.int32)))


def timed(name, fn, *args, reps=3, R=4):
    jf = jax.jit(fn, static_argnames=("R",))
    t0 = time.time()
    jax.device_get(jf(*args, R=R))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args, R=R))
        ts.append(time.time() - t0)
    print(f"{name:44s} {min(ts)/R*1e3:9.1f} ms/op  (compile {tc:.0f}s)", flush=True)


def f_gather(rows):
    stacked = jnp.asarray(rng.integers(0, 4096, (rows, B), dtype=np.int32))

    def f(idx, R=1):
        acc = jnp.int32(0)
        for r in range(R):
            g = jnp.take(stacked, jnp.clip(idx + r, 0, B - 1), axis=-1)
            acc += g.sum(dtype=jnp.int32)
        return acc

    return f


for rows in (64, 32, 16, 8):
    timed(f"gather {rows} rows, {IDX>>20}M rand idx", f_gather(rows), idx_rand)
timed("gather 64 rows, half idx -> 0", f_gather(64), idx_half0)
timed("gather 64 rows, sorted idx", f_gather(64), idx_sorted)

# transposed layout: (B, rows) gather along axis 0
stackedT = jnp.asarray(rng.integers(0, 4096, (B, 64), dtype=np.int32))


def f_gatherT(idx, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        g = jnp.take(stackedT, jnp.clip(idx + r, 0, B - 1), axis=0)
        acc += g.sum(dtype=jnp.int32)
    return acc


timed("gather (B, 64) axis0, rand idx", f_gatherT, idx_rand)

# index-count scaling at 64 rows
for frac, label in ((2, "1/2"), (4, "1/4")):
    timed(
        f"gather 64 rows, {label} idx",
        f_gather(64),
        idx_rand[: IDX // frac],
    )
