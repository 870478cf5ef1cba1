"""Round 2: gather/scatter patterns at MSM-realistic shapes, amortized.

Chains R repetitions of each pattern inside ONE jitted program (with a
data dependency so XLA cannot dedupe) and divides by R — removing the
~24 ms per-dispatch tunnel overhead from the measurement.
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

B = 1 << 17           # 2N at 2^16
K = 11
ROWS = 96             # projective X,Y,Z x 32 limbs
R = 4                 # amortization reps

rng = np.random.default_rng(0)
tab = jnp.asarray(rng.integers(0, 4096, (ROWS, B), dtype=np.int32))
idx_flat = jnp.asarray(rng.integers(0, B, (K * B,), dtype=np.int32))
idx_kb = idx_flat.reshape(K, B)
ids_small = jnp.asarray(rng.integers(0, 2048, (K, B), dtype=np.int32))


def timed(name, fn, *args, reps=3):
    jf = jax.jit(fn)
    jax.device_get(jf(*args))
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args))
        ts.append(time.time() - t0)
    best = (min(ts)) / R * 1e3
    print(f"{name:44s} {best:9.2f} ms/op", flush=True)


def chain(op):
    """Run op R times with a dependency chain through the index argument."""
    def fn(t, i):
        acc = jnp.int32(0)
        for r in range(R):
            out = op(t, (i + r) % t.shape[-1])
            acc = acc + out.sum(dtype=jnp.int32)
        return acc
    return fn


# 1. initial reorder: flat take of K*B columns from (ROWS, B)
timed(f"take flat {K}x{B} idx on (96,{B})",
      chain(lambda t, i: jnp.take(t, i, axis=1)), tab, idx_flat)

# 2. same via take_along_axis 3D broadcast (current engine _take)
def taa(t, i):
    t3 = t.reshape(ROWS, 1, B)
    i3 = jnp.broadcast_to(i.reshape(1, K, B), (ROWS, K, B))
    return jnp.take_along_axis(t3, i3, axis=-1)
timed("take_along_axis 3D broadcast (engine now)", chain(taa), tab, idx_kb)

# 3. per-level gather: (ROWS, K, W) table, (K, W') indices, flattened
def lvl_flat(t, i):
    # table (ROWS, K*B); index k*B + pos
    off = (jnp.arange(K, dtype=jnp.int32) * B)[:, None]
    return jnp.take(t, (i + off).reshape(-1), axis=1)
timed("per-level flat take (K fold into idx)", chain(lvl_flat), tab, idx_kb)

# 4. scatter-add bucket counts (current bucket_counts)
def scat(t, i):
    z = jnp.zeros((K, 2049), dtype=jnp.int32)
    ones = jnp.ones((K, B), dtype=jnp.int32)
    return z.at[jnp.arange(K)[:, None], (i % 2049)].add(ones)
timed("scatter-add counts (K,B)->(K,2049)", chain(scat), tab, ids_small)

# 5. searchsorted counts replacement
def ssd(t, i):
    s = jnp.sort(i, axis=-1)
    edges = jnp.arange(2050, dtype=jnp.int32)
    pos = jax.vmap(lambda row: jnp.searchsorted(row, edges))(s)
    return pos[:, 1:] - pos[:, :-1]
timed("sort+searchsorted counts", chain(ssd), tab, ids_small)

# 6. argsort (K, B)
timed("argsort (K,B) stable", chain(lambda t, i: jnp.argsort(i, axis=-1, stable=True)),
      tab, ids_small)

# 7. lax.sort key+payload (K,B): key ids, payload positions
def sortkv(t, i):
    pos = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[None], (K, B))
    k, v = jax.lax.sort([i, pos], dimension=1, num_keys=1, is_stable=True)
    return v
timed("lax.sort kv (K,B)", chain(sortkv), tab, ids_small)

# 8. big-table flat take (2^20 MSM scale): (64, 2^21) table, idx 2^21
B2 = 1 << 21
tab2 = jnp.asarray(rng.integers(0, 4096, (64, B2), dtype=np.int32))
idx2 = jnp.asarray(rng.integers(0, B2, (B2,), dtype=np.int32))
timed(f"take flat {B2} idx on (64,{B2})",
      chain(lambda t, i: jnp.take(t, i, axis=1)), tab2, idx2)

# 9. row-gather: table (B, ROWS) take axis=0 (each idx moves a contiguous row)
tabT = jnp.asarray(rng.integers(0, 4096, (B, ROWS), dtype=np.int32))
timed(f"take axis0 {K}x{B} idx on ({B},96)",
      chain(lambda t, i: jnp.take(t, i, axis=0)), tabT, idx_flat)

tabT128 = jnp.asarray(rng.integers(0, 4096, (B, 128), dtype=np.int32))
timed(f"take axis0 {K}x{B} idx on ({B},128)",
      chain(lambda t, i: jnp.take(t, i, axis=0)), tabT128, idx_flat)

# 10. bytes-scaling: 32 rows vs 96 rows, same idx count
tab32 = jnp.asarray(rng.integers(0, 4096, (32, B), dtype=np.int32))
timed(f"take flat {K}x{B} idx on (32,{B})",
      chain(lambda t, i: jnp.take(t, i, axis=1)), tab32, idx_flat)

# 11. idx-scaling: half the indices on 96 rows
idx_half = idx_flat[: (K * B) // 2]
timed(f"take flat {K}x{B}/2 idx on (96,{B})",
      chain(lambda t, i: jnp.take(t, i, axis=1)), tab, idx_half)

# 12. de-interleave cost: (96, X) -> pairs add, X = K*B
big = jnp.asarray(rng.integers(0, 4096, (ROWS, K * B), dtype=np.int32))
def deint(t, i):
    v = t + i[0]
    p = v.reshape(ROWS, (K * B) // 2, 2)
    return p[..., 0] + p[..., 1]
timed(f"de-interleave+add (96,{K*B})", chain(deint), big, idx_flat)

# 13. halve-by-slice (contiguous halves instead of even/odd)
def halves(t, i):
    v = t + i[0]
    h = (K * B) // 2
    return v[:, :h] + v[:, h:]
timed(f"contiguous-halves add (96,{K*B})", chain(halves), big, idx_flat)
