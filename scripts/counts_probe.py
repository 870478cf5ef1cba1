"""Bucket-count histogram formulations on TPU: scatter-add vs
broadcast-compare reduction (VPU) at MSM shapes."""

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

K, B, L = 11, 131072, 2048

rng = np.random.default_rng(0)
ids = jnp.asarray(np.sort(rng.integers(0, L + 1, (K, B), dtype=np.int32), axis=1))


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
    print(f"{name:46s} {min(ts)/R*1e3:9.2f} ms/op  (compile {tc:.0f}s)", flush=True)


def f_scatter(ids, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        z = jnp.zeros((K, L + 2), dtype=jnp.int32)
        cnt = z.at[jnp.arange(K)[:, None], ids + r].add(
            jnp.ones((K, B), jnp.int32), indices_are_sorted=True
        )
        acc += cnt.sum(dtype=jnp.int32)
    return acc


def f_compare(ids, R=1):
    # counts[k, l] = sum_b (ids[k, b] == l): broadcast compare + lane reduce
    iota = jnp.arange(L + 2, dtype=jnp.int32)
    acc = jnp.int32(0)
    for r in range(R):
        idr = ids + r
        cnt = (idr[:, None, :] == iota[None, :, None]).sum(
            axis=-1, dtype=jnp.int32
        )
        acc += cnt.sum(dtype=jnp.int32)
    return acc


def f_compare_chunked(ids, R=1):
    # chunk the B axis so the (K, L, Bc) compare tile stays small
    iota = jnp.arange(L + 2, dtype=jnp.int32)
    C = 8192
    acc = jnp.int32(0)
    for r in range(R):
        idr = (ids + r).reshape(K, B // C, C)

        def body(carry, chunk):
            return carry + (chunk[:, None, :] == iota[None, :, None]).sum(
                axis=-1, dtype=jnp.int32
            ), None

        cnt, _ = jax.lax.scan(
            body, jnp.zeros((K, L + 2), jnp.int32), jnp.moveaxis(idr, 1, 0)
        )
        acc += cnt.sum(dtype=jnp.int32)
    return acc


def f_searchsorted_strided(ids, R=1):
    # offsets via comparisons against STRIDED samples of the sorted array:
    # offsets[l] = #ids < l = sum over strided blocks of per-block counts;
    # using sortedness: #ids < l = B - sum_b [ids_b >= l]; same compare cost
    iota = jnp.arange(L + 2, dtype=jnp.int32)
    acc = jnp.int32(0)
    for r in range(R):
        idr = ids + r
        less = (idr[:, None, :] < iota[None, :, None]).sum(axis=-1, dtype=jnp.int32)
        acc += less.sum(dtype=jnp.int32)
    return acc


timed("counts: scatter-add (sorted flag)", f_scatter, ids)
timed("counts: broadcast compare + reduce", f_compare, ids)
timed("counts: compare, scan-chunked", f_compare_chunked, ids)
timed("offsets: cumulative compare", f_searchsorted_strided, ids)
