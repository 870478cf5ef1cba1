"""Round-5 accumulation-pipeline probes (2^16 flagship shapes, current
sqrt slot schedule M=104).

Questions driving VERDICT r4 task 2 (close the 3.07 -> <=2.0 ns/mul gap):
  1. what does the CURRENT 2-step composed slot gather cost, split into its
     1-row src gather and the wide stacked gather?
  2. pre-gathering points into sorted order once (B*K idx), then direct
     positional slot gathers -- cheaper than per-round 2-step?
  3. scatter-fill of the slot layout (B*K updates, row-dependence?)
  4. bucket counts: chunked-compare (current) vs windowed-compare over
     a narrow id band per sorted chunk
  5. sort cost at (K, B)

Usage: python scripts/r5_probe.py [logN]
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

from msm_zprize_tpu.msm.common import bucket_counts, sort_by_bucket
from msm_zprize_tpu.msm.engine import slot_count

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N
c = {16: 12, 18: 13, 20: 13}.get(LOG_N, 12)
K = 11
L = 1 << (c - 1)
B = 2 * N
mean = B // L
M = slot_count(B, L)
ROWS = 64  # x+y native coordinate rows
print(f"shapes: B={B} K={K} L={L} mean={mean} M={M} slots={M*K*L/1e6:.2f}M",
      flush=True)

rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, L, (K, B), dtype=np.int32))
stacked = jnp.asarray(rng.integers(0, 4096, (ROWS, B), dtype=np.int32))
slot_idx = jnp.asarray(rng.integers(0, B, (M * K * L,), dtype=np.int32))


def timed(name, fn, *args, reps=4, R=2):
    jf = jax.jit(fn, static_argnames=("R",))
    t0 = time.time()
    jax.device_get(jf(*args, R=R))
    tc = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        jax.device_get(jf(*args, R=R))
        ts.append(time.time() - t0)
    print(f"{name:52s} {min(ts)/R*1e3:9.1f} ms/op  (compile {tc:.0f}s)",
          flush=True)


def red(x):
    if isinstance(x, (tuple, list)):
        return sum((red(a) for a in x), jnp.int32(0))
    return x.sum(dtype=jnp.int32)


# --- 1. gather decomposition ------------------------------------------------

def f_src_1row(idx, R=1):
    order = jnp.arange(K * B, dtype=jnp.int32)
    acc = jnp.int32(0)
    for r in range(R):
        src = jnp.take(order, jnp.clip(idx + r, 0, K * B - 1))
        acc += red(src)
    return acc


def f_wide(idx, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        g = jnp.take(stacked, jnp.clip(idx + r, 0, B - 1), axis=-1)
        acc += red(g)
    return acc


def f_two_step(idx, R=1):
    order = jnp.asarray(rng.integers(0, B, (K * B,), dtype=np.int32))
    acc = jnp.int32(0)
    for r in range(R):
        src = jnp.take(order, jnp.clip(idx + r, 0, K * B - 1))
        g = jnp.take(stacked, src, axis=-1)
        acc += red(g)
    return acc


# --- 2. pre-gather into sorted order, then direct positional gather --------

def f_pregather(idx, R=1):
    order = jnp.asarray(rng.integers(0, B, (K * B,), dtype=np.int32))
    acc = jnp.int32(0)
    for r in range(R):
        sorted_pts = jnp.take(stacked, order, axis=-1)  # (ROWS, K*B) once
        g = jnp.take(sorted_pts, jnp.clip(idx + r, 0, K * B - 1), axis=-1)
        acc += red(g)
    return acc


# --- 3. scatter-fill of the slot layout ------------------------------------

def f_scatter_fill(R=1, rows=ROWS):
    # each sorted element knows its slot: scatter (rows, K*B) values into a
    # (rows, M*K*L) buffer
    slot_of = jnp.asarray(rng.integers(0, M * K * L, (K * B,), dtype=np.int32))
    src = stacked[:rows]
    vals = jnp.concatenate([src] * K, axis=-1)  # (rows, K*B)
    acc = jnp.int32(0)
    for r in range(R):
        buf = jnp.zeros((rows, M * K * L), jnp.int32)
        buf = buf.at[:, jnp.clip(slot_of + r, 0, M * K * L - 1)].set(
            vals, mode="drop", unique_indices=True
        )
        acc += red(buf)
    return acc


def f_scatter_fill_8(R=1):
    return f_scatter_fill(R=R, rows=8)


# --- 4. counts variants -----------------------------------------------------

def f_counts_current(ids, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        _, sids = sort_by_bucket((ids + r) % L)
        acc += red(bucket_counts(sids, L + 1))
    return acc


def f_counts_windowed(ids, R=1):
    """Windowed compare on SORTED rows: chunk i of size C spans a narrow id
    band [lo_i, lo_i+W); compare only against that band. Exact when the
    band holds (checked via hi), fallback contribution computed by a
    second coarse pass at band granularity."""
    Cc = 4096
    Wb = 512  # id band per chunk (>= C/mean by a safety factor)
    acc = jnp.int32(0)
    for r in range(R):
        _, sids = sort_by_bucket((ids + r) % L)
        ch = sids.reshape(K, B // Cc, Cc)
        lo = ch[:, :, 0][..., None]  # (K, nch, 1)
        band = lo + jnp.arange(Wb, dtype=jnp.int32)[None, None, :]
        # (K, nch, Wb) counts within band
        cnt = (ch[:, :, None, :] == band[..., None]).sum(axis=-1,
                                                         dtype=jnp.int32)
        # scatter bands back to (K, L+1): band starts differ per chunk
        rowsK = jnp.arange(K, dtype=jnp.int32)[:, None, None]
        out = jnp.zeros((K, L + 1), jnp.int32)
        out = out.at[
            jnp.broadcast_to(rowsK, band.shape),
            jnp.minimum(band, L),
        ].add(cnt, mode="drop")
        acc += red(out)
    return acc


def f_sort(ids, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        _, sids = sort_by_bucket((ids + r) % L)
        acc += red(sids)
    return acc


timed("sort (K,B)", f_sort, ids)
timed("counts current (sort+chunked compare)", f_counts_current, ids)
timed("counts windowed (sort+band compare+scatter)", f_counts_windowed, ids)
timed(f"src gather 1-row ({M*K*L/1e6:.1f}M idx)", f_src_1row, slot_idx)
timed(f"wide gather {ROWS}-row ({M*K*L/1e6:.1f}M idx)", f_wide, slot_idx)
timed("two-step composed (current engine)", f_two_step, slot_idx)
timed(f"pre-gather ({K*B/1e6:.1f}M idx) + direct slot", f_pregather, slot_idx)
timed(f"scatter-fill {ROWS} rows ({K*B/1e6:.1f}M upd)", f_scatter_fill)
timed(f"scatter-fill 8 rows ({K*B/1e6:.1f}M upd)", f_scatter_fill_8)
