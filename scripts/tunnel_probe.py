"""Separate device compute time from axon-tunnel overheads for the MSM bench.

Measures, on the real chip:
  1. sync RPC roundtrip for a tiny array (device_get latency floor)
  2. host->device transfer of a fresh (9, N) scalar array
  3. msm_unsafe wall time with scalars already on device + tiny readback
  4. msm_unsafe wall time with in-timer scalar transfer (bench.py's old shape)
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

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.parallel.api import Weierstrass
from msm_zprize_tpu.utils.sync import sync

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N

curve = Weierstrass.create(BLS12_377)
dev = jax.devices()[0]

t0 = time.time()
points = curve.random_points_fast(N, seed=1)
sync(points.x[:, :1])
print(f"points ready: {time.time()-t0:.1f}s", flush=True)

tiny = jnp.zeros((4,), dtype=jnp.int32)
sync(tiny)
for lbl, reps in [("sync tiny RPC", 5)]:
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(tiny)
        ts.append(time.time() - t0)
    print(f"{lbl}: min {min(ts)*1e3:.1f} ms  all {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

import numpy as np

host_scalars = np.asarray(curve.random_scalars(N, seed=3))
ts = []
for i in range(5):
    t0 = time.time()
    s = jax.device_put(jnp.asarray(host_scalars), dev)
    sync(s[:, :1])
    ts.append(time.time() - t0)
print(f"scalar transfer (9,{N}) int32: min {min(ts)*1e3:.1f} ms  all {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

# device-resident scalars, tiny readback
s_dev = jax.device_put(jnp.asarray(host_scalars), dev)
sync(s_dev[:, :1])
t0 = time.time()
res = curve.msm_unsafe(s_dev, points)
sync(res)
print(f"msm compile+1st: {time.time()-t0:.1f}s", flush=True)
ts = []
for i in range(7):
    t0 = time.time()
    res = curve.msm_unsafe(s_dev, points)
    sync(res)
    ts.append(time.time() - t0)
print(f"msm (scalars resident): min {min(ts)*1e3:.1f} ms  all {[f'{t*1e3:.1f}' for t in ts]}", flush=True)

ts = []
for i in range(5):
    sc = jnp.asarray(host_scalars)
    t0 = time.time()
    res = curve.msm_unsafe(sc, points)
    sync(res)
    ts.append(time.time() - t0)
print(f"msm (in-timer transfer): min {min(ts)*1e3:.1f} ms  all {[f'{t*1e3:.1f}' for t in ts]}", flush=True)
