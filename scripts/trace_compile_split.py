"""Measure where bench.py's startup time goes: trace vs lower vs compile.

The JAX persistent compile cache only skips the XLA *compile* step; tracing
and lowering re-run in every process. This script times each phase for the
flagship 2^16 MSM program so we know what to attack.

Run: python scripts/trace_compile_split.py [log_n]
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

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.curves.weierstrass import AffinePoints
from msm_zprize_tpu.msm.batched_affine import msm_batched_affine
from msm_zprize_tpu.parallel.api import Weierstrass, _default_mode

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N

t0 = time.time()
curve = Weierstrass.create(BLS12_377)
W, S = curve.ops, curve.scalar
print(f"create: {time.time()-t0:.1f}s", flush=True)

rng = np.random.default_rng(0)
px = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
pinf = jnp.zeros((N,), dtype=np.int32)
sc = jnp.asarray(curve.random_scalars(N, seed=0))
mode = _default_mode()
print(f"mode = {mode}", flush=True)


def fn(s, x, y, i):
    return msm_batched_affine(W, S, s, AffinePoints(x, y, i), None, safe=False, mode=mode)


jf = jax.jit(fn)
t0 = time.time()
traced = jf.trace(sc, px, py, pinf)
t_trace = time.time() - t0
print(f"trace:   {t_trace:.1f}s", flush=True)

t0 = time.time()
lowered = traced.lower()
t_lower = time.time() - t0
print(f"lower:   {t_lower:.1f}s", flush=True)

t0 = time.time()
compiled = lowered.compile()
t_compile = time.time() - t0
print(f"compile: {t_compile:.1f}s  (persistent cache {'HIT likely' if t_compile < 20 else 'MISS likely'})", flush=True)

t0 = time.time()
r = compiled(sc, px, py, pinf)
jax.device_get(jax.tree_util.tree_leaves(r)[0])
print(f"run1:    {time.time()-t0:.1f}s", flush=True)
