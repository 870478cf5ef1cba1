"""Bisect the 27.8 ms prep phase (2^16): endomorphism vs digit kernel vs glue."""

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
from msm_zprize_tpu.fields.pallas_scalar import glv_digits_pallas
from msm_zprize_tpu.msm.batched_affine import glv_prep
from msm_zprize_tpu.parallel.api import Weierstrass

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
N = 1 << LOG_N
c = 12
K = 11

curve = Weierstrass.create(BLS12_377)
W, S = curve.ops, curve.scalar

rng = np.random.default_rng(0)
px = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
py = jnp.asarray(rng.integers(0, 4096, (W.F.n, N), dtype=np.int32))
pinf = jnp.zeros((N,), dtype=np.int32)
sc = curve.random_scalars(N, seed=0)


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


def red(x):
    if isinstance(x, (tuple, list)):
        return sum((red(a) for a in x), jnp.int32(0))
    return x.sum(dtype=jnp.int32)


def f_endo(px, py, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        e = W.endomorphism(AffinePoints(px + r, py, pinf))
        acc += red((e.x, e.y))
    return acc


def f_digits(sc, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        mags, signs = glv_digits_pallas(S, sc + r, c, K)
        acc += red((mags, signs))
    return acc


def f_prep(sc, px, py, R=1):
    acc = jnp.int32(0)
    for r in range(R):
        pts2, mags, signs, _, _ = glv_prep(W, S, sc + r, AffinePoints(px, py, pinf), c)
        acc += red((pts2.x, pts2.y, mags, signs))
    return acc


timed("endomorphism (N lanes, 1 montmul)", f_endo, px, py)
timed("glv digits kernel", f_digits, sc)
timed("glv_prep full", f_prep, sc, px, py)
