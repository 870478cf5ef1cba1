"""End-to-end MSM pipelines vs the bigint oracle.

Mirrors `src/msm.test.ts`: msm / msmUnsafe / msmProjective vs bigintMsm on
the concrete curves, plus safe-mode edge cases. Sizes kept small and shapes
fixed (the API pads to powers of two) so XLA compiles are shared.
"""

import jax
import jax.numpy as jnp
import pytest

from msm_zprize_tpu.bigint.msm import msm as msm_oracle
from msm_zprize_tpu.curves.params import BLS12_377, ED_ON_BLS12_377, PALLAS
from msm_zprize_tpu.parallel.api import TwistedEdwards, Weierstrass


@pytest.fixture(autouse=True, scope="module")
def _no_cache_writes():
    """XLA:CPU segfaults serializing some MSM executables for the
    persistent cache (observed on the padded-engine programs; see
    conftest.no_compile_cache) — disable cache WRITES for this module."""
    prev = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)


@pytest.fixture(scope="module")
def bls():
    return Weierstrass.create(BLS12_377)


@pytest.fixture(scope="module")
def ed():
    return TwistedEdwards.create(ED_ON_BLS12_377)


def _setup_w(curve, rng, N):
    A, C = curve.oracle_affine, curve.oracle_projective
    pts = [A.random(rng) for _ in range(N)]
    scs = [rng.randrange(curve.params.order) for _ in range(N)]
    want = C.to_affine(
        msm_oracle(C, scs, [C.from_affine(p) for p in pts], curve.params.order.bit_length())
    )
    return pts, scs, want


def test_msm_flagship(bls, rng):
    pts, scs, want = _setup_w(bls, rng, 8)
    assert bls.msm_bigint(scs, pts) == want


def test_msm_flagship_edge_cases(bls, rng):
    C = bls.oracle_projective
    pts, scs, _ = _setup_w(bls, rng, 8)
    # duplicate points, safe mode
    got = bls.msm_bigint([5, 11], [pts[0], pts[0]])
    assert got == C.to_affine(C.scale(16, C.from_affine(pts[0])))
    # cancellation to infinity
    q = bls.params.order
    assert bls.msm_bigint([3, q - 3], [pts[1], pts[1]]) is None
    # zero scalars
    assert bls.msm_bigint([0, 0, 0], pts[:3]) is None
    # single point
    assert bls.msm_bigint([987654321], [pts[2]]) == C.to_affine(
        C.scale(987654321, C.from_affine(pts[2]))
    )


def test_msm_unsafe(bls, rng):
    pts, scs, want = _setup_w(bls, rng, 8)
    s = bls.scalars_from_ints(scs)
    p = bls.points_from_ints(pts)
    res = bls.msm_unsafe(s, p)
    assert bls.result_to_int(res) == want


def test_msm_projective_basic(bls, rng):
    pts, scs, want = _setup_w(bls, rng, 8)
    s = bls.scalars_from_ints(scs)
    prj = bls.ops.from_affine(bls.points_from_ints(pts))
    res = jax.jit(lambda ss, X, Y, Z: bls.msm_projective(ss, type(prj)(X, Y, Z), c=8))(
        s, *prj
    )
    assert bls.result_to_int(res) == want


def test_msm_edwards(ed, rng):
    Ec = ed.oracle
    N = 8
    pts = [Ec.random(rng) for _ in range(N)]
    scs = [rng.randrange(ed.params.order) for _ in range(N)]
    want = Ec.to_affine(msm_oracle(Ec, scs, pts, ed.params.order.bit_length()))
    assert ed.msm_bigint(scs, [Ec.to_affine(p) for p in pts]) == want
    # msm_unsafe parity alias (`src/parallel.ts:251-259`): same result,
    # same compiled program (unified adds are already complete)
    s = ed.scalars_from_ints(scs)
    p = ed.points_from_ints([Ec.to_affine(q) for q in pts])
    assert ed.result_to_int(ed.msm_unsafe(s, p)) == want


def test_msm_flagship_sharded(bls, rng, no_compile_cache):
    from msm_zprize_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    pts, scs, want = _setup_w(bls, rng, 16)
    s = bls.scalars_from_ints(scs)
    p = bls.points_from_ints(pts)
    res = bls.msm(s, p, c=6, mesh=mesh)
    assert bls.result_to_int(res) == want


def test_msm_edwards_sharded(ed, rng, no_compile_cache):
    from msm_zprize_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    Ec = ed.oracle
    N = 16
    pts = [Ec.random(rng) for _ in range(N)]
    scs = [rng.randrange(ed.params.order) for _ in range(N)]
    want = Ec.to_affine(msm_oracle(Ec, scs, pts, ed.params.order.bit_length()))
    s = ed.scalars_from_ints(scs)
    p = ed.points_from_ints([Ec.to_affine(q) for q in pts])
    res = ed.msm(s, p, c=6, mesh=mesh)
    assert ed.result_to_int(res) == want


def test_random_points_fast(bls):
    pts = bls.random_points_fast(16, seed=3)
    assert bool(jnp.all(bls.ops.affine_is_on_curve(pts)))
    assert not bool(jnp.any(pts.inf))
    # deterministic for a fixed seed
    pts2 = bls.random_points_fast(16, seed=3)
    assert bool(jnp.all(pts.x == pts2.x))


def test_random_points_fast_edwards(ed):
    pts = ed.random_points_fast(16, seed=4)
    assert bool(jnp.all(ed.ops.is_on_curve(pts)))
