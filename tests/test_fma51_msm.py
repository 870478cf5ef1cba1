"""End-to-end MSM with 51x5 coordinate storage (mode="fma51") vs oracle.

BASELINE config #5's correctness leg: the Pallas curve's flagship MSM with
points held in the reference's 5x51-bit limb layout throughout, computed by
the codec-parameterized fused kernels (interpret mode on the CPU host).
"""

import random

import pytest

from msm_zprize_tpu.bigint.msm import msm as msm_oracle
from msm_zprize_tpu.curves.params import PALLAS
from msm_zprize_tpu.parallel.api import Weierstrass


@pytest.fixture(autouse=True, scope="module")
def _no_cache_writes():
    """XLA:CPU SIGSEGVs while SERIALIZING some executables for the
    persistent cache (see conftest.no_compile_cache) — the interpret-mode
    51x5 MSM programs trip it. Disable cache writes for this module."""
    import jax

    prev = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    yield
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev)


def test_fma51_msm_vs_oracle():
    curve = Weierstrass.create(PALLAS)
    rng = random.Random(11)
    N = 16
    pts = [curve.oracle_affine.random(rng) for _ in range(N)]
    scs = [rng.randrange(PALLAS.order) for _ in range(N)]
    scs[:3] = [0, 1, PALLAS.order - 1]
    s = curve.scalars_from_ints(scs)
    p = curve.points_from_ints(pts)
    res = curve.msm(s, p, c=6, mode="fma51")
    got = curve.result_to_int(res)
    C = curve.oracle_projective
    want = C.to_affine(
        msm_oracle(C, scs, [C.from_affine(q) for q in pts], 255)
    )
    assert got == want


def test_fma51_msm_sharded():
    """51x5-storage MSM over the 8-device mesh (BASELINE #5's sharded leg):
    points in pair-row layout shard over the data axis; bucket partials ride
    the same all_to_all redistribution as the native track."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs a multi-device mesh (CPU test host provides 8)")
    from msm_zprize_tpu.parallel.mesh import make_mesh

    curve = Weierstrass.create(PALLAS)
    mesh = make_mesh()
    rng = random.Random(12)
    N = 16
    pts = [curve.oracle_affine.random(rng) for _ in range(N)]
    scs = [rng.randrange(PALLAS.order) for _ in range(N)]
    s = curve.scalars_from_ints(scs)
    p = curve.points_from_ints(pts)
    res = curve.msm(s, p, c=6, mesh=mesh, mode="fma51")
    got = curve.result_to_int(res)
    C = curve.oracle_projective
    want = C.to_affine(
        msm_oracle(C, scs, [C.from_affine(q) for q in pts], 255)
    )
    assert got == want
