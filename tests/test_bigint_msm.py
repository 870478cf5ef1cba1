"""Oracle MSM invariants, mirroring `src/bigint/msm.test.ts` coverage."""

import pytest

from msm_zprize_tpu.bigint.edwards import EdwardsCurve
from msm_zprize_tpu.bigint.msm import msm, msm_naive
from msm_zprize_tpu.bigint.weierstrass import ProjectiveCurve
from msm_zprize_tpu.curves.params import BLS12_377, ED_ON_BLS12_377, PALLAS


@pytest.mark.parametrize("params", [BLS12_377, PALLAS], ids=lambda p: p.label)
def test_msm_matches_naive(params, rng):
    C = ProjectiveCurve(params)
    bits = params.order.bit_length()
    for N in (1, 2, 7, 16):
        pts = [C.random(rng) for _ in range(N)]
        scs = [rng.randrange(params.order) for _ in range(N)]
        assert C.eq(msm(C, scs, pts, bits), msm_naive(C, scs, pts))


def test_msm_same_point(rng):
    # same point everywhere => (sum s_i) * P
    C = ProjectiveCurve(BLS12_377)
    bits = BLS12_377.order.bit_length()
    P = C.random(rng)
    scs = [rng.randrange(BLS12_377.order) for _ in range(9)]
    r = msm(C, scs, [P] * 9, bits)
    assert C.eq(r, C.scale(sum(scs) % BLS12_377.order, P))


def test_msm_same_scalar(rng):
    # same scalar everywhere => s * (sum P_i)
    C = ProjectiveCurve(BLS12_377)
    bits = BLS12_377.order.bit_length()
    pts = [C.random(rng) for _ in range(7)]
    s = rng.randrange(BLS12_377.order)
    total = C.zero
    for P in pts:
        total = C.add(total, P)
    assert C.eq(msm(C, [s] * 7, pts, bits), C.scale(s, total))


def test_msm_zero_sum(rng):
    # s*P + (q - s)*P == 0
    C = ProjectiveCurve(BLS12_377)
    q = BLS12_377.order
    bits = q.bit_length()
    P = C.random(rng)
    s = rng.randrange(1, q)
    r = msm(C, [s, q - s], [P, P], bits)
    assert C.is_zero(r)


def test_msm_edwards(rng):
    E = EdwardsCurve(ED_ON_BLS12_377)
    bits = ED_ON_BLS12_377.order.bit_length()
    pts = [E.random(rng) for _ in range(8)]
    scs = [rng.randrange(ED_ON_BLS12_377.order) for _ in range(8)]
    assert E.eq(msm(E, scs, pts, bits), msm_naive(E, scs, pts))
