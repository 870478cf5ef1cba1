"""Oracle curve laws, mirroring `src/bigint/curves.test.ts` coverage."""

import pytest

from msm_zprize_tpu.bigint.edwards import EdwardsCurve
from msm_zprize_tpu.bigint.field import random_field
from msm_zprize_tpu.bigint.glv import decompose, glv_params
from msm_zprize_tpu.bigint.weierstrass import AffineCurve, ProjectiveCurve
from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, ED_ON_BLS12_377, PALLAS

W_CURVES = [BLS12_377, BLS12_381, PALLAS]


@pytest.mark.parametrize("params", W_CURVES, ids=lambda p: p.label)
def test_affine_laws(params, rng):
    C = AffineCurve(params)
    G = params.generator
    assert C.is_on_curve(G) and C.is_in_subgroup(G)
    P = C.random(rng)
    Q = C.random(rng)
    R = C.random(rng)
    assert C.is_on_curve(P)
    # commutativity / associativity
    assert C.add(P, Q) == C.add(Q, P)
    assert C.add(C.add(P, Q), R) == C.add(P, C.add(Q, R))
    # identities and negation
    assert C.add(P, None) == P
    assert C.add(P, C.neg(P)) is None
    assert C.double(P) == C.add(P, P)
    # scale distributes
    assert C.scale(5, P) == C.add(P, C.scale(4, P))
    # order annihilates
    assert C.scale(params.order, P) is None


@pytest.mark.parametrize("params", W_CURVES, ids=lambda p: p.label)
def test_affine_rejects_non_points(params, rng):
    C = AffineCurve(params)
    p = params.modulus
    found_invalid = 0
    for _ in range(10):
        x, y = random_field(p, rng), random_field(p, rng)
        if not C.is_on_curve((x, y)):
            found_invalid += 1
    assert found_invalid > 0


@pytest.mark.parametrize("params", W_CURVES, ids=lambda p: p.label)
def test_projective_matches_affine(params, rng):
    A = AffineCurve(params)
    C = ProjectiveCurve(params)
    P = A.random(rng)
    Q = A.random(rng)
    Pp, Qp = C.from_affine(P), C.from_affine(Q)
    assert C.to_affine(C.add(Pp, Qp)) == A.add(P, Q)
    assert C.to_affine(C.double(Pp)) == A.double(P)
    assert C.to_affine(C.sub(Pp, Qp)) == A.add(P, A.neg(Q))
    # complete-add edge cases
    assert C.eq(C.add(Pp, C.neg(Pp)), C.zero)
    assert C.to_affine(C.add(Pp, Pp)) == A.double(P)
    assert C.to_affine(C.add(Pp, C.zero)) == P
    s = rng.randrange(1, 1000)
    assert C.to_affine(C.scale(s, Pp)) == A.scale(s, P)
    # randomized Z
    Pz = C.random(rng)
    assert C.is_on_curve(Pz)


@pytest.mark.parametrize("params", W_CURVES, ids=lambda p: p.label)
def test_endomorphism(params, rng):
    A = AffineCurve(params)
    P = A.random(rng)
    assert A.scale(params.lambda_, P) == A.endomorphism(P)


@pytest.mark.parametrize("params", W_CURVES, ids=lambda p: p.label)
def test_glv_decompose(params, rng):
    g = glv_params(params.order, params.lambda_)
    assert g.max_bits <= (params.order.bit_length() + 1) // 2 + 2
    for _ in range(50):
        s = rng.randrange(params.order)
        sg0, a0, sg1, a1 = decompose(s, g)
        lhs = (-a0 if sg0 else a0) + params.lambda_ * (-a1 if sg1 else a1)
        assert (lhs - s) % params.order == 0
        assert a0.bit_length() <= g.max_bits
        assert a1.bit_length() <= g.max_bits


def test_edwards_laws(rng):
    E = EdwardsCurve(ED_ON_BLS12_377)
    G = E.from_affine(ED_ON_BLS12_377.generator)
    assert E.is_on_curve(G) and E.is_in_subgroup(G)
    P, Q, R = E.random(rng), E.random(rng), E.random(rng)
    assert E.is_on_curve(P)
    assert E.eq(E.add(P, Q), E.add(Q, P))
    assert E.eq(E.add(E.add(P, Q), R), E.add(P, E.add(Q, R)))
    assert E.is_zero(E.add(P, E.neg(P)))
    assert E.eq(E.add(P, E.zero), P)
    # unified add doubles correctly
    assert E.eq(E.add(P, P), E.double(P))
    # affine round trip
    assert E.eq(E.from_affine(E.to_affine(P)), P)
    assert E.is_zero(E.scale(ED_ON_BLS12_377.order, P))
