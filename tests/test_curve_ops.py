"""Vectorized curve ops vs bigint oracle — differential tests.

Mirrors `src/curve-projective.test.ts` / `src/curve-twisted-edwards.test.ts`:
roundtrips, add/sub/double/negate, add-zero, add-negation, edge cases,
on-curve checks for valid and invalid points.
"""

import jax
import jax.numpy as jnp
import pytest

from msm_zprize_tpu.bigint.edwards import EdwardsCurve
from msm_zprize_tpu.bigint.weierstrass import AffineCurve, ProjectiveCurve
from msm_zprize_tpu.curves.edwards import EdwardsOps
from msm_zprize_tpu.curves.params import BLS12_377, ED_ON_BLS12_377, PALLAS
from msm_zprize_tpu.curves.weierstrass import WeierstrassOps

B = 8


@pytest.fixture(scope="module", params=[BLS12_377, PALLAS], ids=lambda p: p.label)
def wsetup(request):
    params = request.param
    W = WeierstrassOps(params)
    A = AffineCurve(params)
    C = ProjectiveCurve(params)
    import random

    r = random.Random(0xABC)
    pts_a = [A.random(r) for _ in range(B)]
    pts_b = [A.random(r) for _ in range(B)]
    return params, W, A, C, pts_a, pts_b


def test_affine_pack_roundtrip(wsetup):
    _, W, A, _, pts_a, _ = wsetup
    pts = pts_a[:4] + [None, pts_a[5], None, pts_a[7]]
    assert W.unpack_affine(W.pack_affine(pts)) == pts


def test_batch_add(wsetup):
    _, W, A, _, pts_a, pts_b = wsetup
    got = W.unpack_affine(jax.jit(W.batch_add)(W.pack_affine(pts_a), W.pack_affine(pts_b)))
    assert got == [A.add(p, q) for p, q in zip(pts_a, pts_b)]


def test_batch_add_edge_cases(wsetup):
    _, W, A, _, pts_a, pts_b = wsetup
    mix_a = [pts_a[0], pts_a[1], None, pts_a[3], None, pts_a[5], pts_a[6], pts_a[7]]
    mix_b = [pts_a[0], A.neg(pts_a[1]), pts_b[2], None, None, pts_b[5], pts_a[6], A.neg(pts_a[7])]
    got = W.unpack_affine(W.batch_add(W.pack_affine(mix_a), W.pack_affine(mix_b)))
    assert got == [A.add(p, q) for p, q in zip(mix_a, mix_b)]


def test_batch_add_unsafe(wsetup):
    _, W, A, _, pts_a, pts_b = wsetup
    got = W.unpack_affine(
        jax.jit(lambda p, q: W.batch_add(p, q, safe=False))(
            W.pack_affine(pts_a), W.pack_affine(pts_b)
        )
    )
    assert got == [A.add(p, q) for p, q in zip(pts_a, pts_b)]


def test_proj_add_double(wsetup):
    _, W, _, C, _, _ = wsetup
    import random

    r = random.Random(0xDEF)
    prj = [C.random(r) for _ in range(B)]
    prj2 = [C.random(r) for _ in range(B)]
    Qa, Qb = W.pack_projective(prj), W.pack_projective(prj2)
    s = W.unpack_projective(jax.jit(W.proj_add)(Qa, Qb))
    assert all(C.eq(x, C.add(p, q)) for x, p, q in zip(s, prj, prj2))
    d = W.unpack_projective(jax.jit(W.proj_double)(Qa))
    assert all(C.eq(x, C.double(p)) for x, p in zip(d, prj))
    # edge cases: 0+P, P+(-P), P+P
    zero = W.proj_zeros(B)
    assert all(C.eq(x, p) for x, p in zip(W.unpack_projective(W.proj_add(zero, Qa)), prj))
    assert all(C.is_zero(x) for x in W.unpack_projective(W.proj_add(Qa, W.proj_neg(Qa))))
    assert all(
        C.eq(x, C.double(p)) for x, p in zip(W.unpack_projective(W.proj_add(Qa, Qa)), prj)
    )


def test_proj_add_affine_mixed(wsetup):
    _, W, A, C, pts_a, pts_b = wsetup
    import random

    r = random.Random(0x123)
    prj = [C.random(r) for _ in range(B)]
    got = W.unpack_projective(
        jax.jit(W.proj_add_affine)(W.pack_projective(prj), W.pack_affine(pts_b))
    )
    assert all(C.eq(x, C.add(p, C.from_affine(q))) for x, p, q in zip(got, prj, pts_b))
    # mixed with infinity lanes
    mix = [None, pts_b[1]] + pts_b[2:]
    got2 = W.unpack_projective(
        W.proj_add_affine(W.pack_projective(prj), W.pack_affine(mix))
    )
    assert all(
        C.eq(x, C.add(p, C.from_affine(q) if q else C.zero))
        for x, p, q in zip(got2, prj, mix)
    )


def test_to_from_affine(wsetup):
    _, W, _, C, _, _ = wsetup
    import random

    r = random.Random(0x456)
    prj = [C.random(r) for _ in range(B - 1)]
    Q = W.pack_projective(prj + [C.zero])
    aff = W.to_affine(Q)
    assert W.unpack_affine(aff) == [C.to_affine(p) for p in prj] + [None]
    back = W.unpack_projective(W.from_affine(aff))
    assert all(C.eq(a, b) for a, b in zip(back, prj + [C.zero]))


def test_endomorphism_and_on_curve(wsetup):
    params, W, A, _, pts_a, _ = wsetup
    Pa = W.pack_affine(pts_a)
    assert W.unpack_affine(W.endomorphism(Pa)) == [A.endomorphism(p) for p in pts_a]
    assert W.affine_is_on_curve(Pa).tolist() == [True] * B
    # invalid points rejected
    bad = W.pack_affine([(p[0], (p[1] + 1) % params.modulus) for p in pts_a])
    assert W.affine_is_on_curve(bad).tolist() == [False] * B


def test_proj_scale_const(wsetup):
    _, W, _, C, _, _ = wsetup
    import random

    r = random.Random(0x789)
    prj = [C.random(r) for _ in range(4)]
    Q = W.pack_projective(prj)
    # small constants keep the unrolled double-and-add chain cheap on the
    # 2-CPU test host; the structure (doubles + adds, zero, identity) is
    # fully exercised already at k=13
    for k in (0, 1, 5, 13):
        got = W.unpack_projective(W.proj_scale_const(k, Q))
        assert all(C.eq(x, C.scale(k, p)) for x, p in zip(got, prj))


@pytest.fixture(scope="module")
def esetup():
    E = EdwardsOps(ED_ON_BLS12_377)
    Ec = EdwardsCurve(ED_ON_BLS12_377)
    import random

    r = random.Random(0xE0)
    pts = [Ec.random(r) for _ in range(B)]
    pts2 = [Ec.random(r) for _ in range(B)]
    return E, Ec, pts, pts2


def test_edwards_add(esetup):
    E, Ec, pts, pts2 = esetup
    Ea, Eb = E.pack(pts), E.pack(pts2)
    got = E.unpack(jax.jit(E.add)(Ea, Eb))
    assert all(Ec.eq(x, Ec.add(p, q)) for x, p, q in zip(got, pts, pts2))
    # unified: doubling and identities through the same code path
    assert all(Ec.eq(x, Ec.double(p)) for x, p in zip(E.unpack(E.add(Ea, Ea)), pts))
    assert all(Ec.eq(x, p) for x, p in zip(E.unpack(E.add(Ea, E.zeros(B))), pts))
    assert all(Ec.is_zero(x) for x in E.unpack(E.add(Ea, E.neg(Ea))))


def test_edwards_mixed_add(esetup):
    E, Ec, pts, pts2 = esetup
    norm = E.batch_normalize(E.pack(pts2))
    got = E.unpack(jax.jit(E.add_mixed)(E.pack(pts), norm))
    assert all(Ec.eq(x, Ec.add(p, q)) for x, p, q in zip(got, pts, pts2))


def test_edwards_normalize_on_curve(esetup):
    E, Ec, pts, _ = esetup
    Ea = E.pack(pts)
    bn = E.batch_normalize(Ea)
    assert all(Ec.eq(x, p) for x, p in zip(E.unpack(bn), pts))
    assert E.F.unpack(bn.Z) == [1] * B
    assert E.is_on_curve(Ea).tolist() == [True] * B
    assert E.is_zero(E.zeros(B)).tolist() == [True] * B
