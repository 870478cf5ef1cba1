"""Device-side dynamic exponentiation / scalar multiplication / subgroup
and cofactor ops vs the bigint oracle (reference: `src/wasm/exp.ts`,
`curve-projective.ts:268-320`, `curve-affine.ts:111-139`,
`curve-twisted-edwards.ts:232-262`)."""

import random

import jax.numpy as jnp
import numpy as np

from msm_zprize_tpu.curves.params import BLS12_377, ED_ON_BLS12_377
from msm_zprize_tpu.fields.fp import make_field
from msm_zprize_tpu.fields.limbs import LimbScheme, pack
from msm_zprize_tpu.parallel.api import TwistedEdwards, Weierstrass


def test_exp_dyn(rng):
    F = make_field(BLS12_377.modulus, 12)
    p = BLS12_377.modulus
    xs = [rng.randrange(p) for _ in range(4)]
    es = [rng.randrange(p) for _ in range(2)] + [0, 1]
    scheme = LimbScheme(12, F.n)
    e_arr = jnp.asarray(pack(es, scheme))
    x_arr = jnp.asarray(F.pack(xs))
    out = F.exp_dyn(x_arr, e_arr)
    got = F.unpack(out)
    for g, x, e in zip(got, xs, es):
        assert g == pow(x, e, p)


def test_proj_scale_dyn_and_subgroup(rng):
    curve = Weierstrass.create(BLS12_377)
    W, C = curve.ops, curve.oracle_projective
    pts = [C.from_affine(curve.oracle_affine.random(rng)) for _ in range(3)]
    ks = [rng.randrange(BLS12_377.order) for _ in range(2)] + [0]
    P = W.pack_projective(pts)
    scheme = LimbScheme(12, curve.scalar.n)
    for k in ks:
        k_arr = jnp.asarray(pack([k] * len(pts), scheme))
        R = W.proj_scale_dyn(k_arr, P)
        got = W.unpack_projective(R)
        for g, pt in zip(got, pts):
            assert C.to_affine(g) == C.to_affine(C.scale(k, pt))
    # subgroup membership: random subgroup points pass
    assert bool(np.asarray(W.is_in_subgroup(P)).all())


def test_edwards_scale_dyn_and_cofactor(rng):
    curve = TwistedEdwards.create(ED_ON_BLS12_377)
    E, O = curve.ops, curve.oracle
    pts = [O.random(rng) for _ in range(3)]
    P = E.pack(pts)
    k = rng.randrange(ED_ON_BLS12_377.order)
    scheme = LimbScheme(12, curve.scalar.n)
    k_arr = jnp.asarray(pack([k] * len(pts), scheme))
    got = E.unpack(E.scale_dyn(k_arr, P))
    for g, pt in zip(got, pts):
        assert O.to_affine(g) == O.to_affine(O.scale(k, pt))
    assert bool(np.asarray(E.is_in_subgroup(P)).all())
    # cofactor-clear of an arbitrary curve point lands in the subgroup
    raw = [O.random_any(rng) for _ in range(2)] if hasattr(O, "random_any") else pts
    C2 = E.to_subgroup(E.pack(raw))
    assert bool(np.asarray(E.is_in_subgroup(C2)).all())
