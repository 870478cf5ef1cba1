"""Device GLV decomposition + signed-digit recoding vs oracle invariants."""

import jax
import jax.numpy as jnp
import pytest

from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, PALLAS
from msm_zprize_tpu.fields import limbs as L
from msm_zprize_tpu.fields.scalar import SimpleScalar, make_glv_scalar, signed_digits

CURVES = {c.label: c for c in (BLS12_377, BLS12_381, PALLAS)}


@pytest.fixture(params=list(CURVES), ids=list(CURVES))
def curve(request):
    return CURVES[request.param]


def test_glv_decompose(curve, rng):
    q, lam = curve.order, curve.lambda_
    S = make_glv_scalar(q, lam)
    B = 64
    scalars = [rng.randrange(q) for _ in range(B)]
    scalars[:4] = [0, 1, q - 1, q // 2]
    s = jnp.asarray(S.pack(scalars))
    sg0, u0, sg1, u1 = jax.jit(S.decompose)(s)
    a0, a1 = S.unpack_half(u0), S.unpack_half(u1)
    for i in range(B):
        lhs = (-a0[i] if int(sg0[i]) else a0[i]) + lam * (-a1[i] if int(sg1[i]) else a1[i])
        assert (lhs - scalars[i]) % q == 0
        assert a0[i].bit_length() <= S.max_bits
        assert a1[i].bit_length() <= S.max_bits


@pytest.mark.parametrize("c", [4, 12, 13, 16])
def test_signed_digits_roundtrip(curve, rng, c):
    S = SimpleScalar(curve.order)
    B = 32
    scalars = [rng.randrange(curve.order) for _ in range(B)]
    scalars[:2] = [0, curve.order - 1]
    u = jnp.asarray(S.pack(scalars))
    K = -(-(S.bits + 1) // c)
    mags, signs = jax.jit(lambda x: signed_digits(x, c, K, S.w))(u)
    mags, signs = mags.tolist(), signs.tolist()
    for i in range(B):
        v = sum(
            ((-mags[k][i] if signs[k][i] else mags[k][i]) << (k * c)) for k in range(K)
        )
        assert v == scalars[i]
        assert all(0 <= mags[k][i] <= 1 << (c - 1) for k in range(K))


def test_signed_digits_scalar_sign(curve, rng):
    """Global sign flag flips the represented value."""
    S = SimpleScalar(curve.order)
    scalars = [rng.randrange(1, curve.order) for _ in range(8)]
    u = jnp.asarray(S.pack(scalars))
    c, K = 13, -(-(S.bits + 1) // 13)
    flag = jnp.ones(8, dtype=jnp.int32)
    mags, signs = signed_digits(u, c, K, S.w, scalar_sign=flag)
    mags, signs = mags.tolist(), signs.tolist()
    for i in range(8):
        v = sum(
            ((-mags[k][i] if signs[k][i] else mags[k][i]) << (k * c)) for k in range(K)
        )
        assert v == -scalars[i]


def test_extract_bits(rng):
    scheme = L.LimbScheme(12, 22)
    vals = [rng.getrandbits(253) for _ in range(16)]
    arr = jnp.asarray(L.pack(vals, scheme))
    for offset, count in [(0, 13), (5, 13), (11, 16), (120, 25), (250, 13)]:
        got = L.extract_bits(arr, offset, count, 12).tolist()
        want = [(v >> offset) & ((1 << count) - 1) for v in vals]
        assert got == want, (offset, count)


def test_glv_special_decompose(rng):
    """glvSpecial track: Barrett-divide decomposition s = u0 + lambda*u1
    (`src/wasm/glv.ts:248-411`) + the NAF-friendly no-MSB variant."""
    import jax.numpy as jnp

    from msm_zprize_tpu.curves.params import BLS12_377
    from msm_zprize_tpu.fields.scalar import GlvScalarSpecial

    q = BLS12_377.order
    # the curve stores the conjugate eigenvalue; glvSpecial divides by the
    # ~sqrt(q)-sized one
    lam = min(BLS12_377.lambda_, q - BLS12_377.lambda_)
    S = GlvScalarSpecial(q, lam, 12)
    scalars = [rng.randrange(q) for _ in range(32)]
    scalars[:4] = [0, 1, lam - 1, q - 1]
    s = jnp.asarray(S.pack(scalars))

    u0, u1 = S.decompose(s)
    h = __import__("msm_zprize_tpu.fields.limbs", fromlist=["unpack"])
    from msm_zprize_tpu.fields.limbs import LimbScheme, unpack

    sch = LimbScheme(12, S.n_half)
    a0, a1 = unpack(u0, sch), unpack(u1, sch)
    for sc, x0, x1 in zip(scalars, a0, a1):
        assert x0 + lam * x1 == sc
        assert x0 < lam

    g, u0, u1 = S.decompose_no_msb(s)
    a0, a1 = unpack(u0, sch), unpack(u1, sch)
    import numpy as np

    gs = np.asarray(g)
    for sc, sg, x0, x1 in zip(scalars, gs, a0, a1):
        assert (-x0 if sg else x0) + lam * x1 == sc
        assert x0 < 1 << (S.half_bits - 1)


def test_glv_special_msm_end_to_end(rng):
    """glvSpecial as a FLAGSHIP-MSM consumer (VERDICT r3 #10): the Barrett-
    division decomposition (lambda ~ sqrt(q), BLS12-381's z^2-1 trick,
    `src/concrete/bls12-381.params.ts:24-30`) drives msm_batched_affine end
    to end vs the oracle, via the GlvScalar-compatible adapter."""
    from msm_zprize_tpu.bigint.msm import msm as msm_oracle
    from msm_zprize_tpu.curves.weierstrass import WeierstrassOps
    from msm_zprize_tpu.fields.scalar import GlvScalarSpecialMsm
    from msm_zprize_tpu.msm.batched_affine import msm_batched_affine
    from msm_zprize_tpu.parallel.api import Weierstrass

    curve = Weierstrass.create(BLS12_381)
    S = GlvScalarSpecialMsm(BLS12_381.order, BLS12_381.lambda_)
    N = 8
    A, C = curve.oracle_affine, curve.oracle_projective
    pts = [A.random(rng) for _ in range(N)]
    scs = [rng.randrange(BLS12_381.order) for _ in range(N)]
    scs[:2] = [0, BLS12_381.order - 1]
    s = jnp.asarray(S.pack(scs))
    p = curve.points_from_ints(pts)
    res = jax.jit(
        lambda ss, px, py, pinf: tuple(
            msm_batched_affine(
                curve.ops, S, ss,
                type(p)(px, py, pinf), c=6, mode="projective",
            )
        )
    )(s, p.x, p.y, p.inf)
    from msm_zprize_tpu.curves.weierstrass import ProjectivePoints

    got = curve.result_to_int(ProjectivePoints(*res))
    want = C.to_affine(msm_oracle(C, scs, [C.from_affine(q) for q in pts], 255))
    assert got == want
