"""Byte codec, device sqrt, and the compute_msm submission API."""

import numpy as np
import pytest

from msm_zprize_tpu.curves.params import BLS12_377, PALLAS
from msm_zprize_tpu.fields.bytes_codec import (
    bytes_to_ints,
    bytes_to_limbs,
    ints_to_bytes,
    limbs_to_bytes,
    random_uniform_limbs,
)
from msm_zprize_tpu.fields.fp import make_field
from msm_zprize_tpu.fields.limbs import LimbScheme


def test_bytes_limbs_roundtrip(rng):
    scheme = LimbScheme(12, 32)
    nbytes = 48
    vals = [rng.randrange(1 << 377) for _ in range(64)] + [0, 1, (1 << 377) - 1]
    data = ints_to_bytes(vals, nbytes)
    limbs = bytes_to_limbs(data, scheme)
    assert bytes_to_ints(limbs_to_bytes(limbs, scheme, nbytes)) == vals
    # matches the per-int packer
    import msm_zprize_tpu.fields.limbs as L

    assert np.array_equal(limbs, L.pack(vals, scheme))


def test_random_uniform_limbs():
    scheme = LimbScheme(12, 22)
    q = BLS12_377.order
    out = random_uniform_limbs(np.random.default_rng(0), q, 257, scheme)
    import msm_zprize_tpu.fields.limbs as L

    vals = L.unpack(np.asarray(out), scheme)
    assert len(vals) == 257 and all(0 <= v < q for v in vals)
    # deterministic per seed, differs across seeds
    out2 = random_uniform_limbs(np.random.default_rng(0), q, 257, scheme)
    assert np.array_equal(out, out2)
    out3 = random_uniform_limbs(np.random.default_rng(1), q, 257, scheme)
    assert not np.array_equal(out, out3)


@pytest.mark.parametrize("p", [PALLAS.modulus, (1 << 31) - 1], ids=["pallas", "m31"])
def test_sqrt(p, rng):
    from msm_zprize_tpu.fields.sqrt import make_sqrt

    S = make_sqrt(p)
    F = S.F
    import jax.numpy as jnp

    squares = [rng.randrange(p) ** 2 % p for _ in range(8)]
    x = jnp.asarray(F.pack(squares))
    root, ok = S.sqrt(x)
    got = F.unpack(root)
    assert ok.tolist() == [True] * 8
    assert all(g * g % p == v for g, v in zip(got, squares))
    assert S.is_square(x).tolist() == [True] * 8
    # non-residues flagged
    z = S.z
    nonsq = [v * z % p for v in squares if v != 0][:4]
    xn = jnp.asarray(F.pack(nonsq))
    _, okn = S.sqrt(xn)
    assert okn.tolist() == [False] * len(nonsq)
    assert S.is_square(xn).tolist() == [False] * len(nonsq)
    # sqrt(0) = 0
    r0, ok0 = S.sqrt(jnp.asarray(F.pack([0])))
    assert ok0.tolist() == [True] and F.unpack(r0) == [0]


def test_compute_msm(rng):
    from msm_zprize_tpu.bigint.msm import msm as msm_oracle
    from msm_zprize_tpu.parallel.api import Weierstrass
    from msm_zprize_tpu.submission import compute_msm

    curve = Weierstrass.create(BLS12_377)
    A, C = curve.oracle_affine, curve.oracle_projective
    pts = [A.random(rng) for _ in range(6)]
    scs = [rng.randrange(BLS12_377.order) for _ in range(6)]
    want = C.to_affine(msm_oracle(C, scs, [C.from_affine(p) for p in pts], 253))
    assert compute_msm(pts, scs) == want
    # duplicated points route through the safe path
    want2 = C.to_affine(msm_oracle(C, [3, 5], [C.from_affine(pts[0])] * 2, 253))
    assert compute_msm([pts[0], pts[0]], [3, 5]) == want2
    # bytes encoding
    nb = 48
    pts_b = [(int(x).to_bytes(nb, "little"), int(y).to_bytes(nb, "little")) for x, y in pts]
    scs_b = [int(s).to_bytes(32, "little") for s in scs]
    assert compute_msm(pts_b, scs_b) == want
