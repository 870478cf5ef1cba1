"""Oracle field axioms, mirroring `src/bigint/field.test.ts` coverage."""

import pytest

from msm_zprize_tpu.bigint import field as F
from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, ED_ON_BLS12_377, PALLAS

# test matrix analogous to the reference's example-fields list
MODULI = {
    "bls12-377 Fp": BLS12_377.modulus,
    "bls12-377 Fq": BLS12_377.order,
    "bls12-381 Fp": BLS12_381.modulus,
    "bls12-381 Fq": BLS12_381.order,
    "pallas Fp": PALLAS.modulus,
    "pallas Fq": PALLAS.order,
    "ed377 Fq": ED_ON_BLS12_377.order,
    "secp256k1": 2**256 - 2**32 - 977,
    "curve25519": 2**255 - 19,
    "goldilocks": 2**64 - 2**32 + 1,
    "babybear": 15 * 2**27 + 1,
}


@pytest.mark.parametrize("name", MODULI)
def test_field_axioms(name, rng):
    p = MODULI[name]
    for _ in range(20):
        a, b, c = (F.random_field(p, rng) for _ in range(3))
        assert (a + b) % p == (b + a) % p
        assert ((a + b) + c) % p == (a + (b + c)) % p
        assert a * b % p == b * a % p
        assert (a * b % p) * c % p == a * (b * c % p) % p
        assert a * ((b + c) % p) % p == (a * b + a * c) % p
        if a != 0:
            ai = F.inverse(a, p)
            assert a * ai % p == 1
        e = F.field_exp(a, 5, p)
        assert e == a * a % p * a % p * a % p * a % p


@pytest.mark.parametrize("name", MODULI)
def test_sqrt(name, rng):
    p = MODULI[name]
    squares = 0
    for _ in range(20):
        a = F.random_field(p, rng)
        s = a * a % p
        r = F.sqrt(s, p)
        assert r is not None and r * r % p == s
        if not F.is_square(a, p):
            assert F.sqrt(a, p) is None
        else:
            squares += 1
    assert F.sqrt(0, p) == 0


def test_inverse_of_zero_raises():
    with pytest.raises(ZeroDivisionError):
        F.inverse(0, BLS12_377.modulus)


@pytest.mark.parametrize("name", MODULI)
def test_roots_of_unity(name):
    p = MODULI[name]
    roots = F.roots_of_unity(p)
    S, _ = F.two_adicity(p)
    assert len(roots) == S
    # last entry is a primitive square root of unity == -1
    assert roots[-1] == p - 1


def test_montgomery_params():
    mp = F.montgomery_params(BLS12_377.modulus, 12)
    assert mp.n * mp.w == mp.K
    assert mp.R > 4 * mp.p
    # mu * p ≡ -1 mod 2^w
    assert (mp.p_inv_neg * mp.p + 1) % (1 << mp.w) == 0
    # limb round trip
    x = BLS12_377.modulus - 12345
    assert F.from_limbs(F.to_limbs(x, mp.w, mp.n), mp.w) == x
