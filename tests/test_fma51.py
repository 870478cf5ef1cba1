"""51x5 float-limb field track vs the bigint oracle (SURVEY.md §2.3).

Mirrors the reference's 51x5 test style (`src/51x5/fma.test.ts`,
`fma-js.test.ts`): exact equivalence of the radix-2^51 Montgomery multiply
against plain bigint math on random inputs, including the unreduced [0, 2p)
domain, plus exact float64 <-> int64 storage roundtrips.
"""

import jax
import pytest

from msm_zprize_tpu.bigint.field import random_field
from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, PALLAS
from msm_zprize_tpu.fields.fma51 import make_fma51_field

# fields < 2^255 - 2^206: pallas base field and bls12-381 scalar field run
# strict (p >= 2^253); bls12-377 scalar field (~2^252.4) runs lazy
FIELDS = {
    "pallas-fp": PALLAS.modulus,
    "bls381-fq": BLS12_381.order,
    "bls377-fq": BLS12_377.order,
}


@pytest.fixture(autouse=True)
def _x64():
    with jax.enable_x64(True):
        yield


@pytest.mark.parametrize("name", FIELDS)
def test_montmul_vs_oracle(name, rng):
    p = FIELDS[name]
    F = make_fma51_field(p)
    B = 32
    xs = [random_field(p, rng) for _ in range(B)]
    ys = [random_field(p, rng) for _ in range(B)]
    out = F.unpack(F.montmul(F.pack(xs), F.pack(ys)))
    assert out == [x * y % p for x, y in zip(xs, ys)]


@pytest.mark.parametrize("name", ["bls377-fq"])
def test_montmul_unreduced_domain(name, rng):
    """Inputs in [0, 2p) (lazy-reduction closure, `doc/zprize22.md:195`) —
    lazy mode only (p < 2^253); pasta-sized p runs strict/canonical."""
    p = FIELDS[name]
    F = make_fma51_field(p)
    assert F.lazy
    R_inv = pow(F.R, -1, p)
    B = 16
    xs = [rng.randrange(2 * p) for _ in range(B)]
    ys = [rng.randrange(2 * p) for _ in range(B)]
    out = F.unpack(
        F.montmul(F.pack(xs, montgomery=False), F.pack(ys, montgomery=False)),
        montgomery=False,
    )
    assert out == [x * y * R_inv % p for x, y in zip(xs, ys)]


def test_add_sub_reduce(rng):
    p = FIELDS["pallas-fp"]
    F = make_fma51_field(p)
    B = 24
    xs = [random_field(p, rng) for _ in range(B)]
    ys = [random_field(p, rng) for _ in range(B)]
    X, Y = F.pack(xs, montgomery=False), F.pack(ys, montgomery=False)
    assert F.unpack(F.add(X, Y), montgomery=False) == [(x + y) % p for x, y in zip(xs, ys)]
    assert F.unpack(F.sub(X, Y), montgomery=False) == [(x - y) % p for x, y in zip(xs, ys)]
    assert F.unpack(F.reduce(F.add(X, Y)), montgomery=False) == [
        (x + y) % p for x, y in zip(xs, ys)
    ]


def test_f64_storage_roundtrip_and_mul(rng):
    """float64 limb storage is exact (< 2^52) and mul works through it,
    mirroring int64ToFloat52/float52ToInt64 (`src/51x5/common.ts`)."""
    p = FIELDS["bls381-fq"]
    F = make_fma51_field(p)
    xs = [random_field(p, rng) for _ in range(8)]
    ys = [random_field(p, rng) for _ in range(8)]
    Xf = F.to_f64(F.pack(xs))
    Yf = F.to_f64(F.pack(ys))
    assert F.unpack(F.from_f64(Xf)) == xs
    out = F.unpack(F.from_f64(F.montmul_f64(Xf, Yf)))
    assert out == [x * y % p for x, y in zip(xs, ys)]


def test_montgomery_form_roundtrip(rng):
    p = FIELDS["pallas-fp"]
    F = make_fma51_field(p)
    xs = [random_field(p, rng) for _ in range(8)]
    X = F.pack(xs, montgomery=False)
    Xm = F.to_montgomery(X)
    assert F.unpack(Xm) == xs
    assert F.unpack(F.from_montgomery(Xm), montgomery=False) == xs


def test_fma_float_model_vs_int(rng):
    """The exact f64-FMA algebra model (`montmul_fma_model`, mirroring the
    reference's montmulFma, `fma-js.ts:141-193`) agrees with integer
    Montgomery semantics — including the bit-reinterpretation and zInitial
    prefix-cancellation steps."""
    from msm_zprize_tpu.fields.fma51 import montmul_fma_model

    R = 1 << 255
    for name, p in FIELDS.items():
        lim = p if p >= (1 << 253) else 2 * p  # strict vs lazy input domain
        if p * (R + lim * lim // p) // R >= R:
            # output bound p + lim^2/R must fit 255 bits for the float
            # model's final carry===0 invariant (bls12-381 Fq at 2^254.86
            # does not; the int track covers it via its overflow-bit path)
            continue
        r_inv = pow(R, -1, p)
        for _ in range(25):
            x = rng.randrange(lim)
            y = rng.randrange(lim)
            z = montmul_fma_model(p, x, y)
            assert z % p == x * y * r_inv % p, name
