"""Vectorized field engine vs bigint oracle — differential tests.

Mirrors the reference's `src/field.test.ts` strategy: random vectors
(including unreduced [0,2p) inputs), compare every op bit-exactly against
Python-int semantics after reduction.
"""

import random

import jax
import jax.numpy as jnp
import pytest

from msm_zprize_tpu.curves.params import BLS12_377, BLS12_381, PALLAS
from msm_zprize_tpu.fields.fp import make_field

MODULI = {
    "bls12-377 Fp": BLS12_377.modulus,
    "bls12-381 Fp": BLS12_381.modulus,
    "pallas Fp": PALLAS.modulus,
    "bls12-377 Fq": BLS12_377.order,
}

B = 32


def _rand_unreduced(F, rng, count=B, factor=2):
    """Random values in [0, factor*p) packed WITHOUT montgomery scaling —
    tests the unreduced-representative handling."""
    vals = [rng.randrange(factor * F.p) for _ in range(count)]
    import msm_zprize_tpu.fields.limbs as L

    return vals, jnp.asarray(L.pack(vals, F.scheme))


@pytest.fixture(params=list(MODULI), ids=list(MODULI))
def F(request):
    return make_field(MODULI[request.param])


def test_pack_roundtrip(F, rng):
    vals = [rng.randrange(F.p) for _ in range(B)] + [0, 1, F.p - 1]
    arr = F.pack(vals)
    assert F.unpack(arr) == vals


def test_add_sub_mul(F, rng):
    p = F.p
    a = [rng.randrange(p) for _ in range(B)]
    b = [rng.randrange(p) for _ in range(B)]
    xa, xb = jnp.asarray(F.pack(a)), jnp.asarray(F.pack(b))
    assert F.unpack(jax.jit(F.add)(xa, xb)) == [(u + v) % p for u, v in zip(a, b)]
    assert F.unpack(jax.jit(F.sub)(xa, xb)) == [(u - v) % p for u, v in zip(a, b)]
    assert F.unpack(jax.jit(F.montmul)(xa, xb)) == [u * v % p for u, v in zip(a, b)]
    assert F.unpack(jax.jit(F.montsquare)(xa)) == [u * u % p for u in a]
    assert F.unpack(jax.jit(F.neg)(xa)) == [(-u) % p for u in a]


def test_unreduced_closure(F, rng):
    """Values in [0,2p) (any representative) flow through mul/add correctly,
    and sub_positive outputs in [0,4p) are valid mul inputs."""
    p = F.p
    vals_a, xa = _rand_unreduced(F, rng)
    vals_b, xb = _rand_unreduced(F, rng)
    prod = F.unpack(F.montmul(xa, xb), montgomery=False)
    rinv = pow(F.R, -1, p)
    assert prod == [u * v * rinv % p for u, v in zip(vals_a, vals_b)]
    sp = F.sub_positive(xa, xb)
    got = F.unpack(F.montmul(sp, xb), montgomery=False)
    assert got == [(u - v) * v * rinv % p for u, v in zip(vals_a, vals_b)]


def test_reduce_and_predicates(F, rng):
    p = F.p
    vals, x = _rand_unreduced(F, rng)
    assert F.unpack(F.reduce(x), montgomery=False, reduce=False) == [v % p for v in vals]
    # is_zero on p (the nontrivial representative of 0)
    zero_reps = jnp.asarray(F.pack([0, p, 1, p - 1], montgomery=False))
    assert jax.jit(F.is_zero)(zero_reps).tolist() == [True, True, False, False]
    # is_equal across representatives: v vs v+p
    vals2 = [(v + p) for v in [v % p for v in vals[:8]]]
    ya = jnp.asarray(F.pack([v % p for v in vals[:8]], montgomery=False))
    yb = jnp.asarray(F.pack(vals2, montgomery=False))
    assert jax.jit(F.is_equal)(ya, yb).tolist() == [True] * 8


def test_exp_and_inverse(F, rng):
    if F.p not in (BLS12_377.modulus, PALLAS.modulus):
        pytest.skip("expensive scan-compile; covered by two representative moduli")
    p = F.p
    a = [rng.randrange(1, p) for _ in range(8)]
    xa = jnp.asarray(F.pack(a))
    e = rng.randrange(1 << 48)
    assert F.unpack(jax.jit(lambda x: F.exp_const(x, e))(xa)) == [pow(u, e, p) for u in a]
    inv = F.unpack(jax.jit(F.inverse)(xa))
    assert all(u * v % p == 1 for u, v in zip(a, inv))


@pytest.mark.parametrize("size", [5, 64])
def test_batch_inverse(F, rng, size):
    if F.p not in (BLS12_377.modulus, PALLAS.modulus):
        pytest.skip("expensive scan-compile; covered by two representative moduli")
    p = F.p
    a = [rng.randrange(1, p) for _ in range(size)]
    xa = jnp.asarray(F.pack(a))
    inv = F.unpack(jax.jit(lambda x: F.batch_inverse(x, rows=4))(xa))
    assert all(u * v % p == 1 for u, v in zip(a, inv))


def test_montgomery_conversion(F, rng):
    vals = [rng.randrange(F.p) for _ in range(B)]
    raw = jnp.asarray(F.pack(vals, montgomery=False))
    mont = F.to_montgomery(raw)
    assert F.unpack(mont, montgomery=True) == vals
    back = F.from_montgomery(mont)
    assert F.unpack(back, montgomery=False) == vals


# ---- full example-field matrix (reference: `src/field.test.ts:15-25` runs
# every example field x w in {26..31}; here every EXAMPLE_FIELD x the
# production w=12 and one alternate w=11 — the int32 engine's carry budget
# caps w well below the reference's 64-bit-accumulator range) ---------------

from msm_zprize_tpu.curves.example_fields import EXAMPLE_FIELDS


@pytest.mark.parametrize("w", [12, 11])
@pytest.mark.parametrize("name", list(EXAMPLE_FIELDS), ids=list(EXAMPLE_FIELDS))
def test_field_matrix(name, w, rng):
    """Differential core-op suite (mul/square/add/sub/neg/reduce/predicates,
    unreduced [0,2p) closure, montgomery round-trip) on the PRODUCTION
    engine across the full example-field matrix, including the 64-bit
    goldilocks and 31-bit babybear edge schemes."""
    p = EXAMPLE_FIELDS[name]
    F = make_field(p, w)
    a = [rng.randrange(p) for _ in range(B)]
    b = [rng.randrange(p) for _ in range(B)]
    xa, xb = jnp.asarray(F.pack(a)), jnp.asarray(F.pack(b))
    assert F.unpack(F.add(xa, xb)) == [(u + v) % p for u, v in zip(a, b)]
    assert F.unpack(F.sub(xa, xb)) == [(u - v) % p for u, v in zip(a, b)]
    assert F.unpack(F.montmul(xa, xb)) == [u * v % p for u, v in zip(a, b)]
    assert F.unpack(F.montsquare(xa)) == [u * u % p for u in a]
    assert F.unpack(F.neg(xa)) == [(-u) % p for u in a]
    # unreduced [0,2p) inputs stay correct through mul
    vals_u, xu = _rand_unreduced(F, rng, count=8)
    rinv = pow(F.R, -1, p)
    got = F.unpack(F.montmul(xu, xu), montgomery=False)
    assert got == [u * u * rinv % p for u in vals_u]
    # reduce + predicates
    assert F.unpack(F.reduce(xu), montgomery=False, reduce=False) == [
        v % p for v in vals_u
    ]
    reps = jnp.asarray(F.pack([0, p, 1], montgomery=False))
    assert F.is_zero(reps).tolist() == [True, True, False]
    # montgomery round-trip
    raw = jnp.asarray(F.pack(a[:8], montgomery=False))
    assert F.unpack(F.from_montgomery(F.to_montgomery(raw)), montgomery=False) == a[:8]
