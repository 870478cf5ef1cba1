"""Barrett reduction vs Python ints (`src/wasm/barrett.ts` parity)."""

import jax.numpy as jnp
import pytest

from msm_zprize_tpu.curves.params import BLS12_377, PALLAS
from msm_zprize_tpu.fields.barrett import BarrettReducer
from msm_zprize_tpu.fields.limbs import LimbScheme, pack, unpack

MODULI = {"bls377-fq": BLS12_377.order, "pallas-fp": PALLAS.modulus}


@pytest.mark.parametrize("name", MODULI)
def test_barrett_full_products(name, rng):
    """x < p^2 (the GLV use case: reduce a scalar product)."""
    p = MODULI[name]
    R = BarrettReducer(p)
    scheme2 = LimbScheme(R.w, 2 * R.n)
    xs = [rng.randrange(p * p) for _ in range(32)] + [0, p - 1, p, p + 1, p * p - 1]
    arr = jnp.asarray(pack(xs, scheme2))
    got = unpack(R.reduce(arr), R.scheme)
    assert got == [x % p for x in xs]


def test_barrett_small_inputs(rng):
    p = MODULI["bls377-fq"]
    R = BarrettReducer(p)
    xs = [rng.randrange(4 * p) for _ in range(16)]
    arr = jnp.asarray(pack(xs, LimbScheme(R.w, R.n + 1)))
    got = unpack(R.reduce(arr), R.scheme)
    assert got == [x % p for x in xs]
