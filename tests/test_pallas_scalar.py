"""Cross-check the fused Pallas scalar-prep kernel against the jnp path.

The kernel (`fields/pallas_scalar.py`) reimplements GlvScalar.decompose +
signed_digits with the SAME algorithm; outputs must match bit-exactly.
Runs in interpret mode so it validates on the CPU test host.
"""

import random

import jax.numpy as jnp
import numpy as np

from msm_zprize_tpu.curves.params import BLS12_377, PALLAS
from msm_zprize_tpu.fields.pallas_scalar import glv_digits_pallas
from msm_zprize_tpu.fields.scalar import make_glv_scalar, signed_digits


def _check(params, c, N, seed):
    S = make_glv_scalar(params.order, params.lambda_, 12)
    rng = random.Random(seed)
    scalars = [rng.randrange(params.order) for _ in range(N)]
    # include edge scalars
    scalars[:4] = [0, 1, params.order - 1, params.order // 2]
    s = jnp.asarray(S.pack(scalars))

    K = -(-(S.max_bits + 1) // c)
    sg0, u0, sg1, u1 = S.decompose(s)
    m0, s0 = signed_digits(u0, c, K, S.w, scalar_sign=sg0)
    m1, s1 = signed_digits(u1, c, K, S.w, scalar_sign=sg1)
    want_m = jnp.concatenate([m0, m1], axis=-1)
    want_s = jnp.concatenate([s0, s1], axis=-1)

    got_m, got_s = glv_digits_pallas(S, s, c, K, interpret=True)
    assert np.array_equal(np.asarray(got_m), np.asarray(want_m))
    assert np.array_equal(np.asarray(got_s), np.asarray(want_s))


def test_glv_digits_pallas_bls377():
    _check(BLS12_377, 8, 64, 1)


def test_glv_digits_pallas_pallas_curve():
    _check(PALLAS, 6, 64, 2)


def test_simple_digits_pallas():
    """Non-GLV signed-digit kernel (Edwards scalar prep) vs the jnp path."""
    from msm_zprize_tpu.curves.params import ED_ON_BLS12_377
    from msm_zprize_tpu.fields.pallas_scalar import simple_digits_pallas
    from msm_zprize_tpu.fields.scalar import SimpleScalar

    S = SimpleScalar(ED_ON_BLS12_377.order, 12)
    rng = random.Random(6)
    scalars = [rng.randrange(S.q) for _ in range(64)]
    scalars[:3] = [0, 1, S.q - 1]
    s = jnp.asarray(S.pack(scalars))
    c, K = 7, -(-(S.bits + 1) // 7)
    want_m, want_s = signed_digits(s, c, K, S.w)
    got_m, got_s = simple_digits_pallas(s, c, K, interpret=True)
    assert np.array_equal(np.asarray(got_m), np.asarray(want_m))
    assert np.array_equal(np.asarray(got_s), np.asarray(want_s))
