"""Dense 31-bit-row storage codec (mode="packed"): roundtrips + Montgomery
kernel vs bigint, at the 377-bit field size the 51x5 layout cannot hold.

The packed layout is the MSM engine's minimum-bandwidth gather format
(13 int32 rows for BLS12-377 coordinates vs 32 native digit planes); the
small end-to-end MSM lives in tests/test_msm_sweep.py (mode sweep).
"""

import random

import jax.numpy as jnp

from msm_zprize_tpu.bigint.field import montgomery_params
from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.fields.fma51_pallas import PackedCodec, montmul51_pallas
from msm_zprize_tpu.fields.pallas_field import FieldCtx

P = BLS12_377.modulus
CODEC = PackedCodec(P)
MP = montgomery_params(P, 12, 4)
CTX = FieldCtx(P, 12, MP.n)


def test_packed_rows():
    # 377-bit modulus -> [0, 2p) needs 378 bits -> 13 rows of 31 bits
    assert CODEC.rows == 13
    assert CODEC.capacity_bits >= P.bit_length() + 1


def test_packed_roundtrip():
    rng = random.Random(1)
    vals = [rng.randrange(2 * P) for _ in range(16)] + [0, 1, P - 1, 2 * P - 1]
    arr = jnp.asarray(CODEC.pack(vals))
    assert CODEC.unpack(arr) == vals


def test_packed_digit_conversion():
    rng = random.Random(2)
    vals = [rng.randrange(2 * P) for _ in range(16)] + [0, 2 * P - 1]
    arr = jnp.asarray(CODEC.pack(vals))
    digits = CODEC.to_digits(CTX, arr)
    got = [
        sum(int(digits[i, j]) << (12 * i) for i in range(CTX.n))
        for j in range(len(vals))
    ]
    assert got == vals
    back = CODEC.from_digits(CTX, digits, 2 * P - 1)
    assert CODEC.unpack(back) == vals


def test_packed_montmul_vs_bigint():
    rng = random.Random(3)
    R = 1 << (12 * CTX.n)
    r_inv = pow(R, -1, P)
    xs = [rng.randrange(2 * P) for _ in range(8)] + [0, 1, P, 2 * P - 1]
    ys = [rng.randrange(2 * P) for _ in range(len(xs))]
    xa = jnp.asarray(CODEC.pack(xs))
    ya = jnp.asarray(CODEC.pack(ys))
    out = montmul51_pallas(P, xa, ya, interpret=True, codec=CODEC)
    got = CODEC.unpack(out)
    for g, x, y in zip(got, xs, ys):
        assert 0 <= g < 2 * P
        assert g % P == (x * y * r_inv) % P
