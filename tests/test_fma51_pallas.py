"""51x5 device-track tests: codec roundtrips + Montgomery-mul kernel vs the
bigint ground truth (interpret mode — validates on the CPU host)."""

import random

import jax.numpy as jnp
import numpy as np

from msm_zprize_tpu.bigint.field import montgomery_params
from msm_zprize_tpu.curves.params import PALLAS
from msm_zprize_tpu.fields.fma51_pallas import Fma51Codec, montmul51_pallas
from msm_zprize_tpu.fields.pallas_field import FieldCtx

P = PALLAS.modulus
CODEC = Fma51Codec(P)
MP = montgomery_params(P, 12, 4)
CTX = FieldCtx(P, 12, MP.n)


def test_codec_roundtrip():
    rng = random.Random(1)
    vals = [rng.randrange(2 * P) for _ in range(16)] + [0, 1, P - 1, 2 * P - 1]
    arr = jnp.asarray(CODEC.pack(vals))
    assert CODEC.unpack(arr) == vals


def test_codec_digit_conversion():
    """pairs -> w-bit digits -> pairs is exact for values < 2p."""
    rng = random.Random(2)
    vals = [rng.randrange(2 * P) for _ in range(16)] + [0, 2 * P - 1]
    arr = jnp.asarray(CODEC.pack(vals))
    digits = CODEC.to_digits(CTX, arr)
    # digit reassembly equals the value
    got = [
        sum(int(digits[i, j]) << (12 * i) for i in range(CTX.n))
        for j in range(len(vals))
    ]
    assert got == vals
    back = CODEC.from_digits(CTX, digits, 2 * P - 1)
    assert CODEC.unpack(back) == vals


def test_montmul51_vs_bigint():
    """Kernel (interpret) vs ground-truth Montgomery product at the digit
    engine's radix R = 2^(12 n); inputs/outputs in [0, 2p) pair layout."""
    rng = random.Random(3)
    R = 1 << (12 * CTX.n)
    r_inv = pow(R, -1, P)
    xs = [rng.randrange(2 * P) for _ in range(8)] + [0, 1, P, 2 * P - 1]
    ys = [rng.randrange(2 * P) for _ in range(len(xs))]
    xa = jnp.asarray(CODEC.pack(xs))
    ya = jnp.asarray(CODEC.pack(ys))
    out = montmul51_pallas(P, xa, ya, interpret=True)
    got = CODEC.unpack(out)
    for g, x, y in zip(got, xs, ys):
        assert 0 <= g < 2 * P
        assert g % P == (x * y * r_inv) % P


def test_montmul51_matches_cpu_fma51_semantics():
    """Value-level agreement with the CPU 51x5 engine (`fields/fma51.py`):
    both compute a Montgomery product; radices differ (2^255 vs 2^264), so
    compare after stripping each engine's own R."""
    import jax

    from msm_zprize_tpu.fields.fma51 import make_fma51_field

    F51 = make_fma51_field(P)
    rng = random.Random(4)
    xs = [rng.randrange(P) for _ in range(4)]
    ys = [rng.randrange(P) for _ in range(4)]

    with jax.enable_x64(True):
        cpu = F51.unpack(
            F51.montmul(
                F51.pack(xs, montgomery=False), F51.pack(ys, montgomery=False)
            ),
            montgomery=False,
        )
    R51_inv = pow(F51.R, -1, P)

    dev = CODEC.unpack(
        montmul51_pallas(P, jnp.asarray(CODEC.pack(xs)), jnp.asarray(CODEC.pack(ys)), interpret=True)
    )
    R12_inv = pow(1 << (12 * CTX.n), -1, P)
    for c, d, x, y in zip(cpu, dev, xs, ys):
        assert c % P == (x * y * R51_inv) % P
        assert d % P == (x * y * R12_inv) % P
