"""Native C++ codec vs numpy fallback vs Python ints (ground truth).

The native tier (`native/codec.cpp`) must agree bit-for-bit with the numpy
codec on the byte <-> limb conversions and the rejection bound filter —
mirroring the reference's packed-bytes roundtrip tests
(`src/field.test.ts` fromPackedBytes/toPackedBytes coverage).
"""

import numpy as np
import pytest

from msm_zprize_tpu.curves.params import BLS12_377
from msm_zprize_tpu.fields import bytes_codec as bc
from msm_zprize_tpu.fields.limbs import LimbScheme
from msm_zprize_tpu.utils import native_codec


def _numpy_bytes_to_limbs(data, scheme):
    out = np.zeros((scheme.n, data.shape[0]), dtype=np.int32)
    for i in range(scheme.n):
        lo_bit = scheme.w * i
        acc = np.zeros(data.shape[0], dtype=np.int64)
        for j in range(lo_bit // 8, min((lo_bit + scheme.w + 7) // 8, data.shape[1])):
            shift = 8 * j - lo_bit
            b = data[:, j].astype(np.int64)
            acc += (b << shift) if shift >= 0 else (b >> -shift)
        out[i] = (acc & scheme.mask).astype(np.int32)
    return out


@pytest.mark.parametrize("w,bits", [(12, 377), (12, 253), (29, 381), (30, 255)])
def test_native_matches_numpy_and_ints(w, bits, rng):
    scheme = LimbScheme(w, -(-bits // w))
    nbytes = (bits + 7) // 8
    B = 257  # odd size exercises thread chunking
    vals = [rng.randrange(1 << bits) for _ in range(B)]
    data = bc.ints_to_bytes(vals, nbytes)

    limbs = bc.bytes_to_limbs(data, scheme)  # native when available
    ref = _numpy_bytes_to_limbs(data, scheme)
    np.testing.assert_array_equal(limbs, ref)
    # ground truth through Python ints
    from msm_zprize_tpu.fields import limbs as L
    assert L.unpack(limbs, scheme) == [v & ((1 << scheme.bits) - 1) for v in vals]

    back = bc.limbs_to_bytes(limbs, scheme, nbytes)
    # values fit in scheme.bits >= bits, so the roundtrip is exact
    np.testing.assert_array_equal(back, data)


def test_below_bound_filter(rng):
    q = BLS12_377.order
    scheme = LimbScheme(12, -(-q.bit_length() // 12))
    B = 512
    vals = [rng.randrange(2 * q) % (1 << q.bit_length()) for _ in range(B)]
    limbs = np.zeros((scheme.n, B), dtype=np.int32)
    for j, v in enumerate(vals):
        limbs[:, j] = scheme.to_limbs(v)
    bound = np.array(scheme.to_limbs(q), dtype=np.int64)
    got = bc._less_than(limbs, bound)
    np.testing.assert_array_equal(got, np.array([v < q for v in vals]))


def test_native_lib_loaded():
    """On this image g++ exists, so the native tier must actually load."""
    assert native_codec.get_lib() is not None
