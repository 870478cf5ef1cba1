"""Integer-model tests of the padded bucket engine's index pipeline.

Replaces curve arithmetic with plain integer addition so the engine's
sort / spread / slot-layout / sign-routing logic is checked exhaustively in
milliseconds (a sign-routing bug here once survived the curve-level tests
because the CPU default mode doesn't exercise the padded engine).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import msm_zprize_tpu.msm.engine as E


def _run_engine(digits, signs, point_vals, L, use_l1, window_chunks=1):
    def pair_add(a, b):
        return tuple(x + y for x, y in zip(a, b))

    def prepare(leaves, sg, valid):
        (v,) = leaves
        sv = jnp.where(sg, -v, v)
        return (jnp.where(valid, sv, 0),)

    def pair_level1(a, b, sa, sb, va, vb):
        (x,) = prepare(a, sa, va)
        (y,) = prepare(b, sb, vb)
        return (x + y,)

    def zero_like(K_, L_):
        return (jnp.zeros((K_, L_), jnp.int32),)

    out = E.accumulate_buckets_padded(
        (jnp.asarray(point_vals),),
        jnp.asarray(digits),
        jnp.asarray(signs),
        L,
        pair_add,
        prepare,
        zero_like,
        pair_level1=pair_level1 if use_l1 else None,
        window_chunks=window_chunks,
    )
    return np.asarray(out[0]).astype(np.int64)


def _oracle(digits, signs, point_vals, L):
    K, B = digits.shape
    want = np.zeros((K, L), np.int64)
    for k in range(K):
        for i in range(B):
            if digits[k, i] == 0:
                continue
            want[k, digits[k, i] - 1] += (
                -1 if signs[k, i] else 1
            ) * int(point_vals[i])
    return want


@pytest.mark.parametrize("use_l1", [False, True])
@pytest.mark.parametrize(
    "K,B,L,dist",
    [
        (2, 16, 8, "uniform"),
        (3, 64, 8, "uniform"),
        (2, 64, 16, "all_equal"),   # every point in ONE bucket: residual rounds
        (2, 64, 16, "top_heavy"),   # tiny digit range: spreading kicks in
        (1, 32, 32, "sparse"),      # mostly zero digits
    ],
)
def test_padded_engine_integer_model(K, B, L, dist, use_l1):
    rng = np.random.default_rng(hash((K, B, L, dist)) % 2**32)
    if dist == "uniform":
        digits = rng.integers(0, L + 1, (K, B))
    elif dist == "all_equal":
        digits = np.full((K, B), 3)
    elif dist == "top_heavy":
        digits = rng.integers(0, 3, (K, B))
    else:
        digits = np.where(rng.random((K, B)) < 0.8, 0, rng.integers(1, L + 1, (K, B)))
    digits = digits.astype(np.int32)
    signs = rng.integers(0, 2, (K, B)).astype(np.int32)
    signs = np.where(digits == 0, 0, signs).astype(np.int32)
    point_vals = rng.integers(1, 1000, (B,)).astype(np.int32)

    got = _run_engine(digits, signs, point_vals, L, use_l1)
    want = _oracle(digits, signs, point_vals, L)
    assert np.array_equal(got, want), (got, want)


@pytest.mark.parametrize("use_l1", [False, True])
@pytest.mark.parametrize("chunks", [2, 3])
def test_padded_engine_window_chunks(use_l1, chunks):
    """Window-streamed accumulation (lax.scan over chunks, incl. a chunk
    count that does not divide K) matches the one-shot path."""
    K, B, L = 5, 64, 16
    rng = np.random.default_rng(7)
    digits = rng.integers(0, L + 1, (K, B)).astype(np.int32)
    signs = rng.integers(0, 2, (K, B)).astype(np.int32)
    point_vals = rng.integers(1, 1000, (B,)).astype(np.int32)
    got = _run_engine(digits, signs, point_vals, L, use_l1, window_chunks=chunks)
    want = _oracle(digits, signs, point_vals, L)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("use_l1", [False, True])
def test_padded_engine_large_b_payload_path(use_l1):
    """Force the two-operand-sort (payload) branch by making the packed-key
    bit budget overflow: id_bits(21) + 1 + pos_bits(10) = 32 > 31."""
    K, B, L = 2, 1024, 1 << 20
    rng = np.random.default_rng(5)
    # digits concentrated so the data is non-trivial but small
    digits = rng.integers(0, L + 1, (K, B)).astype(np.int32)
    signs = rng.integers(0, 2, (K, B)).astype(np.int32)
    point_vals = rng.integers(1, 1000, (B,)).astype(np.int32)
    got = _run_engine(digits, signs, point_vals, L, use_l1)
    want = _oracle(digits, signs, point_vals, L)
    assert np.array_equal(got, want)
