"""The testing library itself (property runner + generators + equivalence
harness, `msm_zprize_tpu.testing`) exercised across the example-field matrix
— the analog of the reference's `src/field.test.ts:15-25` loop over
`exampleFields` with `createEquivalentWasm` specs.

Runs the device field engine against bigint semantics on fields NOT covered
by test_field_ops (25519, secp256k1, goldilocks, babybear), including the
must-throw-together convention and the invalid-input generators.
"""

import pytest

from msm_zprize_tpu.curves.example_fields import EXAMPLE_FIELDS
from msm_zprize_tpu.fields.fp import make_field
from msm_zprize_tpu.testing import Random, equivalent, test_property
from msm_zprize_tpu.testing.equivalent import field_spec

EXTRA = ["ed25519-fp", "secp256k1-fp", "goldilocks", "babybear"]


@pytest.mark.parametrize("name", EXTRA)
def test_field_ops_equivalent(name):
    p = EXAMPLE_FIELDS[name]
    F = make_field(p)
    f = Random.field(p)
    spec = field_spec(F, f, batch=4)
    runs = dict(min_runs=8, max_runs=8)  # compile cost dominates; 8 random draws

    equivalent(frm=[spec, spec], to=spec, label=f"{name} mul", **runs)(
        lambda a, b: a * b % p, F.montmul
    )
    equivalent(frm=[spec, spec], to=spec, label=f"{name} add", **runs)(
        lambda a, b: (a + b) % p, F.add
    )
    equivalent(frm=[spec, spec], to=spec, label=f"{name} sub", **runs)(
        lambda a, b: (a - b) % p, F.sub
    )


def test_must_throw_together():
    """handleErrors analog: when the reference throws, the impl must too."""
    p = EXAMPLE_FIELDS["babybear"]
    F = make_field(p)
    spec = field_spec(F, Random.field(p))

    def ref_inv(a):
        return pow(a, -1, p)  # raises ValueError at a=0

    # F.inverse(0) silently returns 0 (callers mask), so the harness must
    # flag the asymmetry (reference throws, impl doesn't); test_property
    # wraps it with the failing inputs
    with pytest.raises(AssertionError, match="property failed"):
        equivalent(
            frm=[Spec0(spec)], to=spec, label="inv0", min_runs=1, max_runs=1
        )(ref_inv, F.inverse)


class Spec0:
    """Spec wrapper that always generates 0 (forcing the error path)."""

    def __init__(self, inner):
        self.rng = lambda rng: 0
        self.there = inner.there
        self.back = inner.back


def test_negative_property():
    """test.negative analog: property must FAIL for every sample."""
    p = EXAMPLE_FIELDS["goldilocks"]

    @test_property(Random.field(p).invalid, min_runs=10, max_runs=10, negative=True)
    def _(x):
        assert x < p  # invalid generator yields out-of-range values

    with pytest.raises(AssertionError):
        @test_property(Random.field(p), min_runs=10, max_runs=10, negative=True)
        def _(x):
            assert 0 <= x  # always holds -> negative test must raise


def test_generator_combinators(rng):
    g = Random.record(
        xs=Random.array(Random.biguint(16), 3),
        t=Random.tuple_(Random.constant(7), Random.int_range(1, 5)),
        e=Random.one_of(Random.constant("a"), Random.constant("b")),
    )
    v = g(rng)
    assert len(v["xs"]) == 3 and all(0 <= x < 65536 for x in v["xs"])
    assert v["t"][0] == 7 and 1 <= v["t"][1] < 5
    assert v["e"] in ("a", "b")
    sp = Random.special(97)
    vals = {sp(rng) for _ in range(200)}
    assert 0 in vals and 96 in vals  # edge bias hits boundaries
