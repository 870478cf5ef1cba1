"""Differential-equivalence harness — analog of `src/testing/equivalent.ts`
+ `equivalent-wasm.ts`: run a bigint reference function and a device (JAX
limb-array) implementation on the same random inputs, map values through
``there``/``back`` codecs, compare deep-equal, and require BOTH sides to
throw together (`handleErrors`, `equivalent.ts:240-268`).

A ``Spec`` pairs a generator with the there/back codecs. ``field_spec``
covers the pointer-convention analog of `WasmSpec` (`equivalent-wasm.ts:
97-147`): there = pack ints into (n, B) Montgomery limb arrays, back =
unpack and un-Montgomery.
"""

from __future__ import annotations

import random as _random
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np

from .property import MAX_RUNS, MIN_RUNS, test_property
from .random_gen import Random

__all__ = ["Spec", "equivalent", "field_spec", "scalar_spec", "id_spec"]


@dataclass
class Spec:
    rng: Random | None  # None for output-only specs
    there: Callable[[Any], Any]  # bigint world -> device world
    back: Callable[[Any], Any]  # device world -> bigint world


def id_spec(rng: Random | None = None) -> Spec:
    return Spec(rng, lambda v: v, lambda v: v)


def field_spec(F, rng: Random | None = None, montgomery: bool = True, batch: int = 1) -> Spec:
    """Values cross as (n, batch) limb arrays (all lanes the same value —
    a batched impl must be exact in every lane)."""
    import jax.numpy as jnp

    def there(v: int):
        return jnp.asarray(F.pack([v] * batch, montgomery=montgomery))

    def back(arr) -> int:
        vals = F.unpack(arr, montgomery=montgomery)
        assert all(v == vals[0] for v in vals), f"lanes disagree: {vals}"
        return vals[0]

    return Spec(rng, there, back)


def scalar_spec(S, rng: Random | None = None, batch: int = 1) -> Spec:
    import jax.numpy as jnp

    def there(v: int):
        return jnp.asarray(S.pack([v] * batch))

    def back(arr) -> int:
        vals = S.unpack(np.asarray(arr))
        assert all(v == vals[0] for v in vals), f"lanes disagree: {vals}"
        return vals[0]

    return Spec(rng, there, back)


def equivalent(
    *,
    frm: list[Spec],
    to: Spec,
    seed: int = 0,
    min_runs: int = MIN_RUNS,
    max_runs: int = MAX_RUNS,
    label: str = "",
):
    """equivalent(frm=[specs], to=spec)(f_ref, f_impl): property-test that
    ``to.back(f_impl(*there(xs))) == f_ref(*xs)``, with matching-error
    semantics: if the reference throws, the impl must throw too."""

    def run(f_ref, f_impl):
        gens = [s.rng for s in frm]
        assert all(g is not None for g in gens), "input specs need generators"

        @test_property(*gens, seed=seed, min_runs=min_runs, max_runs=max_runs)
        def prop(*xs):
            ref_err = None
            try:
                want = f_ref(*xs)
            except (AssertionError, ValueError, ZeroDivisionError, ArithmeticError) as e:
                ref_err = e
            args = [s.there(x) for s, x in zip(frm, xs)]
            if ref_err is not None:
                try:
                    f_impl(*args)
                except Exception:
                    return  # both threw: OK
                raise AssertionError(
                    f"{label}: reference threw ({ref_err!r}) but impl succeeded"
                )
            got = to.back(f_impl(*args))
            assert got == want, f"{label}: {got} != {want}"

        return prop

    return run
