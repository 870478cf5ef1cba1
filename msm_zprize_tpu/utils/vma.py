"""Varying-mesh-axes helpers for shard_map's check_vma.

Under `jax.shard_map(..., check_vma=True)` every loop carry must have the
same varying-axes type as the loop body's output. Carries initialized from
replicated constants (zeros, Montgomery ones, identity points) inside a
shard-mapped function are replicated-typed and must be explicitly cast to
vary over the data's mesh axes. Both helpers are no-ops outside shard_map
(vma sets are empty there), so library code can use them unconditionally.
"""

from __future__ import annotations

import jax

__all__ = ["vma_of", "pvary_like"]


def vma_of(*arrays):
    """Union of varying-mesh-axes over arrays (empty outside shard_map)."""
    return frozenset().union(
        *(getattr(jax.typeof(a), "vma", frozenset()) for a in arrays)
    )


def pvary_like(x, vma):
    """Cast x (an array, tuple/list, or NamedTuple point) to vary over
    ``vma``; no-op for axes it already varies over or when vma is empty."""
    if isinstance(x, (tuple, list)):
        parts = (pvary_like(a, vma) for a in x)
        return type(x)(*parts) if hasattr(x, "_fields") else type(x)(parts)
    need = tuple(sorted(frozenset(vma) - getattr(jax.typeof(x), "vma", frozenset())))
    return jax.lax.pcast(x, need, to="varying") if need else x
