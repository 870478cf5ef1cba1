"""Reliable device synchronization for timing.

`jax.block_until_ready` returns immediately on some experimental backends
(the tunneled `axon` TPU platform among them), which silently breaks any
wall-clock measurement built on it. `sync(tree)` forces true completion by
copying every leaf back to the host (`jax.device_get`), which always round-
trips through the runtime. Use it on SMALL results (an MSM output point is
a few hundred bytes); for large arrays, reduce device-side first.
"""

from __future__ import annotations

import jax

__all__ = ["sync"]


def sync(tree):
    """Force completion of all computations producing ``tree``; returns the
    host copy (numpy leaves)."""
    return jax.device_get(tree)
