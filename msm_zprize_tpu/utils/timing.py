"""Timing + deferred logging — analog of `src/msm-common.ts:192-230`
(createLog / tic / toc) and `src/testing/tictoc.ts`.

Timings force device completion (`block_until_ready`) so phase numbers are
real; entries accumulate as data and are printed by the caller, like the
reference's deferred worker logs.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax

__all__ = ["Log", "tic_toc"]


class Log:
    def __init__(self, active: bool = True):
        self.active = active
        self.entries: list[tuple[str, float]] = []
        self._stack: list[tuple[str, float]] = []

    def tic(self, label: str):
        if self.active:
            self._stack.append((label, time.perf_counter()))

    def toc(self, value=None):
        """End the innermost tic; optionally block on a device value first."""
        if not self.active:
            return 0.0
        if value is not None:
            jax.block_until_ready(value)
        label, t0 = self._stack.pop()
        dt = time.perf_counter() - t0
        self.entries.append((label, dt))
        return dt

    @contextmanager
    def span(self, label: str, result_ref=None):
        self.tic(label)
        try:
            yield
        finally:
            self.toc()

    def lines(self) -> list[str]:
        return [f"{label}: {dt * 1e3:.2f} ms" for label, dt in self.entries]

    def print(self):
        for line in self.lines():
            print(line)


@contextmanager
def tic_toc(label: str = ""):
    t0 = time.perf_counter()
    yield
    print(f"{label}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
