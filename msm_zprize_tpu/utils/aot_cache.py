"""Disk-cached `jax.export` artifacts: sub-second process bring-up.

Every fresh process pays 20-65 s of trace+lower before its first MSM
dispatch (the XLA persistent cache covers compiled executables, not
tracing). The reference avoids the analogous cost by shipping compiled
`WebAssembly.Module`s to late-joining workers (`src/parallel.ts:305-314`);
the TPU-native analog is `jax.export`: serialize the lowered StableHLO of
the jitted MSM closure once, deserialize it (no tracing) in later
processes. Keyed like the point cache: a caller-provided string naming
(curve, N, c, mode, ...) plus the abstract input signature.

Falls back to plain `jax.jit` on any export/deserialize failure, so the
cache is purely an optimization.
"""

from __future__ import annotations

import hashlib
import os
import sys

import jax

CACHE_DIR = os.environ.get(
    "MSM_TPU_AOT_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "..", ".bench_cache", "aot"),
)


def _sig(args) -> str:
    parts = [f"{a.shape}:{a.dtype}" if hasattr(a, "shape") else repr(a) for a in jax.tree_util.tree_leaves(args)]
    h = hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]
    return h


def _repo_rev() -> str:
    """Code-version key component: short git revision, plus a hash of the
    working-tree DIFF when dirty (a rev-only key would silently pin the
    committed algorithm while iterating on uncommitted changes — the
    serialized StableHLO bakes the traced program)."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        rev = subprocess.run(
            ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
        ).stdout.strip() or "nogit"
    except Exception:
        return "nogit"
    try:
        diff = subprocess.run(
            ["git", "-C", repo, "diff", "HEAD", "--", "*.py"],
            capture_output=True, timeout=10,
        ).stdout
        if diff:
            rev += "-" + hashlib.sha256(diff).hexdigest()[:8]
    except Exception:
        pass
    return rev


def exported_fn(cache_key: str, fn, example_args, verbose: bool = False):
    """Return a callable equivalent to jax.jit(fn), backed by a disk-cached
    jax.export artifact for ``example_args``'s signature.

    First process: trace + lower + serialize (adds a few seconds once).
    Later processes: deserialize the StableHLO — no tracing; compilation
    hits the XLA persistent cache.
    """
    import jax.export

    backend = jax.default_backend()
    # the backend is part of the key: exports are platform-specific
    # (platforms=[backend]), and a wrong-platform artifact deserializes
    # fine but fails at CALL time — outside any fallback
    key = f"{cache_key}_{_sig(example_args)}_{jax.__version__}_{backend}_{_repo_rev()}"
    path = os.path.join(CACHE_DIR, key + ".jaxexport")

    if os.path.exists(path):
        try:
            with open(path, "rb") as fh:
                exp = jax.export.deserialize(fh.read())
            if backend not in getattr(exp, "platforms", (backend,)):
                raise ValueError(
                    f"artifact platforms {exp.platforms} != backend {backend}"
                )
            call = jax.jit(exp.call)
            if verbose:
                sys.stderr.write(f"[aot] loaded {path}\n")
            return call
        except Exception as e:  # stale/incompatible artifact: re-export
            if verbose:
                sys.stderr.write(f"[aot] load failed ({e!r}); re-exporting\n")

    jf = jax.jit(fn)
    try:
        exp = jax.export.export(jf, platforms=[backend])(*example_args)
        os.makedirs(CACHE_DIR, exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(exp.serialize())
        os.replace(tmp, path)
        if verbose:
            sys.stderr.write(f"[aot] exported {path}\n")
        return jax.jit(exp.call)
    except Exception as e:
        if verbose:
            sys.stderr.write(f"[aot] export unavailable ({e!r}); plain jit\n")
        return jf
