"""ZPrize-style external entry point: ``compute_msm(points, scalars)``.

Capability parity with the reference's submission shims
(`scripts/zprize23/submission.ts:1-82`, `submission-bls377.ts:21-102`):

* accepts points as affine bigint pairs ``(x, y)`` (or ``None`` = infinity)
  or packed little-endian bytes, scalars as ints or packed bytes
* detects repeated points and falls back to the safe MSM (the reference's
  same-point check, `submission-bls377.ts:44-57`)
* returns the affine result as a bigint pair (or ``None``)

Compiled programs are cached per padded size (the analog of the reference's
preallocated max-size buffers reused across calls).
"""

from __future__ import annotations

import numpy as np

from .curves.params import BLS12_377
from .fields.bytes_codec import bytes_to_ints
from .parallel.api import Weierstrass

__all__ = ["compute_msm", "make_compute_msm"]


def _to_int_scalars(scalars, nbytes: int):
    if len(scalars) and isinstance(scalars[0], (bytes, bytearray)):
        return [int.from_bytes(s, "little") for s in scalars]
    if isinstance(scalars, np.ndarray) and scalars.dtype == np.uint8:
        return bytes_to_ints(scalars)
    return [int(s) for s in scalars]


def _to_int_points(points, nbytes: int):
    out = []
    for P in points:
        if P is None:
            out.append(None)
        elif isinstance(P, (tuple, list)):
            x, y = P
            if isinstance(x, (bytes, bytearray)):
                x = int.from_bytes(x, "little")
                y = int.from_bytes(y, "little")
            out.append((int(x), int(y)))
        else:
            raise TypeError(f"unsupported point encoding: {type(P)}")
    return out


def make_compute_msm(params=BLS12_377, mesh=None):
    """Build a compute_msm closure for one curve (and optional device mesh)."""
    curve = Weierstrass.create(params)
    nbytes = (params.modulus.bit_length() + 7) // 8

    def compute_msm(points, scalars, mode: str | None = None):
        assert len(points) == len(scalars), "points/scalars length mismatch"
        if len(points) == 0:
            return None
        pts = _to_int_points(points, nbytes)
        scs = _to_int_scalars(scalars, nbytes)
        s = curve.scalars_from_ints(scs)
        p = curve.points_from_ints(pts)
        # same-point check -> safe msm (cf. submission-bls377.ts:44-57);
        # the projective mode is complete either way
        finite = [q for q in pts if q is not None]
        has_dupes = len(set(finite)) != len(finite)
        if has_dupes:
            res = curve.msm(s, p, mesh=mesh, mode=mode)
        else:
            res = curve.msm_unsafe(s, p, mesh=mesh, mode=mode)
        return curve.result_to_int(res)

    return compute_msm


compute_msm = make_compute_msm()
