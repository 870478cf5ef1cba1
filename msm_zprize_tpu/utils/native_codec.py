"""ctypes bindings for the native C++ codec (`native/codec.cpp`).

Loads (building on first use if a toolchain is present) the shared library
implementing the packed-bytes <-> limb conversions and the rejection-sampling
bound filter — the host-side runtime tier of the framework, mirroring the
reference's in-WASM I/O conversions (`src/wasm/field-helpers.ts:211-301`).
Falls back to None when no compiler is available; callers (e.g.
`fields.bytes_codec`) then use the numpy path.

Disable explicitly with MSM_TPU_NATIVE_CODEC=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["get_lib", "bytes_to_limbs_native", "limbs_to_bytes_native", "below_bound_native"]

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmsmcodec.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "codec.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if os.environ.get("MSM_TPU_NATIVE_CODEC", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        i64, p_u8, p_i32 = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int32),
        )
        lib.msm_bytes_to_limbs.argtypes = [p_u8, i64, i64, p_i32, i64, i64]
        lib.msm_limbs_to_bytes.argtypes = [p_i32, i64, i64, i64, p_u8, i64]
        lib.msm_below_bound.argtypes = [p_i32, i64, i64, p_i32, p_u8]
        _lib = lib
        return _lib


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bytes_to_limbs_native(data: np.ndarray, n: int, w: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    B, nbytes = data.shape
    out = np.empty((n, B), dtype=np.int32)
    lib.msm_bytes_to_limbs(
        _ptr(data, ctypes.c_uint8), B, nbytes, _ptr(out, ctypes.c_int32), n, w
    )
    return out


def limbs_to_bytes_native(limbs: np.ndarray, w: int, nbytes: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.int32)
    n, B = limbs.shape
    out = np.empty((B, nbytes), dtype=np.uint8)
    lib.msm_limbs_to_bytes(
        _ptr(limbs, ctypes.c_int32), n, B, w, _ptr(out, ctypes.c_uint8), nbytes
    )
    return out


def below_bound_native(limbs: np.ndarray, bound_limbs: np.ndarray) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    limbs = np.ascontiguousarray(limbs, dtype=np.int32)
    bound = np.ascontiguousarray(bound_limbs, dtype=np.int32)
    n, B = limbs.shape
    ok = np.empty(B, dtype=np.uint8)
    lib.msm_below_bound(
        _ptr(limbs, ctypes.c_int32), n, B, _ptr(bound, ctypes.c_int32),
        _ptr(ok, ctypes.c_uint8),
    )
    return ok.astype(bool)
