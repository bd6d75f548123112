"""ctypes bindings for the native host runtime (native/nvdb_host.cpp).

Auto-builds ``libnvdb_host.so`` with make on first use; every entry point has a
numpy fallback so the framework works without a toolchain. ``available()``
reports whether the native path is active (A/B kill switch:
``NVDB_FORCE_PY_HOST=1`` forces the numpy fallbacks, mirroring the reference's
``NVDB_FORCE_SCALAR``)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libnvdb_host.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NVDB_FORCE_PY_HOST", "0") == "1":
        return None
    try:
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO)
            < os.path.getmtime(os.path.join(_NATIVE_DIR, "nvdb_host.cpp"))
        ):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.nvdb_convert_f32_to_bf16.restype = ctypes.c_int
        lib.nvdb_quantize_i8.restype = ctypes.c_int
        lib.nvdb_topk_dot_f32.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def convert_f32_to_bf16(src: np.ndarray, threads: int = 0) -> np.ndarray:
    """FP32 array -> bf16 (round-to-nearest-even), threaded natively."""
    import ml_dtypes

    src = np.ascontiguousarray(src, dtype=np.float32)
    lib = _load()
    if lib is None:
        return src.astype(ml_dtypes.bfloat16)
    out = np.empty(src.shape, dtype=np.uint16)
    rc = lib.nvdb_convert_f32_to_bf16(
        _ptr(src, ctypes.c_float), _ptr(out, ctypes.c_uint16),
        ctypes.c_int64(src.size), ctypes.c_int(threads))
    if rc != 0:
        raise RuntimeError(f"nvdb_convert_f32_to_bf16 rc={rc}")
    return out.view(ml_dtypes.bfloat16)


def quantize_i8(rows: np.ndarray, threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """FP32 rows -> (int8 rows, per-row scales), max-abs/127, threaded natively."""
    rows = np.ascontiguousarray(rows, dtype=np.float32)
    lib = _load()
    if lib is None:
        from nvdb_tpu.formats import vecbin

        return vecbin.quantize_i8(rows)
    n, d = rows.shape
    out = np.empty((n, d), dtype=np.int8)
    scales = np.empty((n,), dtype=np.float32)
    rc = lib.nvdb_quantize_i8(
        _ptr(rows, ctypes.c_float), _ptr(out, ctypes.c_int8),
        _ptr(scales, ctypes.c_float), ctypes.c_int64(n), ctypes.c_int64(d),
        ctypes.c_int(threads))
    if rc != 0:
        raise RuntimeError(f"nvdb_quantize_i8 rc={rc}")
    return out, scales


def topk_dot_f32(base: np.ndarray, queries: np.ndarray, k: int,
                 threads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Host exact top-k by dot product — the independent native oracle."""
    base = np.ascontiguousarray(base, dtype=np.float32)
    queries = np.ascontiguousarray(np.atleast_2d(queries), dtype=np.float32)
    n, d = base.shape
    q = queries.shape[0]
    lib = _load()
    if lib is None:
        s = queries @ base.T
        ids = np.argsort(-s, axis=1, kind="stable")[:, :k].astype(np.uint32)
        return np.take_along_axis(s, ids.astype(np.int64), axis=1), ids
    scores = np.empty((q, k), dtype=np.float32)
    ids = np.empty((q, k), dtype=np.uint32)
    rc = lib.nvdb_topk_dot_f32(
        _ptr(base, ctypes.c_float), ctypes.c_int64(n), ctypes.c_int64(d),
        _ptr(queries, ctypes.c_float), ctypes.c_int64(q), ctypes.c_int(k),
        _ptr(scores, ctypes.c_float), _ptr(ids, ctypes.c_uint32),
        ctypes.c_int(threads))
    if rc != 0:
        raise RuntimeError(f"nvdb_topk_dot_f32 rc={rc}")
    return scores, ids
