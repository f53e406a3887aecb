"""ctypes bindings to the native BED decoder (bed_decode.cpp).

The shared library builds on demand with g++ (-O3 -fopenmp); when the
toolchain or build is unavailable the caller silently falls back to the
vectorized numpy decoder (dissect_tpu/io/bed.py decode_bed_rows).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bed_decode.cpp")
_LIB = os.path.join(_HERE, "libbed_decode.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                "-fPIC", _SRC, "-o", _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.dissect_decode_bed.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        lib.dissect_bed_counts.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode(rows: np.ndarray, n_individuals: int) -> np.ndarray:
    """(chunk, bytes) uint8 -> (chunk, N) int8 dosages (-1 = missing)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n_rows, n_bytes = rows.shape
    out = np.empty((n_rows, n_individuals), dtype=np.int8)
    lib.dissect_decode_bed(
        rows.ctypes.data, n_rows, n_bytes, n_individuals, out.ctypes.data
    )
    return out


def genotype_counts(rows: np.ndarray, n_individuals: int) -> np.ndarray:
    """(chunk, bytes) uint8 -> (chunk, 4) int64 counts
    [missing, hom1, het, hom2]."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native decoder unavailable")
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n_rows, n_bytes = rows.shape
    out = np.empty((n_rows, 4), dtype=np.int64)
    lib.dissect_bed_counts(
        rows.ctypes.data, n_rows, n_bytes, n_individuals, out.ctypes.data
    )
    return out
