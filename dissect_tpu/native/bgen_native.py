"""ctypes bindings to the native BGEN decoder (bgen_decode.cpp).

Builds on demand with g++ (-O3 -fopenmp -lz -lzstd); when the toolchain
or build is unavailable callers silently fall back to the per-variant
Python parsers in dissect_tpu/io/bgen.py.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bgen_decode.cpp")
_LIB = os.path.join(_HERE, "libbgen_decode.so")

_lock = threading.Lock()
_lib = None
_build_failed = False

_ARGS = [
    ctypes.c_void_p,  # data
    ctypes.c_void_p,  # offsets
    ctypes.c_void_p,  # lengths
    ctypes.c_int64,  # n_variants
    ctypes.c_int64,  # n_samples
    ctypes.c_int,  # compression
    ctypes.c_void_p,  # out
    ctypes.c_void_p,  # status
]


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++", "-O3", "-march=native", "-fopenmp", "-shared",
                "-fPIC", _SRC, "-o", _LIB, "-lz", "-lzstd",
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
        lib.dissect_decode_bgen_l2.argtypes = _ARGS
        lib.dissect_decode_bgen_l1.argtypes = _ARGS
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_blocks(
    raw: bytes,
    offsets: np.ndarray,
    lengths: np.ndarray,
    n_samples: int,
    compression: int,
    layout: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Bulk-decode genotype blocks to (M, N) float32 dosages.

    Returns (dosages, status); rows with status != 0 were unsupported
    and must be re-parsed (or dropped) by the Python fallback."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native BGEN decoder unavailable")
    data = np.frombuffer(raw, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    m = len(offsets)
    out = np.empty((m, n_samples), dtype=np.float32)
    status = np.empty(m, dtype=np.int32)
    fn = lib.dissect_decode_bgen_l2 if layout == 2 else lib.dissect_decode_bgen_l1
    fn(
        data.ctypes.data,
        offsets.ctypes.data,
        lengths.ctypes.data,
        m,
        n_samples,
        compression,
        out.ctypes.data,
        status.ctypes.data,
    )
    return out, status
