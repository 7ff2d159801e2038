"""ctypes binding for the native C++ MAS kernel (native/mas.cpp).

Compiled on demand with g++ (-O3 -fopenmp), cached under native/build/.
This is the host-side counterpart of the Pallas TPU kernel — used for CPU
training/debugging and as an independent correctness oracle; the reference's
equivalent is the Cython module monotonic_align/core.pyx.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "mas.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_BUILD_DIR, "libmas.so")

_lib = None


def _compile() -> str:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        _compile()
    lib = ctypes.CDLL(_LIB)
    lib.mas_batch.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.mas_batch.restype = None
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def maximum_path_native(neg_cent: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """Host MAS. neg_cent/mask: [B, T_y, T_x] -> int32 path (masked)."""
    lib = _load()
    neg = np.ascontiguousarray(
        np.where(mask > 0, neg_cent, -1e9), dtype=np.float32
    )
    b, t_y, t_x = neg.shape
    paths = np.zeros((b, t_y, t_x), dtype=np.int32)
    t_ys = np.ascontiguousarray(mask[:, :, 0].sum(axis=1), dtype=np.int32)
    t_xs = np.ascontiguousarray(mask[:, 0, :].sum(axis=1), dtype=np.int32)
    lib.mas_batch(
        neg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        paths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_ys.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        t_xs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        b, t_y, t_x,
    )
    return paths * mask.astype(np.int32)
