"""Native (C++) runtime kernels, built on demand with g++ and bound via
ctypes. Python fallbacks keep every call site working without a toolchain;
tests assert C++/python parity.

Currently: `tpfp_greedy` — the evaluation matcher (see native/tpfp.cpp).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    src = os.path.join(os.path.dirname(__file__), '..', 'native', 'tpfp.cpp')
    cache_dir = os.path.join(
        os.environ.get('XDG_CACHE_HOME', os.path.expanduser('~/.cache')),
        'udaod_tpu')
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, 'libudaod_native.so')
    try:
        if (not os.path.exists(so_path) or
                os.path.getmtime(so_path) < os.path.getmtime(src)):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', src,
                 '-o', so_path],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so_path)
        lib.tpfp_greedy.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
        ]
        lib.tpfp_greedy.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def has_native() -> bool:
    return _build_and_load() is not None


def tpfp_greedy_native(dets: np.ndarray, gts: np.ndarray,
                       ignores: Optional[np.ndarray], iou_thr: float,
                       extra: float) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """C++ TP/FP matching; returns None if the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    gts = np.ascontiguousarray(gts, np.float32)
    ig = np.ascontiguousarray(
        ignores if ignores is not None else np.zeros((0, 4)), np.float32)
    n, g, ni = len(dets), len(gts), len(ig)
    tp = np.zeros(n, np.uint8)
    fp = np.zeros(n, np.uint8)
    fptr = ctypes.POINTER(ctypes.c_float)
    uptr = ctypes.POINTER(ctypes.c_ubyte)
    lib.tpfp_greedy(
        dets.ctypes.data_as(fptr), n, gts.ctypes.data_as(fptr), g,
        ig.ctypes.data_as(fptr), ni, ctypes.c_float(iou_thr),
        ctypes.c_float(extra), tp.ctypes.data_as(uptr),
        fp.ctypes.data_as(uptr))
    return tp.astype(np.float64), fp.astype(np.float64)
