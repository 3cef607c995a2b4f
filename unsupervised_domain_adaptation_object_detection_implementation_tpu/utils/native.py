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
    nat = os.path.join(os.path.dirname(__file__), '..', 'native')
    srcs = [os.path.join(nat, 'tpfp.cpp'),
            os.path.join(nat, 'imageproc.cpp')]
    cache_dir = os.path.join(
        os.environ.get('XDG_CACHE_HOME', os.path.expanduser('~/.cache')),
        'udaod_tpu')
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, 'libudaod_native.so')
    try:
        if (not os.path.exists(so_path) or
                any(os.path.getmtime(so_path) < os.path.getmtime(f)
                    for f in srcs)):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-std=c++17',
                 '-fopenmp', *srcs, '-o', so_path],
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
        fptr = ctypes.POINTER(ctypes.c_float)
        uptr = ctypes.POINTER(ctypes.c_ubyte)
        lib.resize_bilinear_u8.argtypes = [
            uptr, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            uptr, ctypes.c_int, ctypes.c_int]
        lib.resize_bilinear_u8.restype = None
        lib.normalize_pad_f32.argtypes = [
            uptr, ctypes.c_int, ctypes.c_int, fptr, fptr, fptr,
            ctypes.c_int, ctypes.c_int]
        lib.normalize_pad_f32.restype = None
        lib.host_nms.argtypes = [fptr, ctypes.c_int, ctypes.c_float, uptr]
        lib.host_nms.restype = None
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


def resize_bilinear_native(img: np.ndarray,
                           size_wh: Tuple[int, int]
                           ) -> Optional[np.ndarray]:
    """PIL-convention antialiased bilinear resize (uint8 HWC), OpenMP.
    Returns None if the native lib is unavailable."""
    lib = _build_and_load()
    if lib is None or img.dtype != np.uint8 or img.ndim != 3:
        return None
    tw, th = size_wh
    img = np.ascontiguousarray(img)
    out = np.empty((th, tw, img.shape[2]), np.uint8)
    uptr = ctypes.POINTER(ctypes.c_ubyte)
    lib.resize_bilinear_u8(img.ctypes.data_as(uptr), img.shape[0],
                           img.shape[1], img.shape[2],
                           out.ctypes.data_as(uptr), th, tw)
    return out


def normalize_pad_native(img: np.ndarray, mean, std,
                         canvas_hw: Tuple[int, int]
                         ) -> Optional[np.ndarray]:
    """Fused (x-mean)/std + zero-pad to canvas; None if unavailable."""
    lib = _build_and_load()
    if lib is None or img.dtype != np.uint8 or img.shape[-1] != 3:
        return None
    ph, pw = canvas_hw
    img = np.ascontiguousarray(img)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((ph, pw, 3), np.float32)
    fptr = ctypes.POINTER(ctypes.c_float)
    uptr = ctypes.POINTER(ctypes.c_ubyte)
    lib.normalize_pad_f32(img.ctypes.data_as(uptr), img.shape[0],
                          img.shape[1], mean.ctypes.data_as(fptr),
                          std.ctypes.data_as(fptr),
                          out.ctypes.data_as(fptr), ph, pw)
    return out


def host_nms_native(dets: np.ndarray, thr: float) -> Optional[np.ndarray]:
    """Greedy NMS keep mask (original order); None if unavailable."""
    lib = _build_and_load()
    if lib is None:
        return None
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.zeros(len(dets), np.uint8)
    fptr = ctypes.POINTER(ctypes.c_float)
    uptr = ctypes.POINTER(ctypes.c_ubyte)
    lib.host_nms(dets.ctypes.data_as(fptr), len(dets),
                 ctypes.c_float(thr), keep.ctypes.data_as(uptr))
    return keep.astype(bool)
