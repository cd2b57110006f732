"""ctypes bindings for the native PLY codec (libbstnative.so).

Auto-builds the library on first use when a toolchain is present
(``make -C buildingsegment_tpu/native``); callers fall back to the
pure-numpy codec in :mod:`buildingsegment_tpu.io.ply` when the native
library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libbstnative.so")
_lib = None
_tried = False


def _stale() -> bool:
    """The .so must be rebuilt when sources are newer (a stale or
    foreign-ISA binary must never shadow ply_codec.cpp changes)."""
    if not os.path.exists(_LIB_PATH):
        return True
    so_mtime = os.path.getmtime(_LIB_PATH)
    for src in ("ply_codec.cpp", "Makefile"):
        p = os.path.join(_HERE, src)
        if os.path.exists(p) and os.path.getmtime(p) > so_mtime:
            return True
    return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if _stale():
        try:
            subprocess.run(
                ["make", "-B", "-C", _HERE],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.bst_ply_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bst_ply_info.restype = ctypes.c_int
    lib.bst_ply_read.argtypes = [
        ctypes.c_char_p,
        ctypes.c_double,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.bst_ply_read.restype = ctypes.c_int
    lib.bst_ply_write.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
    ]
    lib.bst_ply_write.restype = ctypes.c_int
    lib.bst_png_defilter.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.bst_png_defilter.restype = ctypes.c_int
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def png_defilter_native(
    raw: bytes, h: int, stride: int, bpp: int
) -> Optional[np.ndarray]:
    """Defilter PNG scanlines natively; uint8[h, stride] or None
    (None → caller should use the numpy/python fallback)."""
    lib = _load()
    if lib is None:
        return None
    rawb = np.frombuffer(raw, np.uint8)
    if rawb.size < h * (stride + 1):
        return None
    out = np.empty((h, stride), np.uint8)
    rc = lib.bst_png_defilter(
        rawb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, stride, bpp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def read_ply_native(path: str, position_scale: float = 1.0):
    """Read a PLY via the native codec; returns a HostPointCloud or None
    (None → caller should use the numpy fallback)."""
    lib = _load()
    if lib is None:
        return None
    count = ctypes.c_int64(0)
    flags = ctypes.c_int32(0)
    rc = lib.bst_ply_info(path.encode(), ctypes.byref(count), ctypes.byref(flags))
    if rc != 0:
        return None
    n = count.value
    has_colors = bool(flags.value & 1)
    has_refl = bool(flags.value & 2)
    has_frame = bool(flags.value & 4)
    has_laser = bool(flags.value & 8)
    pos = np.zeros((max(n, 1), 3), np.int32)
    col = np.zeros((max(n, 1), 3), np.uint16) if has_colors else None
    refl = np.zeros((max(n, 1),), np.uint16) if has_refl else None
    fi = np.zeros((max(n, 1),), np.uint8) if has_frame else None
    la = np.zeros((max(n, 1),), np.int32) if has_laser else None

    def _ptr(arr, ctype):
        return (
            arr.ctypes.data_as(ctypes.POINTER(ctype))
            if arr is not None
            else None
        )

    rc = lib.bst_ply_read(
        path.encode(),
        position_scale,
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _ptr(col, ctypes.c_uint16),
        _ptr(refl, ctypes.c_uint16),
        _ptr(fi, ctypes.c_uint8),
        _ptr(la, ctypes.c_int32),
    )
    if rc != 0:
        return None
    from buildingsegment_tpu.io.ply import HostPointCloud

    return HostPointCloud(
        positions=pos[:n],
        colors=col[:n] if col is not None else None,
        reflectances=refl[:n] if refl is not None else None,
        frame_idx=fi[:n] if fi is not None else None,
        laser_angles=la[:n] if la is not None else None,
    )


def write_ply_native(
    cloud,
    path: str,
    position_scale: float = 1.0,
    position_offset=(0.0, 0.0, 0.0),
) -> bool:
    """Write binary PLY via the native codec; False → use numpy fallback."""
    lib = _load()
    if lib is None:
        return False
    pos = np.ascontiguousarray(cloud.positions, np.int32)
    col = (
        np.ascontiguousarray(cloud.colors, np.uint16)
        if cloud.colors is not None
        else None
    )
    refl = (
        np.ascontiguousarray(cloud.reflectances, np.uint16)
        if cloud.reflectances is not None
        else None
    )
    fi = (
        np.ascontiguousarray(cloud.frame_idx, np.uint8)
        if cloud.frame_idx is not None
        else None
    )
    la = (
        np.ascontiguousarray(cloud.laser_angles, np.int32)
        if cloud.laser_angles is not None
        else None
    )

    def _ptr(arr, ctype):
        return (
            arr.ctypes.data_as(ctypes.POINTER(ctype))
            if arr is not None
            else None
        )

    rc = lib.bst_ply_write(
        path.encode(),
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _ptr(col, ctypes.c_uint16),
        _ptr(refl, ctypes.c_uint16),
        _ptr(fi, ctypes.c_uint8),
        _ptr(la, ctypes.c_int32),
        pos.shape[0],
        position_scale,
        float(position_offset[0]),
        float(position_offset[1]),
        float(position_offset[2]),
    )
    return rc == 0
