"""ctypes bindings for the native I/O library (native/colmap_io.cpp).

Builds the shared library on first use with g++ (cached under
native/build/), and falls back silently to the pure-Python parsers when the
toolchain is unavailable. Used by data/colmap.py and data/ply.py for the
hot paths (millions of SfM points / Gaussians).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Tuple

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "colmap_io.cpp")
_BUILD_DIR = os.path.join(_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libmsgs_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None

        lib.msgs_free.argtypes = [ctypes.c_void_p]
        lib.msgs_read_points3d_bin.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64)]
        lib.msgs_read_images_bin.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.msgs_read_ply_f32.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
        return _lib


def _take(ptr, shape, dtype, lib):
    """Copy a malloc'd buffer into numpy and free it."""
    n = int(np.prod(shape))
    ctype = np.ctypeslib.as_ctypes_type(dtype)
    arr = np.ctypeslib.as_array(
        ctypes.cast(ptr, ctypes.POINTER(ctype)), shape=(n,)).copy()
    lib.msgs_free(ptr)
    return arr.reshape(shape).astype(dtype, copy=False)


def read_points3d_bin(path: str
                      ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    xyz_p = ctypes.POINTER(ctypes.c_float)()
    rgb_p = ctypes.POINTER(ctypes.c_uint8)()
    err_p = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    rc = lib.msgs_read_points3d_bin(
        path.encode(), ctypes.byref(xyz_p), ctypes.byref(rgb_p),
        ctypes.byref(err_p), ctypes.byref(n))
    if rc != 0:
        return None
    n = n.value
    xyz = _take(xyz_p, (n, 3), np.float32, lib)
    rgb = _take(rgb_p, (n, 3), np.uint8, lib)
    err = _take(err_p, (n,), np.float32, lib)
    return xyz.astype(np.float64), rgb, err.astype(np.float64)


def read_images_bin(path: str) -> Optional[dict]:
    lib = get_lib()
    if lib is None:
        return None
    q_p = ctypes.POINTER(ctypes.c_double)()
    t_p = ctypes.POINTER(ctypes.c_double)()
    cam_p = ctypes.POINTER(ctypes.c_int32)()
    img_p = ctypes.POINTER(ctypes.c_int32)()
    names_p = ctypes.c_char_p()
    names_len = ctypes.c_int64()
    n = ctypes.c_int64()
    rc = lib.msgs_read_images_bin(
        path.encode(), ctypes.byref(q_p), ctypes.byref(t_p),
        ctypes.byref(cam_p), ctypes.byref(img_p), ctypes.byref(names_p),
        ctypes.byref(names_len), ctypes.byref(n))
    if rc != 0:
        return None
    n = n.value
    qvec = _take(q_p, (n, 4), np.float64, lib)
    tvec = _take(t_p, (n, 3), np.float64, lib)
    cam_id = _take(cam_p, (n,), np.int32, lib)
    img_id = _take(img_p, (n,), np.int32, lib)
    blob = ctypes.string_at(names_p, names_len.value)
    lib.msgs_free(ctypes.cast(names_p, ctypes.c_void_p))
    names = blob.decode().split("\0")[:n]
    return {"qvec": qvec, "tvec": tvec, "camera_id": cam_id,
            "image_id": img_id, "names": names}


def read_ply_f32(path: str) -> Optional[Dict[str, np.ndarray]]:
    """All-float32 PLY vertex read (the Gaussian model schema)."""
    lib = get_lib()
    if lib is None:
        return None
    data_p = ctypes.POINTER(ctypes.c_float)()
    names_p = ctypes.c_char_p()
    names_len = ctypes.c_int64()
    n = ctypes.c_int64()
    n_props = ctypes.c_int64()
    rc = lib.msgs_read_ply_f32(
        path.encode(), ctypes.byref(data_p), ctypes.byref(names_p),
        ctypes.byref(names_len), ctypes.byref(n), ctypes.byref(n_props))
    if rc != 0:
        return None
    n, n_props = n.value, n_props.value
    data = _take(data_p, (n, n_props), np.float32, lib)
    blob = ctypes.string_at(names_p, names_len.value)
    lib.msgs_free(ctypes.cast(names_p, ctypes.c_void_p))
    names = blob.decode().split("\0")[:n_props]
    return {name: data[:, i] for i, name in enumerate(names)}
