"""ctypes bindings for the native COLMAP parsers (native/splatco_io.cpp).

Falls back transparently to the numpy parsers in data/colmap.py when the
shared library hasn't been built (`make -C native`).  `read_points3d` /
`read_images` return the same structures as the pure-python versions.
"""
from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

from splatco_tpu.data import colmap as py_colmap

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libsplatco_io.so"),
    os.path.join(os.path.dirname(__file__), "libsplatco_io.so"),
]

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for path in _LIB_PATHS:
        path = os.path.abspath(path)
        if os.path.exists(path):
            lib = ctypes.CDLL(path)
            c_u8p = ctypes.POINTER(ctypes.c_uint8)
            c_i64p = ctypes.POINTER(ctypes.c_int64)
            lib.splatco_points3d_count.argtypes = [c_u8p, ctypes.c_int64,
                                                  c_i64p]
            lib.splatco_points3d_parse.argtypes = [
                c_u8p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), c_u8p,
                ctypes.POINTER(ctypes.c_double)]
            lib.splatco_images_count.argtypes = [c_u8p, ctypes.c_int64,
                                                 c_i64p, c_i64p, c_i64p]
            lib.splatco_images_parse.argtypes = [
                c_u8p, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), c_i64p,
                ctypes.c_char_p, c_i64p,
                ctypes.POINTER(ctypes.c_double), c_i64p]
            _lib = lib
            return lib
    return None


def available() -> bool:
    return _load() is not None


def _as_u8p(buf: np.ndarray):
    return buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def read_points3d(path: str):
    """Native points3D.bin parse; same return as
    colmap.read_points3d_binary."""
    lib = _load()
    if lib is None:
        return py_colmap.read_points3d_binary(path)
    data = np.fromfile(path, dtype=np.uint8)
    n = ctypes.c_int64()
    rc = lib.splatco_points3d_count(_as_u8p(data), data.size,
                                    ctypes.byref(n))
    assert rc == 0, f"points3d_count failed: {rc}"
    xyz = np.empty((n.value, 3), np.float64)
    rgb = np.empty((n.value, 3), np.uint8)
    err = np.empty((n.value, 1), np.float64)
    rc = lib.splatco_points3d_parse(
        _as_u8p(data), data.size,
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), _as_u8p(rgb),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    assert rc == 0, f"points3d_parse failed: {rc}"
    return xyz, rgb, err


def read_images(path: str) -> Dict[int, py_colmap.ColmapImage]:
    """Native images.bin parse; same return as colmap.read_images_binary."""
    lib = _load()
    if lib is None:
        return py_colmap.read_images_binary(path)
    data = np.fromfile(path, dtype=np.uint8)
    n = ctypes.c_int64()
    name_bytes = ctypes.c_int64()
    total_pts = ctypes.c_int64()
    rc = lib.splatco_images_count(_as_u8p(data), data.size,
                                  ctypes.byref(n), ctypes.byref(name_bytes),
                                  ctypes.byref(total_pts))
    assert rc == 0, f"images_count failed: {rc}"
    nv = n.value
    image_id = np.empty(nv, np.int32)
    qvec = np.empty((nv, 4), np.float64)
    tvec = np.empty((nv, 3), np.float64)
    camera_id = np.empty(nv, np.int32)
    name_off = np.empty(nv + 1, np.int64)
    names = ctypes.create_string_buffer(max(name_bytes.value, 1))
    pts_off = np.empty(nv + 1, np.int64)
    xys = np.empty((total_pts.value, 2), np.float64)
    p3d = np.empty(total_pts.value, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.splatco_images_parse(
        _as_u8p(data), data.size,
        image_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        qvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        tvec.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        camera_id.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        name_off.ctypes.data_as(i64p), names,
        pts_off.ctypes.data_as(i64p),
        xys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        p3d.ctypes.data_as(i64p))
    assert rc == 0, f"images_parse failed: {rc}"
    raw_names = names.raw
    out = {}
    for i in range(nv):
        nm = raw_names[name_off[i]:name_off[i + 1]].decode("utf-8")
        sl = slice(pts_off[i], pts_off[i + 1])
        out[int(image_id[i])] = py_colmap.ColmapImage(
            int(image_id[i]), qvec[i].copy(), tvec[i].copy(),
            int(camera_id[i]), nm, xys[sl].copy(), p3d[sl].copy())
    return out
