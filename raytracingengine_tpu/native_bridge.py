"""ctypes bridge to the optional native C++ library (_rte_native.so).

The reference's runtime I/O is native compiled code (vendored tinyobj +
writePPM + ffmpeg subprocess). Here the equivalents are a from-scratch
C++ OBJ parser and PPM/PNG encoders (native/src/), loaded via ctypes with
a pure-Python fallback: everything works without the .so, and with it the
large-file paths go native. Build with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def load() -> ctypes.CDLL | None:
    """Load (once) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_rte_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.rte_obj_parse.restype = ctypes.c_void_p
    lib.rte_obj_parse.argtypes = [ctypes.c_char_p]
    lib.rte_obj_num_vertices.restype = ctypes.c_int64
    lib.rte_obj_num_vertices.argtypes = [ctypes.c_void_p]
    lib.rte_obj_num_triangles.restype = ctypes.c_int64
    lib.rte_obj_num_triangles.argtypes = [ctypes.c_void_p]
    lib.rte_obj_num_materials.restype = ctypes.c_int32
    lib.rte_obj_num_materials.argtypes = [ctypes.c_void_p]
    lib.rte_obj_error.restype = ctypes.c_char_p
    lib.rte_obj_error.argtypes = [ctypes.c_void_p]
    lib.rte_obj_material_name.restype = ctypes.c_char_p
    lib.rte_obj_material_name.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.rte_obj_copy.restype = None
    lib.rte_obj_copy.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.rte_obj_free.restype = None
    lib.rte_obj_free.argtypes = [ctypes.c_void_p]
    lib.rte_write_ppm.restype = ctypes.c_int
    lib.rte_write_ppm.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.rte_encode_png.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.rte_encode_png.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.rte_free.restype = None
    lib.rte_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return load() is not None


def load_obj_native(path: str) -> dict | None:
    """Native OBJ parse -> same dict layout as imageio.obj.load_obj, or
    None if the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    h = lib.rte_obj_parse(path.encode())
    if not h:
        raise OSError(f"cannot open {path}")
    try:
        err = lib.rte_obj_error(h)
        if err:
            raise ValueError(err.decode())
        nv = lib.rte_obj_num_vertices(h)
        nt = lib.rte_obj_num_triangles(h)
        nm = lib.rte_obj_num_materials(h)
        verts = np.empty(nv * 3, np.float64)
        idx = np.empty(nt * 3, np.int64)
        mats = np.empty(nt, np.int32)
        lib.rte_obj_copy(
            h,
            verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            mats.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        names = [
            lib.rte_obj_material_name(h, i).decode() for i in range(nm)
        ]
        return {
            "vertices": verts.reshape(-1, 3),
            "indices": idx,
            "face_materials": mats,
            "materials": [{} for _ in names],
            "material_names": names,
        }
    finally:
        lib.rte_obj_free(h)


def write_ppm_native(path: str, rgb_u8: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w = arr.shape[:2]
    rc = lib.rte_write_ppm(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), w, h
    )
    if rc != 0:
        raise OSError(f"rte_write_ppm failed ({rc})")
    return True


def png_bytes_native(rgb_u8: np.ndarray, compress_level: int = 6) -> bytes | None:
    lib = load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(rgb_u8, np.uint8)
    h, w = arr.shape[:2]
    out_len = ctypes.c_int64(0)
    ptr = lib.rte_encode_png(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        compress_level,
        ctypes.byref(out_len),
    )
    if not ptr:
        raise RuntimeError("rte_encode_png failed")
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.rte_free(ptr)
