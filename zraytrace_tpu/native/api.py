"""Python bindings for the native components (ctypes)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from zraytrace_tpu.native.build import load_library


def _enabled() -> bool:
    return os.environ.get("ZRAYTRACE_NO_NATIVE", "0") != "1"


_sig_done = False


def _lib():
    global _sig_done
    if not _enabled():
        return None
    lib = load_library()
    if lib is not None and not _sig_done:
        lib.zrt_build_bvh.restype = ctypes.c_int64
        lib.zrt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        lib.zrt_parse_obj.restype = ctypes.c_int32
        lib.zrt_parse_obj.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]
        _sig_done = True
    return lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def build_bvh_native(lo: np.ndarray, hi: np.ndarray, leaf_size: int):
    """Binned-SAH build in C++. Returns the flat arrays or None when the
    native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    n = lo.shape[0]
    lo = np.ascontiguousarray(lo, np.float32)
    hi = np.ascontiguousarray(hi, np.float32)
    max_nodes = 4 * n // max(leaf_size, 1) + 16
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    prim_start = np.empty((max_nodes,), np.int32)
    prim_count = np.empty((max_nodes,), np.int32)
    skip = np.empty((max_nodes,), np.int32)
    order = np.empty((n,), np.int32)
    m = lib.zrt_build_bvh(
        _fptr(lo), _fptr(hi), n, leaf_size,
        _fptr(node_min), _fptr(node_max),
        _iptr(prim_start), _iptr(prim_count), _iptr(skip), _iptr(order),
        max_nodes,
    )
    if m < 0:
        return None
    return (
        node_min[:m].copy(), node_max[:m].copy(),
        prim_start[:m].copy(), prim_count[:m].copy(), skip[:m].copy(), order,
    )


def parse_obj_native(path):
    """OBJ parse in C++. Returns (vertices, triangles, faces, n_normals) or
    None when unavailable. Raises on malformed faces like the Python
    reader."""
    lib = _lib()
    if lib is None:
        return None
    counts = np.zeros((4,), np.int64)
    rc = lib.zrt_parse_obj(
        str(path).encode(), counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        None, None,
    )
    if rc == -1:
        raise FileNotFoundError(path)
    if rc == -2:
        from zraytrace_tpu.io.obj import ObjParseError

        raise ObjParseError(f"malformed face in {path}")
    n_v, n_t = int(counts[0]), int(counts[1])
    vertices = np.empty((n_v, 3), np.float32)
    tris = np.empty((n_t, 3), np.int32)
    rc = lib.zrt_parse_obj(
        str(path).encode(), counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        _fptr(vertices), _iptr(tris),
    )
    assert rc == 0
    return vertices, tris, int(counts[2]), int(counts[3])
