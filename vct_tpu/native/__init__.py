"""ctypes binding for the native host runtime (vct_native.cpp).

Builds libvct_native.so on demand with g++ (no pybind11 in this image —
plain C ABI + ctypes).  Every entry point has a pure-numpy fallback so the
framework works without a toolchain; when the library is present,
scene/obj.py and render/voxelize.py route their host-side hot loops here
(Sponza-scale: ~10-50x over the Python paths).

Parity contract: bit-identical outputs to the numpy implementations
(tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vct_native.cpp")
_LIB = os.path.join(_DIR, "libvct_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile libvct_native.so. Returns True on success."""
    if not force and os.path.exists(_LIB) and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return True
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-ffp-contract=off", "-o", _LIB, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"vct_native build skipped: {e}", file=sys.stderr)
        return False
    if r.returncode != 0:
        print(f"vct_native build failed:\n{r.stderr}", file=sys.stderr)
        return False
    return True


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not build():
            return None
        lib = ctypes.CDLL(_LIB)
        c_i64p = ctypes.POINTER(ctypes.c_int64)
        c_i32p = ctypes.POINTER(ctypes.c_int32)
        lib.vct_obj_parse.restype = ctypes.c_void_p
        lib.vct_obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_int32,
                                      ctypes.c_float]
        lib.vct_obj_counts.argtypes = [ctypes.c_void_p, c_i64p, c_i64p,
                                       c_i64p, c_i64p, c_i32p]
        lib.vct_obj_fill.argtypes = [ctypes.c_void_p] + [
            ctypes.c_void_p] * 7
        lib.vct_obj_free.argtypes = [ctypes.c_void_p]
        lib.vct_sample_levels.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
            ctypes.c_int32, ctypes.c_void_p]
        lib.vct_sample_fill.restype = ctypes.c_int64
        lib.vct_sample_fill.argtypes = [ctypes.c_void_p] * 5 + [
            ctypes.c_int64] + [ctypes.c_void_p] * 5
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def parse_obj_geometry(path: str, flip_uv: bool = True, scale: float = 1.0):
    """Native OBJ geometry parse.

    Returns (positions, uvs, normals, tris, tri_mat, mat_names, mtllibs,
    any_normals) or None when the native library is unavailable or the
    file cannot be opened — callers fall back to the Python parser.
    """
    lib = _load()
    if lib is None:
        return None
    h = lib.vct_obj_parse(path.encode(), int(flip_uv), float(scale))
    if not h:
        return None
    try:
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        mb = ctypes.c_int64()
        lb = ctypes.c_int64()
        an = ctypes.c_int32()
        lib.vct_obj_counts(h, ctypes.byref(nv), ctypes.byref(nt),
                           ctypes.byref(mb), ctypes.byref(lb),
                           ctypes.byref(an))
        pos = np.empty((nv.value, 3), np.float32)
        uv = np.empty((nv.value, 2), np.float32)
        nrm = np.empty((nv.value, 3), np.float32)
        tris = np.empty((nt.value, 3), np.int32)
        tri_mat = np.empty((nt.value,), np.int32)
        names = ctypes.create_string_buffer(max(1, mb.value))
        libs = ctypes.create_string_buffer(max(1, lb.value))
        lib.vct_obj_fill(h, _ptr(pos), _ptr(uv), _ptr(nrm), _ptr(tris),
                         _ptr(tri_mat), ctypes.cast(names, ctypes.c_void_p),
                         ctypes.cast(libs, ctypes.c_void_p))
        mat_names = (names.raw[:mb.value].decode(errors="replace").split("\n")
                     if mb.value else [])
        mtllibs = (libs.raw[:lb.value].decode(errors="replace").split("\n")
                   if lb.value else [])
        return (pos, uv, nrm, tris, tri_mat, mat_names, mtllibs,
                bool(an.value))
    finally:
        lib.vct_obj_free(h)


def surface_samples(tv: np.ndarray, t_uv: np.ndarray, fn: np.ndarray,
                    tri_material: np.ndarray, voxel_world_size: float,
                    samples_per_voxel_width: float,
                    max_samples_per_tri: int = 4096):
    """Native stratified surface sampling (voxelize.py:51-111 semantics).

    Returns (positions, normals, uvs, material_ids, tri_ids) or None when
    the native library is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    t = tv.shape[0]
    tv = np.ascontiguousarray(tv, np.float32)
    t_uv = np.ascontiguousarray(t_uv, np.float32)
    fn = np.ascontiguousarray(fn, np.float32)
    tri_material = np.ascontiguousarray(tri_material, np.int32)
    nmax = int(np.sqrt(max_samples_per_tri))
    levels = np.empty((t,), np.int32)
    lib.vct_sample_levels(_ptr(tv), t, np.float32(voxel_world_size),
                          np.float32(samples_per_voxel_width), nmax,
                          _ptr(levels))
    total = int(np.sum(levels.astype(np.int64) ** 2))
    pos = np.empty((total, 3), np.float32)
    nrm = np.empty((total, 3), np.float32)
    uv = np.empty((total, 2), np.float32)
    mat = np.empty((total,), np.int32)
    tri = np.empty((total,), np.int32)
    written = lib.vct_sample_fill(_ptr(tv), _ptr(t_uv), _ptr(fn),
                                  _ptr(tri_material), _ptr(levels), t,
                                  _ptr(pos), _ptr(nrm), _ptr(uv),
                                  _ptr(mat), _ptr(tri))
    assert written == total, (written, total)
    return pos, nrm, uv, mat, tri
