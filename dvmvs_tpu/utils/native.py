"""ctypes bindings for the native (C++) components in native/.

Builds the shared library on first use (g++ via the shipped Makefile) —
mirrors how the reference JIT-compiles its CUDA kernel at import
(run-tsdf-reconstruction.py:79, PyCUDA SourceModule).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdvmvs_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.mc_run.argtypes = [
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.c_void_p),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mc_run.restype = ctypes.c_int
    lib.mc_get_vertices.argtypes = [ctypes.c_void_p, np.ctypeslib.ndpointer(np.float32, flags="C")]
    lib.mc_get_normals.argtypes = [ctypes.c_void_p, np.ctypeslib.ndpointer(np.float32, flags="C")]
    lib.mc_get_faces.argtypes = [ctypes.c_void_p, np.ctypeslib.ndpointer(np.int32, flags="C")]
    lib.mc_free.argtypes = [ctypes.c_void_p]
    lib.ply_write_mesh.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32, flags="C"),
        ctypes.c_int64,
    ]
    lib.ply_write_mesh.restype = ctypes.c_int
    lib.ply_write_points.argtypes = [
        ctypes.c_char_p,
        np.ctypeslib.ndpointer(np.float32, flags="C"),
        np.ctypeslib.ndpointer(np.uint8, flags="C"),
        ctypes.c_int64,
    ]
    lib.ply_write_points.restype = ctypes.c_int
    _lib = lib
    return lib


def marching_cubes(volume: np.ndarray, level: float = 0.0
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a (dx, dy, dz) float volume.

    Returns (verts (N,3) float32 voxel coords, faces (M,3) int32,
    normals (N,3) float32).
    """
    lib = _load()
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    dx, dy, dz = vol.shape
    handle = ctypes.c_void_p()
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    rc = lib.mc_run(vol, dx, dy, dz, float(level),
                    ctypes.byref(handle), ctypes.byref(nv), ctypes.byref(nf))
    if rc != 0:
        raise RuntimeError(f"mc_run failed: {rc}")
    try:
        verts = np.empty((nv.value, 3), np.float32)
        norms = np.empty((nv.value, 3), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        if nv.value:
            lib.mc_get_vertices(handle, verts)
            lib.mc_get_normals(handle, norms)
        if nf.value:
            lib.mc_get_faces(handle, faces)
    finally:
        lib.mc_free(handle)
    return verts, faces, norms


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                   norms: np.ndarray, colors: np.ndarray):
    lib = _load()
    rc = lib.ply_write_mesh(
        path.encode(), np.ascontiguousarray(verts, np.float32),
        np.ascontiguousarray(norms, np.float32),
        np.ascontiguousarray(colors, np.uint8), len(verts),
        np.ascontiguousarray(faces, np.int32), len(faces))
    if rc != 0:
        raise RuntimeError(f"ply_write_mesh failed: {rc}")


def write_points_ply(path: str, xyz: np.ndarray, rgb: np.ndarray):
    lib = _load()
    rc = lib.ply_write_points(
        path.encode(), np.ascontiguousarray(xyz, np.float32),
        np.ascontiguousarray(rgb, np.uint8), len(xyz))
    if rc != 0:
        raise RuntimeError(f"ply_write_points failed: {rc}")
