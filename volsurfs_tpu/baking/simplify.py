"""Python binding for the native quadric mesh simplifier (ctypes).

The reference shells out to pymeshlab for quadric decimation
(reference volsurfs_py/baker.py:682-725, mesh_extraction.py:492-539); here it
is a small C++ library compiled on first use with g++ and bound via ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None


def _native_dir() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_dir() -> str:
    d = os.path.join(_native_dir(), "build")
    os.makedirs(d, exist_ok=True)
    return d


def load_native():
    """Compile (once) and load the native mesh library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    src_files = ["mesh_simplify.cpp", "bvh_build.cpp"]
    srcs = [os.path.join(_native_dir(), f) for f in src_files]
    out = os.path.join(_build_dir(), "libmesh_native.so")
    needs_build = not os.path.exists(out) or any(
        os.path.getmtime(s) > os.path.getmtime(out) for s in srcs
    )
    if needs_build:
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-o", out] + srcs
        subprocess.run(cmd, check=True, capture_output=True)
    _LIB = ctypes.CDLL(out)
    _LIB.mesh_simplify.restype = ctypes.c_int
    _LIB.mesh_simplify.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _LIB.bvh_build_sah.restype = ctypes.c_int
    _LIB.bvh_build_sah.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return _LIB


def simplify_mesh(verts: np.ndarray, faces: np.ndarray, target_faces_ratio: float = 0.025):
    """Quadric edge-collapse decimation to ``target_faces_ratio`` of the input
    face count (the reference pipeline simplifies to 2.5%,
    reference baker.py:682-725).

    Returns (verts [V', 3] float32, faces [F', 3] int32).
    """
    lib = load_native()
    v = np.ascontiguousarray(verts, np.float64)
    f = np.ascontiguousarray(faces, np.int32)
    nv, nf = v.shape[0], f.shape[0]
    target = max(4, int(nf * target_faces_ratio))
    out_v = np.zeros_like(v)
    out_f = np.zeros_like(f)
    out_nv = ctypes.c_int(0)
    got_nf = lib.mesh_simplify(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), nv,
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), nf,
        target,
        out_v.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_f.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.byref(out_nv),
    )
    return (
        out_v[: out_nv.value].astype(np.float32),
        out_f[:got_nf].copy(),
    )
