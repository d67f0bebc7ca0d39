"""Build + ctypes-load native C++ kernels (offline/export path).

Kernels compile on first use with the system g++ into a per-user cache dir;
Python falls back to the NumPy implementations when compilation fails
(e.g. no toolchain). No pybind11 required — plain C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_CACHE_DIR = os.environ.get(
    "SDTPU_NATIVE_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "sdtpu_native"))


def _compile(src_name: str, lib_name: str) -> str:
    src = os.path.join(_SRC_DIR, src_name)
    with open(src, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    os.makedirs(_CACHE_DIR, exist_ok=True)
    lib_path = os.path.join(_CACHE_DIR, f"{lib_name}-{digest}.so")
    if not os.path.exists(lib_path):
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               "-std=c++17", "-o", lib_path, src]
        logger.info("Compiling native kernel: %s", " ".join(cmd))
        subprocess.run(cmd, check=True, capture_output=True)
    return lib_path


def load_marching_tets():
    """-> callable(field [N,N,N] float32, iso) -> (verts, faces)."""
    lib = ctypes.CDLL(_compile("marching_tets.cpp", "libmarching_tets"))
    lib.marching_tets.restype = ctypes.c_int
    lib.marching_tets.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]

    def run(field: np.ndarray, iso: float = 0.0):
        field = np.ascontiguousarray(field, np.float32)
        n = field.shape[0]
        assert field.shape == (n, n, n)
        out_v = ctypes.POINTER(ctypes.c_float)()
        out_f = ctypes.POINTER(ctypes.c_int)()
        nv = ctypes.c_int()
        nf = ctypes.c_int()
        rc = lib.marching_tets(
            field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            ctypes.c_float(iso), ctypes.byref(out_v), ctypes.byref(out_f),
            ctypes.byref(nv), ctypes.byref(nf))
        if rc != 0:
            raise RuntimeError("marching_tets native kernel failed")
        try:
            verts = np.ctypeslib.as_array(out_v,
                                          shape=(nv.value, 3)).copy()
            faces = np.ctypeslib.as_array(out_f,
                                          shape=(nf.value, 3)).copy()
        finally:
            lib.mt_free(out_v)
            lib.mt_free(out_f)
        return verts.astype(np.float32), faces.astype(np.int32)

    return run
