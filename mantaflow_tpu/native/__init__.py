"""Native host-side kernels (C++, ctypes-loaded).

The serial algorithms the reference implements in C++ that do not map to
TPU execution (heap-based fast marching, SURVEY.md §2.15.6) are C++ here
too. The shared library is compiled on first use with g++ and cached
next to the source; set MANTA_TPU_NO_NATIVE=1 to disable (callers fall
back to their JAX paths).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", src, "-o", out],
                       check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MANTA_TPU_NO_NATIVE") == "1":
        return None
    src = os.path.join(_DIR, "fastmarch.cpp")
    out = os.path.join(_DIR, "libmantanative.so")
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        if not _build(src, out):
            return None
    try:
        lib = ctypes.CDLL(out)
        lib.mtpu_reinit_march.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.mtpu_reinit_march.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def reinit_march(phi, flags, vel=None, max_time: float = 4.0,
                 ignore_walls: bool = False, correct_outer_layer: bool = True,
                 obstacle_type: int = 2):
    """Reference-exact reinitMarching (levelset.cpp:120-229 doReinitMarch).

    phi [z,y,x] float32, flags [z,y,x] int32, vel (3,z,y,x) float32 or
    None. Returns (phi, vel) as new numpy arrays; raises RuntimeError when
    the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native fastmarch unavailable")
    phi = np.ascontiguousarray(np.asarray(phi, np.float32)).copy()
    flags = np.ascontiguousarray(np.asarray(flags, np.int32))
    sz, sy, sx = phi.shape
    is3d = 1 if sz > 1 else 0
    if vel is not None:
        vel = np.ascontiguousarray(np.asarray(vel, np.float32)).copy()
        vptr = vel.ctypes.data_as(ctypes.c_void_p)
    else:
        vptr = ctypes.c_void_p(0)
    lib.mtpu_reinit_march(
        phi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        vptr, sx, sy, sz, is3d, float(max_time),
        1 if ignore_walls else 0, 1 if correct_outer_layer else 0,
        int(obstacle_type))
    return phi, vel
