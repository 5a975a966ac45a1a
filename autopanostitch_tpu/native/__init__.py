"""Native host kernels (C++ / OpenMP), ctypes-bound.

Compiled on first use with g++ into a cached shared library (no Python
headers or pybind11 required). The TPU compute path never needs these; they
serve CPU-only deployments and the host-side crop, mirroring the
reference's MEX layer (`Procedural Program/mex/`).

Falls back gracefully: importers catch exceptions and use the numpy paths.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_LIB = None
_SRC = os.path.join(os.path.dirname(__file__), "kernels.cpp")


def _build_lib() -> str:
    # Per-user cache dir (0700) + source-content hash in the filename: no
    # other user can pre-plant a kernels.so that CDLL would pick up, and a
    # source edit always misses the cache (mtime tricks can't help).
    cache = os.path.join(
        os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
        "autopanostitch",
    )
    os.makedirs(cache, mode=0o700, exist_ok=True)
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(cache, f"kernels_{digest}.so")
    if os.path.exists(so):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp", _SRC, "-o", so]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
    except subprocess.CalledProcessError:
        # retry without OpenMP / arch flags
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", so],
            check=True,
            capture_output=True,
        )
    return so


def _lib():
    global _LIB
    if _LIB is None:
        so = _build_lib()
        lib = ctypes.CDLL(so)
        lib.hamming_2nn.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.max_rectangle.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        _LIB = lib
    return _LIB


def hamming_2nn(A: np.ndarray, B: np.ndarray):
    """Exact 2-NN Hamming over packed uint8 descriptors.

    Args: A (na, nbytes) uint8, B (nb, nbytes) uint8.
    Returns (idx (na,) int32 into B, d1 (na,) int32, d2 (na,) int32).
    """
    A = np.ascontiguousarray(A, np.uint8)
    B = np.ascontiguousarray(B, np.uint8)
    na, nbytes = A.shape
    nb, nb2 = B.shape
    assert nbytes == nb2
    idx = np.empty(na, np.int32)
    d1 = np.empty(na, np.int32)
    d2 = np.empty(na, np.int32)
    _lib().hamming_2nn(
        A.ctypes.data, na, B.ctypes.data, nb, nbytes,
        idx.ctypes.data, d1.ctypes.data, d2.ctypes.data,
    )
    return idx, d1, d2


def max_rectangle(mask: np.ndarray):
    """Largest all-true rectangle. Returns (r0, r1, c0, c1) or None."""
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = np.zeros(4, np.int32)
    _lib().max_rectangle(m.ctypes.data, m.shape[0], m.shape[1], out.ctypes.data)
    if out[1] <= out[0] or out[3] <= out[2]:
        return None
    return tuple(int(v) for v in out)
