"""Loader for the first-party native host kernels (native/*.cpp).

The reference's native compute lives in external C++ dependencies (DOLFIN
assembly, mshr meshing, MUMPS solves); this framework's host-side hot paths
have first-party C++ equivalents in ``native/``, compiled on first use into
one shared library and bound via ctypes (pybind11 is not in the image).
Every caller keeps a pure numpy/scipy fallback — the native library is a
throughput optimization, never a correctness dependency.

Kernels:
  * ``spai_iterate``  — SPAI preconditioner fixed point (linalg/spai.py)
  * ``load_sincos``   — batched sin/cos load-vector assembly (fem/assemble.py)
"""

from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
)
_lib = None
_tried = False

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f64p = ctypes.POINTER(ctypes.c_double)

_SIGNATURES = {
    # int spai_iterate(indptr, indices, data, n, M, iters)
    "spai_iterate": [_i64p, _i32p, _f64p, ctypes.c_int64, _f64p, ctypes.c_int64],
    # int load_sincos(xq, wdet, v2, dofs, coeffs, B, nc, nq,
    #                 validate_form, n2, ng, out)
    "load_sincos": [
        _f64p, _f64p, _f64p, _i32p, _f64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, _f64p,
    ],
}


def native_lib():
    """The loaded CDLL (building it on first use), or None if unavailable."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    so = os.path.join(_NATIVE_DIR, "libfeonet_native.so")
    try:
        # rebuild when missing or older than any source (dlopen caches by
        # path, so the staleness check must happen BEFORE the first CDLL)
        srcs = [
            os.path.join(_NATIVE_DIR, f)
            for f in os.listdir(_NATIVE_DIR)
            if f.endswith(".cpp")
        ]
        stale = not os.path.isfile(so) or os.path.getmtime(so) < max(
            os.path.getmtime(s) for s in srcs
        )
        if stale:
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        for fname, argtypes in _SIGNATURES.items():
            fn = getattr(lib, fname)
            fn.restype = ctypes.c_int
            fn.argtypes = argtypes
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def as_f64(a):
    import numpy as np

    return np.ascontiguousarray(a, dtype=np.float64)


def as_i32(a):
    import numpy as np

    return np.ascontiguousarray(a, dtype=np.int32)


def as_i64(a):
    import numpy as np

    return np.ascontiguousarray(a, dtype=np.int64)
