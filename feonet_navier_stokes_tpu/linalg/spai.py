"""SPAI (sparse-approximate-inverse) preconditioner — host float64.

The reference runs this iteration in scipy.sparse on CPU at 4-31 it/s
(reference: FEONet_Stokes_square/train_FEONet.py:104-131; throughput from
FEONet_Stokes_square/test.ipynb cell 4, FEONet-square-with-hole/test.ipynb
cell 30):

    alpha_0 = 2 / ||A A^T||_1,  M_0 = alpha_0 A
    repeat m times:
        G = I - A M
        AG = A G
        alpha = tr(G^T AG) / ||AG||_F^2
        M <- M + alpha G

This is setup-time work whose output (cond(A@M) -> ~1) is a float64 parity
pin (BASELINE.md: 167.33->1.489, 542.94->1.0112, 1750.40->1.0000006), so it
runs on the host in full float64 unconditionally — never in the device dtype.
A is sparse (FEM stencil, ~30 nnz/row): applying it as CSR makes each
iteration O(nnz·n) + O(n²) instead of O(n³), far faster than the reference's
loop at the same arithmetic.

The reference estimates ||A A^T||_1 with scipy's onenormest; we use the exact
1-norm (max absolute column sum) — same fixed point, the initial alpha only
affects early iterates.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

Array = np.ndarray

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_native_lib = None
_native_tried = False


def _load_native():
    """Load (building on first use) the C++ SPAI kernel; None on failure.

    native/spai.cpp fuses the iteration into ~3 n^2 memory passes vs the
    scipy path's ~8 — the iteration is bandwidth-bound, so this is the
    first-party native replacement for the reference's external-C++ hot
    paths (see the .cpp header).
    """
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    so = os.path.join(_NATIVE_DIR, "libfeonet_native.so")
    try:
        if not os.path.isfile(so):
            subprocess.run(
                ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.spai_iterate.restype = ctypes.c_int
        lib.spai_iterate.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
        ]
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


def _spai_native(A_sp, M: np.ndarray, m: int) -> bool:
    lib = _load_native()
    if lib is None:
        return False
    indptr = np.ascontiguousarray(A_sp.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(A_sp.indices, dtype=np.int32)
    data = np.ascontiguousarray(A_sp.data, dtype=np.float64)
    rc = lib.spai_iterate(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        M.shape[0],
        M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        int(m),
    )
    return rc == 0


def spai(A: Array, m: int) -> np.ndarray:
    """m iterations of the SPAI fixed-point; returns the approximate inverse M
    such that cond(A @ M) ~ 1 (reference cond numbers: BASELINE.md).

    Uses the native C++ kernel when buildable (bit-identical iteration order
    within each row), scipy CSR otherwise.
    """
    from scipy.sparse import csr_matrix, issparse

    A_sp = A.tocsr() if issparse(A) else csr_matrix(np.asarray(A, np.float64))
    A_sp.sort_indices()
    n = A_sp.shape[0]
    AAt = (A_sp @ A_sp.T).toarray()
    one_norm = np.max(np.abs(AAt).sum(axis=0))
    M = np.ascontiguousarray((2.0 / one_norm) * A_sp.toarray())
    if _spai_native(A_sp, M, int(m)):
        return M
    eye = np.eye(n)
    for _ in range(int(m)):
        G = eye - A_sp @ M
        AG = A_sp @ G
        # tr(G^T AG) = sum(G * AG) — no explicit n x n product for the trace.
        alpha = np.sum(G * AG) / np.sum(AG * AG)
        M += alpha * G
    return M


def condition_number(A: Array) -> float:
    """2-norm condition number via SVD (reference: np.linalg.cond,
    train_FEONet.py:101, 138)."""
    s = np.linalg.svd(np.asarray(A, dtype=np.float64), compute_uv=False)
    return float(s[0] / s[-1])
