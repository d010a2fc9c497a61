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

import numpy as np

from .._native import as_f64, as_i32, as_i64, native_lib

Array = np.ndarray


def _spai_native(A_sp, M: np.ndarray, m: int) -> bool:
    """Run the fused C++ iteration (native/spai.cpp: ~3 n^2 memory passes vs
    numpy's ~8 — the iteration is bandwidth-bound); False -> use scipy."""
    lib = native_lib()
    if lib is None:
        return False
    indptr = as_i64(A_sp.indptr)
    indices = as_i32(A_sp.indices)
    data = as_f64(A_sp.data)
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
