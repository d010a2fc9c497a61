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


def spai_sparse(A, pattern: str = "A"):
    """Static-pattern sparse approximate inverse (Grote-Huckle SPAI).

    The reference's SPAI (and :func:`spai` above) iterate on a DENSE M —
    O(n^2) memory, impossible at the ~50k-DoF stretch scale (18 GB f64).
    This variant constrains M to a fixed sparsity pattern and solves, for
    every column j independently,

        min_m || A[:, J] m - e_j ||_2,   J = allowed nonzeros of M[:, j]

    — a small dense least-squares per column (|J| ~ 30, |I| ~ 150 for the
    Taylor-Hood stencil), embarrassingly parallel, with M (and therefore
    the training operator A @ M) staying sparse and block-sparse-tileable.
    No reference counterpart (its dense iteration cannot scale); the
    algorithm is the classic one of Grote & Huckle, SISC 1997.

    pattern: 'A' — nonzero pattern of A (cheap, good);
             'A2' — pattern of A @ A (denser M, stronger preconditioner).
    Returns scipy CSC.
    """
    import numpy as np
    from scipy.sparse import csc_matrix, issparse

    A_csc = (A if issparse(A) else csc_matrix(np.asarray(A))).tocsc()
    A_csc = A_csc.astype(np.float64)
    A_csc.sort_indices()
    n = A_csc.shape[0]
    if pattern == "A":
        P = A_csc
    elif pattern == "A2":
        P = (A_csc @ A_csc).tocsc()
        P.sort_indices()
    else:
        raise ValueError(f"unknown pattern {pattern!r}")

    ai, aj, av = A_csc.indices, A_csc.indptr, A_csc.data
    pi, pj = P.indices, P.indptr

    rows_out: list[np.ndarray] = []
    cols_out: list[np.ndarray] = []
    vals_out: list[np.ndarray] = []
    for j in range(n):
        J = pi[pj[j] : pj[j + 1]]
        if J.size == 0:
            continue
        # rows touched by the candidate columns
        segs = [ai[aj[c] : aj[c + 1]] for c in J]
        I = np.unique(np.concatenate(segs))
        Asub = np.zeros((I.size, J.size))
        for k, c in enumerate(J):
            rr = ai[aj[c] : aj[c + 1]]
            Asub[np.searchsorted(I, rr), k] = av[aj[c] : aj[c + 1]]
        e = (I == j).astype(np.float64)
        m, *_ = np.linalg.lstsq(Asub, e, rcond=None)
        rows_out.append(J)
        cols_out.append(np.full(J.size, j, dtype=np.int64))
        vals_out.append(m)
    M = csc_matrix(
        (np.concatenate(vals_out),
         (np.concatenate(rows_out), np.concatenate(cols_out))),
        shape=(n, n),
    )
    M.sort_indices()
    return M


def equilibrate(A, iters: int = 10):
    """Ruiz two-sided diagonal equilibration (max-norm), sparsity-preserving.

    Returns (A_scaled, dr, dc) with A_scaled = diag(dr) @ A @ diag(dc) and
    every row/column max-magnitude ~1. Purpose at the ~50k-DoF stretch scale:
    the raw Galerkin system spans a huge dynamic range (unit Dirichlet rows
    vs load entries ~h^2 ~ 2e-4 at nx=72), so the f32 residual loss both
    under-weights the physics rows and runs near the f32 noise floor;
    equilibration makes every equation O(1). Diagonal scaling preserves the
    operator sparsity exactly (BSR-compatible), unlike any SPAI-class
    approximate inverse. Accepts dense or scipy sparse; returns the same kind.
    """
    import numpy as np
    from scipy.sparse import diags, issparse

    n = A.shape[0]
    dr = np.ones(n)
    dc = np.ones(n)
    if issparse(A):
        A = A.tocsr().astype(np.float64)
        for _ in range(iters):
            r = np.sqrt(np.asarray(abs(A).max(axis=1).todense()).ravel())
            c = np.sqrt(np.asarray(abs(A).max(axis=0).todense()).ravel())
            r[r == 0] = 1.0
            c[c == 0] = 1.0
            A = (diags(1.0 / r) @ A @ diags(1.0 / c)).tocsr()
            dr /= r
            dc /= c
        return A, dr, dc
    A = np.asarray(A, dtype=np.float64).copy()
    for _ in range(iters):
        r = np.sqrt(np.abs(A).max(axis=1))
        c = np.sqrt(np.abs(A).max(axis=0))
        r[r == 0] = 1.0
        c[c == 0] = 1.0
        A = A / r[:, None] / c[None, :]
        dr /= r
        dc /= c
    return A, dr, dc


def condition_number(A: Array) -> float:
    """2-norm condition number via SVD (reference: np.linalg.cond,
    train_FEONet.py:101, 138)."""
    s = np.linalg.svd(np.asarray(A, dtype=np.float64), compute_uv=False)
    return float(s[0] / s[-1])
