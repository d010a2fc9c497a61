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

import numpy as np

Array = np.ndarray


def spai(A: Array, m: int) -> np.ndarray:
    """m iterations of the SPAI fixed-point; returns the approximate inverse M
    such that cond(A @ M) ~ 1 (reference cond numbers: BASELINE.md)."""
    from scipy.sparse import csr_matrix

    A = np.asarray(A, dtype=np.float64)
    n = A.shape[0]
    A_sp = csr_matrix(A)
    one_norm = np.max(np.abs(A @ A.T).sum(axis=0))
    M = (2.0 / one_norm) * A
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
