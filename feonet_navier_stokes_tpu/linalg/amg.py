"""Algebraic (smoothed-aggregation) BPX hierarchy for unstructured meshes.

linalg/bpx.py builds its congruence factor from NESTED structured meshes —
unavailable on the square-with-hole domain (the reference's open problem:
its ne=512 GRF config never converges, FEONet-square-with-hole/
plot_results_channel_grf.ipynb cell 18, and its dense SPAI is the only
conditioning it has). This module supplies the same multilevel factor

    G_u = [ D_0^{-1/2} | P_1 D_1^{-1/2} | ... | P_L chol(K_L^{-1}) ]

with the interpolations P_l and coarse operators K_{l+1} = P_l^T K_l P_l
built ALGEBRAICALLY by smoothed aggregation (Vanek-Mandel-Brezina):

  1. strength graph  S_ij = |K_ij| / sqrt(K_ii K_jj) >= theta,
  2. greedy root aggregation (root + its strong neighbours; stragglers
     attach to the strongest adjacent aggregate),
  3. tentative piecewise-constant prolongation smoothed by one damped
     Jacobi sweep  P = (I - omega D^{-1} K) T.

Everything stays sparse (BSR-tileable); only the coarsest level gets a tiny
dense Cholesky. Host-side, float64, runs once at problem build.
"""

from __future__ import annotations

import numpy as np
from scipy.sparse import csr_matrix, diags


def strength_graph(K: csr_matrix, theta: float = 0.08) -> csr_matrix:
    """Symmetric strength-of-connection graph (0/1 pattern, no diagonal)."""
    K = csr_matrix(K)
    d = np.abs(K.diagonal())
    d[d == 0] = 1.0
    Kc = K.tocoo()
    scale = np.sqrt(d[Kc.row] * d[Kc.col])
    keep = (np.abs(Kc.data) >= theta * scale) & (Kc.row != Kc.col)
    S = csr_matrix(
        (np.ones(keep.sum()), (Kc.row[keep], Kc.col[keep])), shape=K.shape
    )
    return ((S + S.T) > 0).astype(np.float64).tocsr()


def aggregate(S: csr_matrix) -> np.ndarray:
    """Greedy root-based aggregation on the strength graph.

    Returns (n,) int aggregate labels, every node assigned."""
    n = S.shape[0]
    agg = np.full(n, -1, dtype=np.int64)
    indptr, indices = S.indptr, S.indices
    n_agg = 0
    # pass 1: roots whose whole neighbourhood is unaggregated
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        if (agg[nbrs] >= 0).any():
            continue
        agg[i] = n_agg
        agg[nbrs] = n_agg
        n_agg += 1
    # pass 2: attach stragglers to an adjacent aggregate
    for i in range(n):
        if agg[i] >= 0:
            continue
        nbrs = indices[indptr[i] : indptr[i + 1]]
        hit = nbrs[agg[nbrs] >= 0]
        if hit.size:
            agg[i] = agg[hit[0]]
    # pass 3: isolated leftovers become singleton aggregates
    for i in range(n):
        if agg[i] < 0:
            agg[i] = n_agg
            n_agg += 1
    return agg


def smoothed_prolongation(
    K: csr_matrix, agg: np.ndarray, omega: float = 2.0 / 3.0
) -> csr_matrix:
    """P = (I - omega D^{-1} K) T with T the tentative (piecewise-constant,
    column-normalized) aggregate prolongation."""
    n = K.shape[0]
    n_agg = int(agg.max()) + 1
    counts = np.bincount(agg, minlength=n_agg).astype(np.float64)
    T = csr_matrix(
        (1.0 / np.sqrt(counts[agg]), (np.arange(n), agg)), shape=(n, n_agg)
    )
    d = K.diagonal()
    d[d == 0] = 1.0
    Dinv = diags(1.0 / d)
    P = (T - omega * (Dinv @ (K @ T))).tocsr()
    P.eliminate_zeros()
    return P


def sa_hierarchy(
    K: csr_matrix,
    coarsest: int = 80,
    max_levels: int = 10,
    theta: float = 0.08,
    omega: float = 2.0 / 3.0,
):
    """Smoothed-aggregation hierarchy: [(K_0, None), (K_1, P_1), ...] with
    P_l the FINE-from-coarse prolongation at level l and
    K_{l+1} = P^T K_l P. Stops when the level is small enough for a dense
    Cholesky or aggregation stalls."""
    levels = [(csr_matrix(K, copy=True).astype(np.float64), None)]
    while levels[-1][0].shape[0] > coarsest and len(levels) < max_levels:
        K_l = levels[-1][0]
        agg = aggregate(strength_graph(K_l, theta))
        n_agg = int(agg.max()) + 1
        if n_agg >= K_l.shape[0]:  # aggregation stalled
            break
        P = smoothed_prolongation(K_l, agg, omega)
        K_next = (P.T @ K_l @ P).tocsr()
        levels.append((K_next, P))
    return levels


def sa_bpx_component(K_free: csr_matrix, **kw) -> csr_matrix:
    """Algebraic BPX factor for one scalar component on its free nodes:
    G = [D_0^{-1/2} | P_1 D_1^{-1/2} | ... | (P_1..P_L) chol(K_L^{-1})].
    Mirrors linalg/bpx._component_factor with SA levels in place of nested
    meshes."""
    from scipy.sparse import hstack

    levels = sa_hierarchy(K_free, **kw)
    blocks = []
    P_acc = None  # fine-from-level-l accumulated prolongation
    for li, (K_l, P_l) in enumerate(levels):
        if P_l is not None:
            P_acc = P_l if P_acc is None else (P_acc @ P_l).tocsr()
        last = li == len(levels) - 1
        if last:
            Kd = K_l.toarray()
            L = np.linalg.cholesky(np.linalg.inv(0.5 * (Kd + Kd.T)))
            B = csr_matrix(L)
        else:
            d = K_l.diagonal().copy()
            d[d <= 0] = 1.0
            B = diags(1.0 / np.sqrt(d)).tocsr()
        blocks.append(B if P_acc is None else (P_acc @ B).tocsr())
    return hstack(blocks, format="csr")


def bpx_factor_algebraic(
    space,
    bc_mask: np.ndarray,
    bc_values: np.ndarray,
    mu: float,
    A64: np.ndarray | None = None,
    coarsest: int = 80,
    max_levels: int = 10,
    theta: float = 0.08,
    omega: float = 2.0 / 3.0,
):
    """Full mixed-space congruence factor for an UNSTRUCTURED Taylor-Hood
    space (the square-with-hole path). Same contract as
    linalg.bpx.bpx_factor (returns a BPXFactor; level_nx records the level
    SIZES instead of mesh nx).

    Velocity: VECTOR-BLOCK smoothed aggregation — aggregates are formed per
    component on the scalar-Laplacian strength graph, but the tentative
    prolongation is smoothed with (and the coarse operators are Galerkin
    projections of) the ACTUAL free-free velocity block of A, so the
    sym-grad cross-coupling (Korn) is captured. Measured on the hole ne=512
    channel system: eff-cond 134 vs 173-207 for per-component scalar SA,
    78 for an exact A_vv inverse (the saddle/inf-sup floor), 1943 raw.
    Pressure: sqrt(mu) diag(Mp)^{-1/2} (measured better than the full
    chol(Mp^{-1}) here).

    ``A64`` is the BC-applied system matrix (dense or scipy sparse); when
    None, only the scalar per-component path is available and a ValueError
    is raised (the vector path is the production one).
    """
    from scipy.sparse import bmat, hstack

    from ..fem import assemble_scalar_block
    from .bpx import BPXFactor

    if A64 is None:
        raise ValueError("bpx_factor_algebraic needs the BC-applied A64")
    n2, ng = space.n2, space.ng
    mask = np.asarray(bc_mask)
    K = (mu * assemble_scalar_block(space, "stiffness", fmt="csr")).tocsr()

    free0 = mask[:n2] == 0
    free1 = mask[n2 : 2 * n2] == 0
    iv = np.flatnonzero(mask[: 2 * n2] == 0)
    ip = np.flatnonzero(mask[2 * n2 :] == 0) + 2 * n2
    from scipy.sparse import issparse

    A_sp = csr_matrix(A64) if not issparse(A64) else A64.tocsr()
    Avv = A_sp[iv][:, iv].tocsr().astype(np.float64)
    K0 = K[free0][:, free0].tocsr()
    K1 = K[free1][:, free1].tocsr()

    # vector SA hierarchy: (A_l, P_l, scalar aggregation operators per comp)
    levels = [(Avv, None, (K0, K1), (int(free0.sum()), int(free1.sum())))]
    while levels[-1][0].shape[0] > coarsest and len(levels) < max_levels:
        A_l, _, (K0l, K1l), (m0, m1) = levels[-1]
        agg0 = aggregate(strength_graph(K0l, theta))
        agg1 = aggregate(strength_graph(K1l, theta))
        na0, na1 = int(agg0.max()) + 1, int(agg1.max()) + 1
        if na0 + na1 >= m0 + m1:  # stalled
            break
        c0 = np.bincount(agg0, minlength=na0).astype(np.float64)
        c1 = np.bincount(agg1, minlength=na1).astype(np.float64)
        T0 = csr_matrix(
            (1.0 / np.sqrt(c0[agg0]), (np.arange(m0), agg0)), shape=(m0, na0)
        )
        T1 = csr_matrix(
            (1.0 / np.sqrt(c1[agg1]), (np.arange(m1), agg1)), shape=(m1, na1)
        )
        T = bmat([[T0, None], [None, T1]], format="csr")
        d = A_l.diagonal()
        d[d == 0] = 1.0
        P = (T - omega * (diags(1.0 / d) @ (A_l @ T))).tocsr()
        levels.append((
            (P.T @ A_l @ P).tocsr(), P,
            ((T0.T @ K0l @ T0).tocsr(), (T1.T @ K1l @ T1).tocsr()),
            (na0, na1),
        ))

    blocks = []
    P_acc = None
    for li, (A_l, P_l, _, _) in enumerate(levels):
        if P_l is not None:
            P_acc = P_l if P_acc is None else (P_acc @ P_l).tocsr()
        if li == len(levels) - 1:
            Ad = A_l.toarray()
            L = np.linalg.cholesky(np.linalg.inv(0.5 * (Ad + Ad.T)))
            B = csr_matrix(L)
        else:
            d = A_l.diagonal().copy()
            d[d <= 0] = 1.0
            B = diags(1.0 / np.sqrt(d)).tocsr()
        blocks.append(B if P_acc is None else (P_acc @ B).tocsr())
    Gv = hstack(blocks, format="csr")

    pfree = mask[2 * n2 :] == 0
    dp = assemble_scalar_block(space, "mass_p1", fmt="csr").diagonal()[pfree]
    Gp = csr_matrix(
        (np.sqrt(mu / dp), (np.arange(dp.size), np.arange(dp.size))),
        shape=(dp.size, dp.size),
    )

    mv, mp_ = Gv.shape[1], Gp.shape[1]
    scat_v = csr_matrix(
        (np.ones(iv.size), (iv, np.arange(iv.size))), shape=(ng, iv.size)
    )
    scat_p = csr_matrix(
        (np.ones(ip.size), (ip, np.arange(ip.size))), shape=(ng, ip.size)
    )
    from scipy.sparse import hstack as sphstack

    G = sphstack([scat_v @ Gv, scat_p @ Gp], format="csr")
    G.sum_duplicates()
    u_bc = np.where(mask > 0.5, np.asarray(bc_values, dtype=np.float64), 0.0)
    level_sizes = tuple(lv[0].shape[0] for lv in levels)
    return BPXFactor(G=G, u_bc=u_bc, level_nx=level_sizes)
