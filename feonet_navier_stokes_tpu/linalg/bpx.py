"""BPX-congruence conditioning for the label-free Galerkin residual loss.

Problem this solves (the large-ng residual-training wall): the least-squares
objective ||A u - f||^2 converges the solution only to
``cond(A) * achievable-relative-residual``; at the ~50k-DoF stretch scale
cond(A) ~ 2e4 and the f32 floor ~1e-7 make the label-free velocity error
O(1). Every one-sided fix fails structurally:

  * dense SPAI (the reference's preconditioner, train_FEONet.py:104-143) is
    O(ng^2) memory — impossible at 50k;
  * static-pattern sparse SPAI (Grote-Huckle) cannot represent the Stokes
    inverse at scale (measured: cond 1139 -> 1399 at ng=2467, pattern A^2);
  * the Silvester-Wathen block preconditioner H = blkdiag(K, Mp/mu)^{-1}
    clusters the GENERALIZED eigenvalues of A, but a one-sided product A@H
    has cond inflated by cond(H^{1/2}) ~ cond(K)^{1/2} — measured cond
    292->702 / 1139->4740 / 2540->15904 even with EXACT block inverses.

The structural fix is a *two-sided factored congruence*. Pick G with
G G^T ~ H spectrally and train in w-coordinates on the FREE-DoF system

    A_hat = G^T A G,      u = G w + u_bc    (BCs imposed EXACTLY)

A_hat is symmetric and its nonzero spectrum equals spec(A_ff G G^T) — the
SW-clustered one — so cond is O(1) in h. The factor G is BPX
(Bramble-Pasciak-Xu 1990): per velocity component, over nested structured
meshes (fine -> coarse),

    G_u = [ D_0^{-1/2} | P_1 D_1^{-1/2} | ... | P_L chol(K_L^{-1}) ]

with P_l the (sparse) coarse->fine P2 interpolation restricted to free
nodes, D_l the level-l stiffness diagonal, and an exact (tiny, dense)
Cholesky factor on the coarsest level; G_p = sqrt(mu) diag(Mp)^{-1/2}
(pressure mass ~ its diagonal). Everything is sparse except the coarsest
block, so A_hat stays BSR-tileable at the 50k scale, and the network head
simply emits m ~ 1.4*ng coefficients instead of ng.

Measured effective cond of G^T A G: 16.2 (ng=659) / 21.4 (ng=2467) vs raw
292 / 1139 — the log-ish growth of diagonal-scaled BPX, vs the h^{-2}
growth of the raw operator.

No reference counterpart (its SPAI is dense and its training never exceeds
ng=2549); this is the TPU-native scalable replacement demanded by
BASELINE.json's 50k-DoF stretch goal.
"""

from __future__ import annotations

import dataclasses

import numpy as np
from scipy.sparse import csr_matrix, block_diag, hstack

from ..geometry import build_taylor_hood, structured_rectangle
from ..geometry.taylor_hood import TaylorHoodSpace


def p2_node_id_grid(space: TaylorHoodSpace, nx: int) -> np.ndarray:
    """(2nx+1, 2nx+1) int32 grid mapping integer P2-node coordinates
    (in units of 1/(2nx)) to node ids. Structured meshes have a P2 node at
    EVERY lattice point (vertices + edge/diagonal midpoints)."""
    coords = space.p2_coords
    ii = np.rint(coords[:, 0] * 2 * nx).astype(np.int64)
    jj = np.rint(coords[:, 1] * 2 * nx).astype(np.int64)
    grid = np.full((2 * nx + 1, 2 * nx + 1), -1, dtype=np.int64)
    grid[ii, jj] = np.arange(coords.shape[0])
    assert (grid >= 0).all(), "structured P2 lattice has holes"
    return grid


def p2_interpolation(
    space_c: TaylorHoodSpace, nx_c: int, space_f: TaylorHoodSpace
) -> csr_matrix:
    """Sparse (n2_fine, n2_coarse) interpolation P[i,j] = phi_j^c(x_i^f) for
    nested structured rectangles ('right' diagonal). Vectorized point
    location + P2 basis evaluation; exact for nested meshes."""
    X = space_f.p2_coords
    grid = p2_node_id_grid(space_c, nx_c)
    h = 1.0 / nx_c
    cx = np.clip((X[:, 0] / h).astype(np.int64), 0, nx_c - 1)
    cy = np.clip((X[:, 1] / h).astype(np.int64), 0, nx_c - 1)
    lx = X[:, 0] / h - cx
    ly = X[:, 1] / h - cy
    lower = lx >= ly  # cell split along the lower-left -> upper-right diagonal

    # barycentric coords on the containing triangle
    l0 = np.where(lower, 1.0 - lx, 1.0 - ly)
    l1 = np.where(lower, lx - ly, ly - lx)
    l2 = np.where(lower, ly, lx)
    # P2 basis: vertices b(2b-1), edge midpoints 4 b_i b_j (edge order:
    # (0,1), (1,2), (0,2))
    vals = np.stack(
        [
            l0 * (2 * l0 - 1), l1 * (2 * l1 - 1), l2 * (2 * l2 - 1),
            4 * l0 * l1, 4 * l1 * l2, 4 * l0 * l2,
        ],
        axis=1,
    )  # (nf, 6)

    # integer offsets (units of h/2) of the 6 local nodes from (2cx, 2cy):
    # lower tri verts (0,0),(2,0),(2,2); upper (0,0),(0,2),(2,2); midpoints
    # pairwise averages.
    off_low = np.array([[0, 0], [2, 0], [2, 2], [1, 0], [2, 1], [1, 1]])
    off_up = np.array([[0, 0], [0, 2], [2, 2], [0, 1], [1, 2], [1, 1]])
    off = np.where(lower[:, None, None], off_low[None], off_up[None])  # (nf,6,2)
    gi = 2 * cx[:, None] + off[:, :, 0]
    gj = 2 * cy[:, None] + off[:, :, 1]
    cols = grid[gi, gj]  # (nf, 6)

    nf = X.shape[0]
    rows = np.repeat(np.arange(nf), 6)
    data = vals.ravel()
    colsr = cols.ravel()
    keep = np.abs(data) > 1e-14
    P = csr_matrix(
        (data[keep], (rows[keep], colsr[keep])),
        shape=(nf, space_c.n2),
    )
    P.sum_duplicates()
    return P


@dataclasses.dataclass(frozen=True)
class BPXFactor:
    """The congruence factor and BC lift for one steady Stokes problem.

    G: (ng, m) scipy CSR, float64, zero rows at constrained DoFs.
    u_bc: (ng,) float64 — BC values at constrained DoFs, 0 elsewhere.
    m: network output dimension.
    level_nx: the mesh sizes used (fine -> coarse).
    """

    G: csr_matrix
    u_bc: np.ndarray
    level_nx: tuple[int, ...]

    @property
    def m(self) -> int:
        return int(self.G.shape[1])


def _component_factor(
    spaces: list[TaylorHoodSpace],
    level_nx: list[int],
    free_masks: list[np.ndarray],
    mu: float,
) -> csr_matrix:
    """BPX factor for one velocity component on its free P2 nodes."""
    from ..fem import assemble_scalar_block

    blocks = []
    n_free_f = int(free_masks[0].sum())
    for li, (sp, free) in enumerate(zip(spaces, free_masks)):
        if li == 0:
            P = None  # identity
        else:
            P = p2_interpolation(sp, level_nx[li], spaces[0])
            P = P[free_masks[0]][:, free].tocsr()
        if li == len(spaces) - 1:
            # coarsest: exact inverse via Cholesky (small, dense)
            K_l = mu * np.asarray(assemble_scalar_block(sp, "stiffness"))
            K_l = K_l[np.ix_(free, free)]
            L = np.linalg.cholesky(np.linalg.inv(0.5 * (K_l + K_l.T)))
            Lb = csr_matrix(L)
            blocks.append(Lb if P is None else (P @ Lb).tocsr())
        else:
            # only the stiffness DIAGONAL is needed — keep assembly sparse
            # (a dense fine-level K at nx=72 would be 3.5 GB)
            d = mu * assemble_scalar_block(sp, "stiffness", fmt="csr").diagonal()
            d = d[free]
            d[d <= 0] = 1.0
            Ds = csr_matrix(
                (1.0 / np.sqrt(d), (np.arange(d.size), np.arange(d.size))),
                shape=(d.size, d.size),
            )
            blocks.append(Ds if P is None else (P @ Ds).tocsr())
    out = hstack(blocks, format="csr")
    assert out.shape[0] == n_free_f
    return out


def bpx_factor(
    space: TaylorHoodSpace,
    nx: int,
    bc_mask: np.ndarray,
    bc_values: np.ndarray,
    bc_name: str,
    mu: float,
    levels: int = 3,
    coarsest_nx: int = 2,
) -> BPXFactor:
    """Build the full mixed-space congruence factor G (ng x m).

    levels: number of mesh levels (fine included); each coarser level halves
    nx (floor), stopping at coarsest_nx. Structured squares only (the nested
    hierarchy the interpolation assumes).
    """
    from ..fem import assemble_scalar_block, make_bc
    from ..fem.bcs import square_bcs

    level_nx = [nx]
    for _ in range(levels - 1):
        nxt = max(level_nx[-1] // 2, coarsest_nx)
        if nxt == level_nx[-1]:
            break
        level_nx.append(nxt)
    spaces = [space] + [
        build_taylor_hood(structured_rectangle(n, n)) for n in level_nx[1:]
    ]
    bcs = [None] + [make_bc(sp, square_bcs(bc_name)) for sp in spaces[1:]]

    n2, n1, ng = space.n2, space.n1, space.ng
    mask = np.asarray(bc_mask)

    comp_blocks = []
    row_maps = []
    for comp in (0, 1):
        free_f = mask[comp * n2 : (comp + 1) * n2] == 0
        masks = [free_f]
        for sp, b in zip(spaces[1:], bcs[1:]):
            m_l = np.asarray(b.mask)
            masks.append(m_l[comp * sp.n2 : (comp + 1) * sp.n2] == 0)
        comp_blocks.append(_component_factor(spaces, level_nx, masks, mu))
        row_maps.append(np.flatnonzero(free_f) + comp * n2)

    # pressure: diag(Mp)^{-1/2} * sqrt(mu) on free P1 nodes
    pfree = mask[2 * n2 :] == 0
    Mp_diag = assemble_scalar_block(space, "mass_p1", fmt="csr").diagonal()
    dp = Mp_diag[pfree]
    Gp = csr_matrix(
        (np.sqrt(mu / dp), (np.arange(dp.size), np.arange(dp.size))),
        shape=(dp.size, dp.size),
    )
    comp_blocks.append(Gp)
    row_maps.append(np.flatnonzero(pfree) + 2 * n2)

    G_free = block_diag(comp_blocks, format="csr")  # (n_free, m)
    rows = np.concatenate(row_maps)
    # scatter free rows into the full ng row space
    scatter = csr_matrix(
        (np.ones(rows.size), (rows, np.arange(rows.size))),
        shape=(ng, rows.size),
    )
    G = (scatter @ G_free).tocsr()
    G.sum_duplicates()

    u_bc = np.where(mask > 0.5, np.asarray(bc_values, dtype=np.float64), 0.0)
    return BPXFactor(G=G, u_bc=u_bc, level_nx=tuple(level_nx))
