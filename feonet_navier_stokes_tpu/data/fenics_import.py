"""Import true FEniCS-layout datasets into the canonical [u1|u2|p] ordering.

Two complementary mechanisms:

1. ``mixed_import_permutation`` — the coordinate-matching dance the reference
   performs between FEniCS's opaque mixed-space DoF order and its subspace
   orders (FEONet_Stokes_square/assemble_fenics.py:74-102), here mapping a
   reference npz (keys ``p``/``idx_sol``; layout from assemble_fenics.py:
   209-222) onto OUR canonical block ordering. Exact coordinate matching up
   to 1e-10 rounding.

2. ``match_permutation`` — a numeric permutation-recovery for artifacts with
   NO coordinate metadata (e.g. the committed SPAI preconditioners
   ``precond_72_*.npy``): greedy profile matching on rows+columns against
   already-matched anchors, with individuation for automorphism orbits. Works
   because the SPAI iteration is permutation-EQUIVARIANT — running our SPAI
   on our operator reproduces the reference's FEniCS-derived preconditioner
   entry-for-entry (~1e-11) up to the unknown FEniCS DoF permutation, which
   this recovers. That is the strongest available operator-parity pin: it
   verifies our assembled operator equals FEniCS's through 20000 iterations
   of the SPAI fixed point (any operator discrepancy would compound).
"""

from __future__ import annotations

import numpy as np

from ..geometry.taylor_hood import TaylorHoodSpace


def _coord_keys(coords: np.ndarray, ndig: int = 10) -> list[tuple]:
    c = np.round(np.asarray(coords, dtype=np.float64), ndig) + 0.0  # kill -0.0
    return [tuple(row) for row in c]


def mixed_import_permutation(
    space: TaylorHoodSpace, p_all: np.ndarray, idx_sol
) -> np.ndarray:
    """m: (ng,) canonical index -> reference mixed-space index.

    ``p_all``: (ng, 2) coordinates of every mixed DoF in the reference's
    order (npz key ``p``); ``idx_sol`` = [idx_u1, idx_u2, idx_p] mixed
    indices per component (npz key ``idx_sol``). After this,
    ``ref_vector[m]`` is in canonical order and ``ref_matrix[m][:, m]`` is
    the canonical operator.
    """
    idx_u1, idx_u2, idx_p = (np.asarray(i, dtype=np.int64) for i in idx_sol)
    out = []
    for our_coords, idx in (
        (space.p2_coords, idx_u1),
        (space.p2_coords, idx_u2),
        (space.p1_coords, idx_p),
    ):
        key2ref = dict(zip(_coord_keys(p_all[idx]), idx))
        if len(key2ref) != len(idx):
            raise ValueError("duplicate DoF coordinates within a component")
        try:
            out.append(np.array([key2ref[k] for k in _coord_keys(our_coords)]))
        except KeyError as e:
            raise ValueError(
                f"reference dataset has no DoF at coordinate {e} — "
                "mesh mismatch?"
            ) from None
    return np.concatenate(out)


def load_reference_npz(path: str, space: TaylorHoodSpace | None = None) -> dict:
    """Load a reference-layout npz; with ``space``, add canonical-order views.

    Canonicalized keys (suffix ``_canonical``): ``matrix`` (and ``A``/``B1``/
    ``B2``/``S`` when present), ``{train,validate}_load_vectors``, and the
    per-component ``fenics_u1/u2/p`` stacks (stored in idx_sol slice order,
    assemble_fenics.py:144-147).
    """
    with np.load(path, allow_pickle=True) as z:
        data = {k: z[k] for k in z.files}
    if space is None:
        return data
    m = mixed_import_permutation(space, data["p"], data["idx_sol"])
    data["import_perm"] = m
    for key in ("matrix", "A", "B1", "B2", "S"):
        if key in data and data[key].ndim == 2:
            data[f"{key}_canonical"] = data[key][np.ix_(m, m)]
    for key in ("train_load_vectors", "validate_load_vectors", "load_vector"):
        if key in data and np.asarray(data[key]).size:
            data[f"{key}_canonical"] = np.asarray(data[key])[..., m]
    # component stacks: stored in the order of idx_sol slices; our canonical
    # component blocks are contiguous, so m's segments give the right gather
    n2 = space.n2
    idx_u1, idx_u2, idx_p = (np.asarray(i) for i in data["idx_sol"])
    pos = {int(r): j for j, r in enumerate(idx_u1)}
    g_u1 = np.array([pos[int(r)] for r in m[:n2]])
    pos = {int(r): j for j, r in enumerate(idx_u2)}
    g_u2 = np.array([pos[int(r)] for r in m[n2 : 2 * n2]])
    pos = {int(r): j for j, r in enumerate(idx_p)}
    g_p = np.array([pos[int(r)] for r in m[2 * n2 :]])
    for prefix in ("train", "validate"):
        for comp, g in (("u1", g_u1), ("u2", g_u2), ("p", g_p)):
            key = f"{prefix}_fenics_{comp}"
            if key in data and np.asarray(data[key]).size:
                data[f"{key}_canonical"] = np.asarray(data[key])[..., g]
    return data


def match_permutation(
    Ma: np.ndarray, Mb: np.ndarray, tol: float = 1e-6
) -> np.ndarray:
    """Recover m with ``Ma == Mb[m][:, m]`` for permutation-equivalent
    matrices (entry noise below ``tol``).

    Greedy anchor propagation on row+column profiles; exact-tie orbits
    (matrix automorphisms, e.g. interchangeable Dirichlet rows) are resolved
    by individuation — any within-orbit choice yields an equally valid
    permutation (conjugation by an automorphism preserves every similarity
    invariant, condition numbers included).
    """
    Ma = np.asarray(Ma, dtype=np.float64)
    Mb = np.asarray(Mb, dtype=np.float64)
    n = Ma.shape[0]
    if Ma.shape != Mb.shape or Ma.shape != (n, n):
        raise ValueError("need two square matrices of equal size")
    da, db = np.diag(Ma), np.diag(Mb)
    order_a, order_b = np.argsort(da), np.argsort(db)
    sa = da[order_a]
    gap = sa[1:] - sa[:-1]
    ok = np.ones(n, bool)
    ok[1:] &= gap > tol
    ok[:-1] &= gap > tol
    match_a = list(order_a[ok])
    match_b = list(order_b[ok])
    ua = [i for i in range(n) if i not in set(match_a)]
    ub = [j for j in range(n) if j not in set(match_b)]
    while ua:
        Va = np.concatenate([Ma[np.ix_(ua, match_a)], Ma[np.ix_(match_a, ua)].T], axis=1)
        Vb = np.concatenate([Mb[np.ix_(ub, match_b)], Mb[np.ix_(match_b, ub)].T], axis=1)
        D = (
            np.abs(Va[:, None, :] - Vb[None, :, :]).max(-1)
            + np.abs(da[ua][:, None] - db[ub][None, :])
        )
        new_a, new_b, used = [], [], set()
        for k in np.argsort(D.min(1)):
            j = int(np.argmin(D[k]))
            if j in used:
                continue
            row = np.sort(D[k])
            if row[0] < tol and (len(row) == 1 or row[1] > 10 * max(row[0], 1e-12)):
                new_a.append(ua[k])
                new_b.append(ub[j])
                used.add(j)
        if not new_a:
            # individuation: force the best pair in an automorphism orbit
            k = int(np.argmin(D.min(1)))
            j = int(np.argmin(D[k]))
            if D[k, j] >= tol:
                raise ValueError(
                    f"matrices are not permutation-equivalent at tol={tol} "
                    f"(best residual {D[k, j]:.3e})"
                )
            new_a, new_b = [ua[k]], [ub[j]]
        match_a += new_a
        match_b += new_b
        sa_, sb_ = set(new_a), set(new_b)
        ua = [i for i in ua if i not in sa_]
        ub = [j for j in ub if j not in sb_]
    m = np.empty(n, dtype=np.int64)
    for i, j in zip(match_a, match_b):
        m[i] = j
    return m
