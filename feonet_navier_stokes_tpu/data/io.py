"""Dataset .npz writer/reader with the reference's key layout.

Mirrors the reference artifact contract (SURVEY.md C11;
FEONet_Stokes_square/assemble_fenics.py:209-222) so a reference user finds
the same keys: ne, ng, p (mixed DoF coordinates), gfl (boundary flags),
idx_sol, pos_u, pos_p, matrix, train/validate coeff_fs + load_vectors +
fenics_u1/u2/p — with our canonical [u1|u2|p] ordering (idx_sol holds the
contiguous index ranges, so downstream gathers work unchanged).

Filename convention mirrors the reference
(`P2x1_ne{NE}_stokes[_{bc}_BC[_{force}][_dt_{dt}]].npz`,
create_data.py:44-58) minus the hardcoded absolute paths (SURVEY.md warts).
"""

from __future__ import annotations

import os

import numpy as np

from ..problems.base import Problem


def dataset_path(
    root: str, problem: Problem, kind_suffix: str = ""
) -> str:
    c = problem.config
    ne = problem.space.mesh.num_cells
    base = f"P2x1_ne{ne}_{c.name}"
    parts = [base, c.bc, "BC"]
    if c.forcing not in ("sincos",):
        parts.append(c.forcing)
    if c.name.startswith("timedep"):
        parts.append(f"dt_{str(c.dt).replace('.', '_')}")
    name = "_".join(parts) + kind_suffix + ".npz"
    return os.path.join(root, name)


def export_reference_npz(
    path: str,
    problem: Problem,
    train_batch: dict,
    train_truth,
    val_batch: dict,
    val_truth,
) -> None:
    sp = problem.space
    n2 = sp.n2
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def split3(truth):
        t = np.asarray(truth)
        return t[..., :n2], t[..., n2 : 2 * n2], t[..., 2 * n2 :]

    tr_u1, tr_u2, tr_p = split3(train_truth)
    va_u1, va_u2, va_p = split3(val_truth)

    payload = dict(
        ne=sp.mesh.num_cells,
        ng=sp.ng,
        p=sp.mixed_coords(),
        gfl=np.asarray(problem.bc.mask).reshape(-1, 1),
        idx_sol=np.array(
            [np.asarray(i) for i in sp.idx_sol], dtype=object
        ),
        pos_u=sp.p2_coords,
        pos_p=sp.p1_coords,
        matrix=np.asarray(problem.A64),
        train_fenics_u1=tr_u1,
        train_fenics_u2=tr_u2,
        train_fenics_p=tr_p,
        validate_fenics_u1=va_u1,
        validate_fenics_u2=va_u2,
        validate_fenics_p=va_p,
    )
    for prefix, batch in (("train", train_batch), ("validate", val_batch)):
        if "coeff_f" in batch:
            payload[f"{prefix}_coeff_fs"] = np.asarray(batch["coeff_f"])
        if "load" in batch:
            # the reference layout holds RAW BC-applied loads; an
            # equilibrated problem's in-memory batch load is dr-scaled,
            # so recompute from the sample parameters (exact, host f64)
            if problem.equil64 is not None:
                payload[f"{prefix}_load_vectors"] = problem.load64(batch)
            else:
                payload[f"{prefix}_load_vectors"] = np.asarray(batch["load"])
        if "grf_ux" in batch:
            payload[f"{prefix}_forcing_term"] = np.concatenate(
                [np.asarray(batch["grf_ux"]), np.asarray(batch["grf_uy"])], axis=1
            )
        if "ic_coeffs" in batch:
            payload[f"{prefix}_coeffs_init"] = np.asarray(batch["ic_coeffs"])
        if "u_init" in batch:
            payload[f"{prefix}_values_init"] = np.asarray(batch["u_init"])
    if problem.config.name == "steady_ns":
        payload["A"] = np.asarray(problem.A64)
        payload["B1"] = np.asarray(problem.B1_64)
        payload["B2"] = np.asarray(problem.B2_64)
    if problem.config.name.startswith("timedep"):
        payload["S"] = np.asarray(problem.S64)
        payload["A"] = np.asarray(problem.A64)
        payload["load_vector"] = np.asarray(problem.load_const64)
    np.savez(path, **payload)

