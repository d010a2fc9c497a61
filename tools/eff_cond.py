"""Effective-condition pin for the BPX-congruence training system.

Computes eff-cond(G^T A G) = s_max / s_nfree (the nonzero spectrum — the
null space of the congruence is null(G), dimension m - nfree) for any
problem config, extending the committed small-scale pins (16.19 at ng=659,
21.4 at ng=2467; tests/test_bpx.py) to the large-ng stretch scales
(VERDICT r2 item 4: "eff-cond pin at the new scale").

Two regimes:
  * ng <= --max-dense: exact dense SVD (the test's method).
  * larger: Lanczos extremes — lambda_max via scipy eigsh(LM) on Ah and
    the smallest NONZERO eigenvalue via shift-invert about a small sigma
    with the null space handled by sigma placement (null eigenvalues sit
    exactly at 0; the physical spectrum is bounded away from it by the
    BPX bound, so sigma = eps * lambda_max separates them).

CPU-only (host f64): run with JAX_PLATFORM_NAME=cpu.

  python tools/eff_cond.py --problem stokes_hole --hole-h 0.06 --bpx-levels 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--problem", default="stokes_hole")
    ap.add_argument("--bc", default="channel_flow")
    ap.add_argument("--nx", type=int, default=8)
    ap.add_argument("--hole-h", type=float, default=0.1205)
    ap.add_argument("--bpx-levels", type=int, default=3)
    ap.add_argument("--amg-theta", type=float, default=0.08)
    ap.add_argument("--amg-omega", type=float, default=2.0 / 3.0)
    ap.add_argument("--op-format", default="dense")
    ap.add_argument("--max-dense", type=int, default=14000,
                    help="use exact dense SVD up to this m (memory: m^2 f64)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

    from scipy.sparse import csr_matrix
    from scipy.sparse.linalg import eigsh

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    t0 = time.time()
    p = build_problem(ProblemConfig(
        name=args.problem, bc=args.bc, nx=args.nx, hole_h=args.hole_h,
        forcing="grf" if args.problem == "stokes_hole" else None,
        bpx_levels=args.bpx_levels, op_format=args.op_format,
        amg_theta=args.amg_theta, amg_omega=args.amg_omega,
    ))
    G = csr_matrix(p.bpx64.G)
    A = csr_matrix(p.A64)
    Ah = (G.T @ A @ G).tocsr()
    nfree = int((np.asarray(p.bc.mask) == 0).sum())
    m = Ah.shape[0]
    print(f"ng={p.ng} m={m} nfree={nfree} nnz(Ah)={Ah.nnz} "
          f"[{time.time()-t0:.0f}s]", flush=True)

    # Ah from a congruence of a BC-row-applied Stokes matrix is symmetric up
    # to assembly roundoff; symmetrize for eigsh.
    Ah = (Ah + Ah.T) * 0.5

    if m <= args.max_dense:
        s = np.sort(np.linalg.svd(Ah.toarray(), compute_uv=False))[::-1]
        # numerical rank by relative tolerance, NOT the nominal nfree: the
        # BPX frame is redundant (m > nfree) AND the congruence can lose
        # additional rank (observed at h=0.06: sigma[nfree-1] ~ 1e-17, so
        # indexing at nfree-1 reported eff_cond 3e17 instead of the O(10)
        # spectrum bound). True nonzero BPX eigenvalues are O(0.01-1) while
        # f64 SVD noise is ~1e-13*sigma_max — 1e-10 separates them cleanly.
        tol = 1e-10 * float(s[0])
        nz = s[s > tol]
        lam_max, lam_min = float(s[0]), float(nz[-1])
        null_gap = float(s[len(nz)] / s[0]) if len(nz) < m else float("nan")
        nullity = int(m - len(nz))
        method = "dense-svd"
    else:
        lam_max = float(eigsh(Ah, k=1, which="LA",
                              return_eigenvectors=False)[0])
        # Smallest nonzero eigenvalue by shift-invert about sigma: eigsh
        # returns eigenvalues in |lambda - sigma| order, and every physical
        # lambda < 2*sigma is strictly closer to sigma than the null cluster
        # at 0 (distance sigma). So if the returned set contains BOTH a null
        # mode and a physical mode, the smallest physical value seen is
        # certified global-smallest-nonzero. Search sigma upward from the
        # BPX-bound guess until that certificate holds.
        sigma, k, lam_min = lam_max / 30.0, 32, None
        from scipy.sparse.linalg import ArpackNoConvergence

        for _ in range(14):
            try:
                vals = eigsh(Ah, k=k, sigma=sigma, which="LM", tol=1e-8,
                             return_eigenvectors=False)
            except ArpackNoConvergence as e:
                vals = np.asarray(e.eigenvalues)
                if vals.size < max(2, k // 4):
                    sigma *= 1.37  # nudge off a bad shift and retry
                    continue
            tol = 1e-8 * lam_max
            nulls = vals[np.abs(vals) <= tol]
            phys = np.sort(vals[vals > tol])
            if nulls.size and phys.size:
                lam_min = float(phys[0])
                break
            if phys.size == 0:
                # no physical eigenvalue within distance sigma of sigma
                # => lambda_1 >= 2*sigma; jump sigma to that bound
                sigma *= 2.0
            else:
                # all-physical window: lambda_1 may hide below — widen k
                # (and pull sigma toward the current candidate)
                k = min(2 * k, 512)
                sigma = min(sigma, float(phys[0]))
            print(f"  sigma -> {sigma:.4g} k -> {k}", flush=True)
        if lam_min is None:
            raise SystemExit("sigma search failed to certify lambda_min")
        null_gap = float("nan")
        nullity = None  # not enumerated by the shift-invert path
        method = "lanczos-shift-invert"
    eff = lam_max / lam_min
    result = {
        "problem": args.problem,
        "hole_h": args.hole_h if args.problem == "stokes_hole" else None,
        "nx": args.nx if args.problem != "stokes_hole" else None,
        "ng": int(p.ng), "m": int(m), "nfree": nfree,
        "bpx_levels": args.bpx_levels,
        "eff_cond": round(eff, 3),
        "lam_max": lam_max, "lam_min_nonzero": lam_min,
        "null_gap": null_gap, "nullity": nullity, "method": method,
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
