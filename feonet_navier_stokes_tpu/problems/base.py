"""Problem setup: mesh + space + BCs + operators + samplers + ground truth.

Per-problem constants (verified against the reference scripts):

  stokes_square    mu=0.1, grad form, signs (-1,-1)
                   (FEONet_Stokes_square/assemble_fenics.py:59-60)
  stokes_hole      mu=0.1, symmetric-gradient form, signs (-1,+1)
                   (FEONet-square-with-hole/assemble_fenics.py:88-90)
  steady_ns        mu=0.1, grad form, signs (-1,-1), convection B1/B2
                   (FEONet_steady_Navier-Stokes/assemble_fenics.py:88-98)
  timedep_stokes   mu=1.0, grad form, signs (-1,+1), mass matrix S,
                   constant forcing (5,-5) or (0,0), dt (default 0.01)
                   (FEONet_time_dep_Stokes/assemble_fenics.py:108-136)

Precision contract: every ``*64`` attribute is a host numpy float64 array,
assembled/solved on the host UNCONDITIONALLY (no jax_enable_x64 needed, no
silent truncation on TPU backends); the unsuffixed twins are jax device
arrays at the training dtype. Ground truth recomputes float64 loads/ICs from
the float32 sample parameters (widening is exact), so truth and training
residual describe the same discrete system on every backend.

Upstream warts documented, not replicated by default:
  * steady_ns ground truth in the reference solves viscosity 0.5*mu while the
    training system assembles mu (assemble_fenics.py:192 vs :88) — our Newton
    solves the ASSEMBLED system itself (self-consistent, like the validation
    notebook compare_ordering_nonlinear.ipynb cell 25).
  * steady_ns applies bc.apply to B1/B2 in the script but not in the
    notebook; we default to masked convection rows ('masked'), with 'script'
    available.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import build_taylor_hood, structured_rectangle, square_with_hole_mesh
from ..geometry.taylor_hood import TaylorHoodSpace
from ..fem import (
    assemble_stokes,
    assemble_velocity_mass,
    assemble_convection,
    assemble_load_sincos,
    assemble_load_constant,
    assemble_load_from_velocity_values,
    assemble_scalar_block,
    apply_bc_matrix,
    apply_bc_vector,
    make_bc,
)
from ..fem.assemble import physical_quad_points, _load_from_quad_values
from ..fem.bcs import BCData, square_bcs, hole_bcs
from ..linalg import (
    spai,
    solve_dense_batched,
    implicit_euler_rollout,
    newton_solve_ns,
)
from ..residual import linear_residual, nonlinear_residual, rollout_residual
from ..sampling import (
    sample_sincos_coeffs,
    sincos_on_grid,
    grf_factor,
    sample_grf,
    GridInterpolator,
    sample_ic_coeffs,
    lower_ic_at_points,
    channel_ic_at_points,
    sample_stream_ic_modes,
    stream_ic_at_points,
    lower_ic_on_grid,
    channel_ic_on_grid,
)

Array = jax.Array

PROBLEM_NAMES = (
    "stokes_square",
    "stokes_hole",
    "steady_ns",
    "timedep_stokes",
    # stretch capability, no reference counterpart: semi-implicit (IMEX)
    # unsteady Navier-Stokes with the rollout residual (SURVEY.md §7 step 7)
    "timedep_ns",
)

_TIMEDEP = ("timedep_stokes", "timedep_ns")


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Static description of one workload (reference CLI flags, SURVEY.md C29)."""

    name: str = "stokes_square"
    bc: str = "channel_flow"  # 'lower' | 'zero' | 'channel_flow'
    forcing: str = "sincos"  # 'sincos' | 'grf' | 'five' | 'zero'
    nx: int = 6  # structured mesh cells per side (ne = 2*nx^2)
    # target edge length for the hole mesh; 0.1205 lands exactly on the
    # reference's ne=512 (ng=2539 vs its 2549 — topology-identical ng is
    # impossible for a non-CGAL generator; see test.ipynb cells 14-16)
    hole_h: float = 0.1205
    resol_in: int = 20  # CNN input grid resolution
    # GRF scattered->grid featurization: 'cubic' is the reference's
    # griddata(method='cubic') (Clough-Tocher, exact linear-map precompute);
    # 'linear' is barycentric (and the automatic fallback past ~8k points
    # where the cubic probe is quadratic in memory).
    interp: str = "cubic"
    mu: float | None = None  # None -> problem default
    dt: float = 0.01
    seq_len: int = 10  # rollout length for timedep training
    precond_iters: int = 0  # SPAI iterations (0 = off)
    # How the dense right preconditioner M (op_train = base @ M) is built:
    # 'spai'  — the reference's Frobenius steepest-descent iteration
    #           (train_FEONet.py:104-143; the parity path). Its convergence
    #           is spectrum-dependent: ~1.0 on the Stokes/hole operators but
    #           it STALLS on the equilibrated steady-NS operator (measured
    #           cond 193 after 2000 iters at nx=4, vs raw 344).
    # 'exact' — host-f64 dense inverse of the (equilibrated) training
    #           system: cond(op_train) == 1 + O(eps) by construction.
    #           O(ng^3) one-time host setup, viable at dense scales
    #           (ng <= ~5k). Activates the preconditioner even when
    #           precond_iters == 0. No reference counterpart.
    precond_mode: str = "spai"  # 'spai' | 'exact'
    ns_bc_rows: str = "masked"  # 'masked' | 'script'
    ns_truth: str = "weak"  # 'weak' (true trilinear form) | 'group'
    # Which ROOT of the nonlinear steady-NS system is "the" solution. At the
    # reference's forcing amplitudes a large minority of sincos draws
    # (~3/8 measured at nx=15) have NO dynamically reachable steady state:
    # the from-rest trajectory passes near a saddle and escapes to blowup at
    # every dt, while damped Newton — the reference's FEniCS truth
    # generator, assemble_fenics.py:204-217 — still returns an (unreachable)
    # root, making the load->root map discontinuous near the fold. When the
    # dynamics converges, Newton finds the SAME root (dist <=1.4e-9).
    # 'stable' (default): the dynamically reachable root via batched relaxed
    #   Picard + IMEX fallback + in-basin Newton polish (linalg/newton.py
    #   stable_solve_*); unreachable draws report honest residuals and are
    #   RESAMPLED by sample_converged, so the learned operator is a smooth
    #   single-valued branch. Also ~10x faster per 1000-sample set (one LU
    #   shared across the batch).
    # 'newton': the reference's branch (per-sample damped Newton, keeps
    #   unreachable roots) — parity mode only.
    ns_branch: str = "stable"
    # steady_ns only, requires a dense preconditioner: the network output is
    # a CORRECTION to the Stokes solution, added in TRAINING coordinates
    # inside the jit graph. With the Ruiz∘exact-inverse parameterization the
    # Stokes solution in training coordinates is exactly the training rhs
    # (û_st = M^{-1}(A^{-1}f / dc) = dr∘f), so the shift is one add and the
    # linear 90% of the solution map is exact linear algebra — the network
    # only learns the O(|conv|/|A|) nonlinear correction.
    stokes_shift: bool = False
    # The reference's NS ground truth assembles viscosity 0.5*mu while the
    # training operator uses mu (assemble_fenics.py:192 vs :88 — an upstream
    # half-viscosity bug, likely a dropped grad-transpose). 1.0 = consistent.
    ns_truth_mu_factor: float = 1.0
    validate_form: bool = False  # reference val-set sincos variant
    # 'dense': (ng, ng) device operators (reference scales, ng <= ~3k).
    # 'bsr'  : host CSR assembly + Pallas 128x128 block-sparse operators for
    #          the residual matmuls — the ~50k-DoF stretch path (SURVEY.md §7
    #          step 7) where dense operators would be 10 GB. Requires
    #          precond_iters == 0 (a SPAI inverse is dense).
    op_format: str = "dense"
    # Ruiz two-sided diagonal equilibration of the TRAINING system: at large
    # ng the raw Galerkin rows span a huge dynamic range (unit BC rows vs
    # ~h^2 load entries), so the f32 residual loss under-weights the physics
    # and sits near the f32 floor. Training solves diag(dr) A diag(dc) û =
    # dr*f with u = dc*û; sparsity-preserving (the BSR-scale alternative to
    # SPAI, whose inverse is dense). Ground truth always uses the raw f64
    # system. Supported for every problem: steady_ns scales the quadratic
    # term consistently (dr∘conv(dc∘û)), and for the timedep rollout this is
    # THE conditioning path — in (S + dt·A) pressure enters only through
    # dt·A, so the raw label-free residual under-weights pressure by dt²
    # (cond 3.5e5 → ~90 at ne=200, dt=0.01).
    equilibrate: bool = False
    # Rollout-loss metric (timedep problems with a dense preconditioner):
    # 'equation' — ||r̂_t||², the standard residual metric. Even exactly
    #   preconditioned this measures ||dr (S+dt·A) e_u||: column transforms
    #   cancel in any right-preconditioned residual, and in (S + dt·A)
    #   pressure enters only through dt·A — so the objective under-weights
    #   the pressure ERROR DIRECTIONS (round-2 timedep_push floor: u1
    #   0.00098 vs p 0.0230, runs/r2/RESULTS.md).
    # 'physical' — ||W ∘ (dc∘(M r̂_t))||². With the exact inverse M,
    #   dc∘(M r̂) = (S+dt·A)^{-1} dr^{-1} r̂ IS the physical per-step error,
    #   so the label-free loss measures e_u per component directly, and
    #   p_weight boosts the pressure block of W. Requires equilibrate +
    #   precond (exact mode recommended; SPAI gives an approximate error).
    rollout_metric: str = "equation"
    # Pressure-block weight in the 'physical' rollout metric (W = 1 on the
    # velocity blocks, p_weight on the p block).
    p_weight: float = 1.0
    # BPX-congruence conditioning of the label-free residual objective
    # (linalg/bpx.py): >0 = number of nested mesh levels. The network emits
    # m ~ 1.4*ng coefficients w; training solves the O(1)-conditioned
    # G^T A G w = G^T(f - A u_bc) and u = G w + u_bc imposes BCs exactly.
    # The scalable (sparse, BSR-tileable) replacement for dense SPAI at the
    # ~50k-DoF stretch scale. stokes_square/steady_ns use the structured
    # nested-mesh hierarchy; stokes_hole uses the algebraic (vector-block
    # smoothed-aggregation) hierarchy in linalg/amg.py.
    bpx_levels: int = 0
    # SA-AMG knobs for the algebraic (stokes_hole) BPX hierarchy only:
    # strength-graph drop tolerance and prolongation-smoothing weight
    # (linalg/amg.py sa_hierarchy). Ignored on the structured nested-mesh
    # path.
    amg_theta: float = 0.08
    amg_omega: float = 2.0 / 3.0
    # Assemble TRAINING load vectors on device (fem/device_assemble.py:
    # jit einsum + segment_sum at the training dtype) instead of the host
    # f64 path. The training-time lever for the resample_every infinite-
    # data regime on a single-core host (the reference's per-sample FEniCS
    # assemble(l) hot loop, FEONet_Stokes_square/assemble_fenics.py:128-135
    # — its CPU-bound analog). Ground truth ALWAYS recomputes loads on the
    # host in f64 from the stored parameters (load64), so truths are
    # unaffected; training loads differ from the host path only by f32
    # rounding. sincos forcing only (GRF featurization is host-bound
    # elsewhere); off by default for bit-stable parity with cached runs.
    device_loads: bool = False
    # Pad ng up to the next 128 multiple through the head + dense operators:
    # ng=2563 -> 2688 costs ~10% padded-out MXU work on the head and loss
    # matmuls when left to XLA's implicit tile padding (docs/performance.md
    # §3). With pad_ng the network emits ng_pad coefficients, op_train is
    # zero-padded to (ng_pad, ng_pad) and loads to ng_pad (pad rows of the
    # residual are identically 0 - 0), and ``unmap`` slices back to ng so
    # everything downstream — metrics, eval, ground truth — is unchanged.
    # Dense steady-Stokes paths only (the BSR stream already tiles at 128).
    pad_ng: bool = False
    dtype: Any = jnp.float32

    def resolved_mu(self) -> float:
        if self.mu is not None:
            return self.mu
        return 1.0 if self.name in _TIMEDEP else 0.1


class Problem:
    """All static state for one workload + pure jit-friendly methods.

    The heavy constants (operators, Cholesky factor, scatter plans) live as
    device arrays captured by closure; batches are dicts of arrays so the
    whole sample->featurize->forward->loss pipeline stays inside one jit.
    Their float64 originals stay on the host for ground truth/parity.
    """

    def __init__(self, config: ProblemConfig, space: TaylorHoodSpace, bc: BCData):
        self.config = config
        self.space = space
        # set by Trainer.__init__ when it snapshots device_ops; late operator
        # mutation would silently not reach the jitted step, so set_precond
        # raises once this flips
        self._ops_consumed = False
        self.ng_pad = space.ng  # pad_ng raises this to the next 128 multiple
        c = config
        dtype = c.dtype
        mu = c.resolved_mu()

        # Full-Dirichlet velocity BCs ('zero') leave the constant-pressure
        # nullspace — the discrete system is singular (the reference's
        # np.linalg.solve returns an arbitrary pressure mean and its
        # validation compares velocity only, 3_time_Stokes.ipynb cell 22).
        # We pin the first pressure DoF to 0 so solves are well-posed.
        if c.bc == "zero" and not np.any(bc.mask[2 * space.n2 :] > 0.5):
            mask_p = bc.mask.copy()
            vals_p = bc.values.copy()
            mask_p[2 * space.n2] = 1.0
            vals_p[2 * space.n2] = 0.0
            bc = BCData(mask=mask_p, values=vals_p)
        self.bc = bc
        self.mask = jnp.asarray(bc.mask, dtype=dtype)
        self.bc_values = jnp.asarray(bc.values, dtype=dtype)

        # --- operators: host numpy float64, device copies at working dtype ---
        self.is_bsr = c.op_format == "bsr"
        if self.is_bsr and (c.precond_iters > 0 or c.precond_mode == "exact"):
            raise ValueError("op_format='bsr' requires precond_iters=0 and "
                             "precond_mode='spai' (an approximate/exact "
                             "inverse is dense)")
        fmt = "csr" if self.is_bsr else "dense"
        if c.name == "stokes_hole":
            A_raw = assemble_stokes(
                space, mu, viscous_form="sym", div_sign_vp=-1.0, div_sign_pu=+1.0,
                fmt=fmt,
            )
        elif c.name in _TIMEDEP:
            A_raw = assemble_stokes(
                space, mu, div_sign_vp=-1.0, div_sign_pu=+1.0, fmt=fmt
            )
        else:
            A_raw = assemble_stokes(space, mu, fmt=fmt)
        A64 = apply_bc_matrix(A_raw, bc.mask)
        self.A64 = A64
        self.A = None if self.is_bsr else jnp.asarray(A64, dtype=dtype)

        self.B1 = self.B2 = None
        self.conv_row_mask = None
        if c.name in ("steady_ns", "timedep_ns"):
            B1, B2 = assemble_convection(space, fmt=fmt)
            if c.ns_bc_rows == "script":
                B1 = apply_bc_matrix(B1, bc.mask)
                B2 = apply_bc_matrix(B2, bc.mask)
            else:
                self.conv_row_mask = self.mask
            self.B1_64, self.B2_64 = B1, B2
            if self.is_bsr:
                self.B1 = self._bsr_pair(B1)
                self.B2 = self._bsr_pair(B2)
            else:
                self.B1 = jnp.asarray(B1, dtype=dtype)
                self.B2 = jnp.asarray(B2, dtype=dtype)
            # true trilinear convection for the ground-truth Newton
            from ..fem.nonlinear import make_true_convection

            self._conv_fn, self._jac_fn = make_true_convection(space)
            if c.ns_truth_mu_factor != 1.0:
                A_truth = assemble_stokes(space, mu * c.ns_truth_mu_factor)
                self.A_truth64 = apply_bc_matrix(A_truth, bc.mask)
            else:
                self.A_truth64 = A64

        self.S = None
        if c.name in _TIMEDEP:
            S64 = apply_bc_matrix(assemble_velocity_mass(space, fmt=fmt), bc.mask)
            self.S64 = S64
            self.S = self._bsr_pair(S64) if self.is_bsr else jnp.asarray(S64, dtype=dtype)
            f_const = (5.0, -5.0) if c.forcing == "five" else (0.0, 0.0)
            load64 = assemble_load_constant(space, f_const)
            load64 = apply_bc_vector(load64, bc.mask, bc.values)
            self.load_const64 = load64
            self.load_const = jnp.asarray(load64, dtype=dtype)
            self.sys64 = (S64 + c.dt * A64).tocsr() if self.is_bsr else S64 + c.dt * A64
            self.sys = None if self.is_bsr else jnp.asarray(self.sys64, dtype=dtype)

        # --- SPAI / equilibration / BPX & the training operator ---
        base64 = self.sys64 if c.name in _TIMEDEP else A64
        self.equil64 = None
        self.equil_dc = None
        self.equil_dr = None
        self.S_train = None
        self.load_const_train = None
        self.bpx64 = None
        self.bpx_G = None
        self.bpx_ubc = None
        if c.precond_mode not in ("spai", "exact"):
            raise ValueError(f"precond_mode must be 'spai' or 'exact', "
                             f"got {c.precond_mode!r}")
        if c.ns_branch not in ("stable", "newton"):
            raise ValueError(f"ns_branch must be 'stable' or 'newton', "
                             f"got {c.ns_branch!r}")
        if c.rollout_metric not in ("equation", "physical"):
            raise ValueError(f"rollout_metric must be 'equation' or "
                             f"'physical', got {c.rollout_metric!r}")
        if c.rollout_metric == "physical" and not (
            c.name in _TIMEDEP and c.equilibrate
            and (c.precond_iters > 0 or c.precond_mode == "exact")
        ):
            raise ValueError(
                "rollout_metric='physical' needs a timedep problem with "
                "equilibrate=True and a dense preconditioner (the physical "
                "error is dc∘(M r̂))"
            )
        if c.stokes_shift and not (
            c.name == "steady_ns"
            and (c.precond_iters > 0 or c.precond_mode == "exact")
        ):
            raise ValueError(
                "stokes_shift requires steady_ns with a dense preconditioner "
                "(precond_iters>0 or precond_mode='exact'): the shift is the "
                "Stokes solution expressed in the preconditioned training "
                "coordinates"
            )
        want_precond = c.precond_iters > 0 or c.precond_mode == "exact"
        if c.bpx_levels > 0:
            if want_precond or c.equilibrate:
                raise ValueError("bpx_levels is exclusive of precond_iters/"
                                 "precond_mode='exact'/equilibrate")
            if c.name == "stokes_hole":
                # unstructured domain: vector-block smoothed-aggregation
                # hierarchy (linalg/amg.py) in place of nested meshes —
                # the label-free large-ng path the reference's open problem
                # lacks (its dense SPAI is the only conditioning it has)
                from ..linalg.amg import bpx_factor_algebraic

                fac = bpx_factor_algebraic(
                    space, bc.mask, bc.values, mu, A64=A64,
                    max_levels=max(c.bpx_levels, 2),
                    theta=c.amg_theta, omega=c.amg_omega,
                )
            elif c.name not in ("stokes_square", "steady_ns"):
                raise ValueError(
                    "bpx_levels requires the structured nested-mesh "
                    "hierarchy (stokes_square / steady_ns) or the "
                    "algebraic-hierarchy path (stokes_hole)"
                )
            else:
                from ..linalg.bpx import bpx_factor

                fac = bpx_factor(
                    space, c.nx, bc.mask, bc.values, c.bc, mu,
                    levels=c.bpx_levels,
                )
            self.bpx64 = fac
            self.precond64 = None
            self.precond = None
            # FACTORED application: the training step computes
            # G^T (A (G w + u_bc) [+ conv] - f) with the BC-applied A64 and
            # BC-applied load — the BC rows differ from the raw system only
            # on rows G^T annihilates (G has zero rows there), and the
            # Gauss-Newton operator is exactly G^T A G either way. ~2x
            # cheaper per step than a precomputed G^T A G (fewer BSR tiles)
            # and generalizes to the nonlinear convection residual.
            self.op_train = (
                self._bsr_pair(base64) if self.is_bsr
                else jnp.asarray(base64, dtype=dtype)
            )
            if self.is_bsr:
                from ..ops.block_sparse import bsr_from_csr

                self.bpx_G = (
                    bsr_from_csr(fac.G),
                    bsr_from_csr(fac.G.T.tocsr()),
                )
            else:
                self.bpx_G = jnp.asarray(fac.G.toarray(), dtype=dtype)
            self.bpx_ubc = jnp.asarray(fac.u_bc, dtype=dtype)
        elif c.equilibrate:
            from ..linalg import equilibrate as _equilibrate

            base_eq, dr, dc = _equilibrate(base64)
            self.equil64 = (dr, dc)
            self._base_eq64 = base_eq
            self.equil_dc = jnp.asarray(dc, dtype=dtype)
            if c.name in ("steady_ns", "timedep_ns"):
                # the quadratic term needs the row scale at train time
                self.equil_dr = jnp.asarray(dr, dtype=dtype)
            self.precond64 = None
            self.precond = None
            if want_precond:
                # Ruiz∘SPAI composition: SPAI on the RAW system stalls at
                # large cond (3.5e5 for (S+dt·A) at ne=200), but on the
                # equilibrated system it converges fast — measured cond
                # 90 -> 1.0085 in 2000 iters, 1.0000 in 5000. Training
                # system (dr A dc) M, solution u = dc ∘ (M û).
                # precond_mode='exact' skips the iteration entirely:
                # M = (dr A dc)^-1 exactly (the steady-NS operator defeats
                # the SPAI iteration, where this gives cond 1).
                if self.is_bsr:
                    raise ValueError(
                        "op_format='bsr' requires precond_iters=0 "
                        "(a dense approximate/exact inverse)"
                    )
                self.set_precond(self._make_precond(base_eq))
            else:
                self.op_train = (
                    self._bsr_pair(base_eq) if self.is_bsr
                    else jnp.asarray(base_eq, dtype=dtype)
                )
            if c.name in _TIMEDEP:
                # the rollout RHS terms S u_{t-1} and dt*f live in the same
                # row-scaled equation space: provide dr-scaled twins
                if self.is_bsr:
                    from scipy.sparse import diags

                    S_eq = (diags(dr) @ self.S64).tocsr()
                    self.S_train = self._bsr_pair(S_eq)
                else:
                    self.S_train = jnp.asarray(
                        dr[:, None] * self.S64, dtype=dtype
                    )
                self.load_const_train = jnp.asarray(
                    dr * self.load_const64, dtype=dtype
                )
        elif want_precond:
            self.set_precond(self._make_precond(base64))
        else:
            self.precond64 = None
            self.precond = None
            self.op_train = (
                self._bsr_pair(base64) if self.is_bsr
                else jnp.asarray(base64, dtype=dtype)
            )

        # --- MXU tile padding of the dense training system (pad_ng) ---
        if c.pad_ng:
            if (self.is_bsr or c.bpx_levels > 0 or c.equilibrate
                    or c.name not in ("stokes_square", "stokes_hole")):
                raise ValueError(
                    "pad_ng supports the dense steady-Stokes paths only "
                    "(the BSR stream already tiles at 128; BPX/equilibrate "
                    "change the training coordinates)"
                )
            self._apply_pad_ng()

        # --- sampling state ---
        if c.forcing == "grf":
            self.grf_chol = grf_factor(space.p2_coords)
            method = c.interp
            if method == "cubic" and space.p2_coords.shape[0] > GridInterpolator._CUBIC_MAX:
                method = "linear"  # the probe is quadratic in memory
            self.interp = GridInterpolator.build(
                space.p2_coords, c.resol_in, method=method
            )
        else:
            self.grf_chol = None
            self.interp = None

        if c.name in _TIMEDEP:
            # P2 scalar mass for IC projection (FEniCS `project`)
            self.M2_64 = assemble_scalar_block(space, "mass", fmt=fmt)

    def _make_precond(self, base64) -> np.ndarray:
        """Dense right preconditioner for the training objective: the
        reference's SPAI iteration (precond_mode='spai') or the exact f64
        inverse (precond_mode='exact', cond(base @ M) == 1 + O(eps))."""
        if self.config.precond_mode == "exact":
            base = base64.toarray() if hasattr(base64, "toarray") else base64
            return np.linalg.inv(np.asarray(base, dtype=np.float64))
        return spai(base64, self.config.precond_iters)

    @staticmethod
    def _bsr_pair(A_csr):
        """(forward, transpose) Pallas block-sparse operators from CSR."""
        from ..ops.block_sparse import bsr_from_csr

        return (bsr_from_csr(A_csr), bsr_from_csr(A_csr.T.tocsr()))

    def set_precond(self, M) -> None:
        """Install a precomputed SPAI preconditioner (e.g. loaded from a cache
        file like the reference's precond_{ne}_{bc}.npy,
        train_FEONet.py:126-136) and rebuild the training operator
        op = base @ M.

        Call BEFORE constructing a Trainer: trainers snapshot ``device_ops``
        at construction (both CLI paths already do); calling afterwards
        raises — the new operator would silently never reach the jitted
        step."""
        if self._ops_consumed:
            raise RuntimeError(
                "set_precond called after a Trainer snapshotted device_ops — "
                "the jitted train step would keep using the old operator. "
                "Install the preconditioner before constructing the Trainer."
            )
        c = self.config
        dtype = c.dtype
        M64 = np.asarray(M, dtype=np.float64)
        if self.equil64 is not None:
            base64 = self._base_eq64  # Ruiz∘SPAI: M preconditioned the
        elif c.name in _TIMEDEP:      # equilibrated system
            base64 = self.sys64
        else:
            base64 = self.A64
        self.precond64 = M64
        self.precond = jnp.asarray(M64, dtype=dtype)
        self.op_train = jnp.asarray(base64 @ M64, dtype=dtype)
        if c.pad_ng:
            self._apply_pad_ng()

    def _apply_pad_ng(self) -> None:
        """Zero-pad the dense training system to the next 128-row/col
        multiple (idempotent). The network head emits ng_pad coefficients;
        pad rows of the residual are 0 - 0 and ``unmap`` slices back to ng,
        so metrics/eval/ground-truth paths never see the padding."""
        ng = self.space.ng
        self.ng_pad = -(-ng // 128) * 128
        pad = self.ng_pad - self.op_train.shape[-1]
        if pad > 0:
            self.op_train = jnp.pad(self.op_train, ((0, pad), (0, pad)))

    # ------------------------------------------------------------------
    # dimensions / component slices
    # ------------------------------------------------------------------

    @property
    def ng(self) -> int:
        return self.space.ng

    @property
    def d_out(self) -> int:
        """Network output dimension: ng, m under the BPX congruence (the
        network emits w-coordinates, unmap maps them to coefficients), or
        the 128-multiple ng_pad under pad_ng."""
        return self.bpx64.m if self.bpx64 is not None else self.ng_pad

    @property
    def n2(self) -> int:
        return self.space.n2

    def split_components(self, coeff: Array) -> tuple[Array, Array, Array]:
        """(..., ng) -> u1 (..., n2), u2 (..., n2), p (..., n1)."""
        n2 = self.n2
        return coeff[..., :n2], coeff[..., n2 : 2 * n2], coeff[..., 2 * n2 :]

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def sample_batch(self, key: Array, n: int) -> dict[str, Array]:
        """One problem-instance batch: parameters + (BC-lifted) load vectors.

        Steady problems: {'coeff_f', 'load'} (+ 'grf_ux/uy' for grf forcing).
        Time-dependent: {'ic_coeffs' or stream modes, 'u_init' (projected)}.
        All entries are device arrays at the training dtype; float64
        counterparts are recomputed on demand (``load64`` / ``u_init64``).
        """
        c = self.config
        dtype = c.dtype
        if c.name in _TIMEDEP:
            return self._sample_timedep(key, n)
        if c.forcing == "sincos":
            coeffs = sample_sincos_coeffs(key, n)  # f32 draws
            batch = {"coeff_f": jnp.asarray(coeffs, dtype=dtype)}
            if c.device_loads:
                batch["load"] = self._device_train_load(batch["coeff_f"])
                return batch
            load = self._train_load64(batch)
            if self.ng_pad != self.space.ng:  # pad_ng: residual pad rows 0-0
                load = np.pad(load, ((0, 0), (0, self.ng_pad - self.space.ng)))
            batch["load"] = jnp.asarray(load, dtype=dtype)
            return batch
        if c.forcing == "grf":
            ux64, uy64 = sample_grf(key, self.grf_chol, n)
            # round to f32 FIRST so the stored fields define the dataset and
            # the f64 load recompute (ground truth) matches the training load
            ux32 = ux64.astype(np.float32)
            uy32 = uy64.astype(np.float32)
            batch = {
                "grf_ux": jnp.asarray(ux32, dtype=dtype),
                "grf_uy": jnp.asarray(uy32, dtype=dtype),
            }
            load = self._train_load64(batch)
            if self.ng_pad != self.space.ng:  # pad_ng: residual pad rows 0-0
                load = np.pad(load, ((0, 0), (0, self.ng_pad - self.space.ng)))
            batch["load"] = jnp.asarray(load, dtype=dtype)
            return batch
        raise ValueError(f"forcing {c.forcing!r} invalid for {c.name}")

    def _train_load64(self, batch: dict[str, Array]) -> np.ndarray:
        """The TRAINING right-hand side: the f64 load, row-scaled by dr when
        the equilibrated system is active (BPX consumes the plain BC-applied
        load — its G^T projection happens inside the jitted loss)."""
        load64 = self.load64(batch)
        if self.equil64 is not None:
            load64 = load64 * self.equil64[0]
        return load64

    def _device_train_load(self, coeffs: Array) -> Array:
        """Training loads assembled ON DEVICE (ProblemConfig.device_loads):
        jit einsum + segment_sum at the training dtype, BC rows lifted and
        the equilibration row scale applied — matches _train_load64 to f32
        rounding (tests/test_device_assemble.py). Used by the
        resample_every infinite-data path; ground truth keeps load64."""
        c = self.config
        fn = getattr(self, "_device_load_fn", None)
        if fn is None:
            from ..fem.device_assemble import make_device_load_sincos

            fn = jax.jit(make_device_load_sincos(
                self.space, self.bc.mask, self.bc.values, dtype=c.dtype,
                validate_form=c.validate_form))
            self._device_load_fn = fn
        load = fn(coeffs)
        if self.equil64 is not None:
            load = load * jnp.asarray(self.equil64[0], dtype=c.dtype)
        if self.ng_pad != self.space.ng:
            load = jnp.pad(load, ((0, 0), (0, self.ng_pad - self.space.ng)))
        return load

    def load64(self, batch: dict[str, Array], raw: bool = False) -> np.ndarray:
        """(B, ng) float64 load vectors, recomputed exactly from the float32
        sample parameters (the create_data.py f64 contract). BC rows are
        overwritten with the BC values unless ``raw=True`` (the BPX path,
        which imposes BCs by lifting instead)."""
        c = self.config
        if c.name in _TIMEDEP:
            raise ValueError("time-dependent problems use load_const64")
        if c.forcing == "sincos":
            coeffs64 = np.asarray(batch["coeff_f"], dtype=np.float64)
            load = assemble_load_sincos(
                self.space, coeffs64, validate_form=c.validate_form
            )
        else:
            load = assemble_load_from_velocity_values(
                self.space,
                np.asarray(batch["grf_ux"], dtype=np.float64),
                np.asarray(batch["grf_uy"], dtype=np.float64),
            )
        if raw:
            return load
        return apply_bc_vector(load, self.bc.mask, self.bc.values)

    def _project_velocity_ic(self, values_fn) -> np.ndarray:
        """L2-project an IC (callable coeffs-free closure over quad points)
        into the P2 velocity space — FEniCS ``project(u_init, V)``
        (FEONet_time_dep_Stokes/assemble_fenics.py:191). Host float64."""
        degree = 6
        xq = physical_quad_points(self.space, degree)
        f_quad = np.asarray(values_fn(xq))  # (B, nc, nq, 2)
        loads = _load_from_quad_values(self.space, f_quad, degree)
        n2 = self.n2
        b1, b2 = loads[:, :n2], loads[:, n2 : 2 * n2]
        from ..linalg.solvers import solve_dense_batched as _solve

        q1 = _solve(self.M2_64, b1)
        q2 = _solve(self.M2_64, b2)
        B = loads.shape[0]
        return np.concatenate([q1, q2, np.zeros((B, self.space.n1))], axis=1)

    def u_init64(self, batch: dict[str, Array]) -> np.ndarray:
        """(B, ng) float64 projected initial condition, recomputed exactly
        from the float32 IC parameters in the batch."""
        c = self.config
        if c.bc == "zero":
            ks = np.asarray(batch["ic_ks"])
            ls = np.asarray(batch["ic_ls"])
            amps = np.asarray(batch["ic_amps"], dtype=np.float64)
            return self._project_velocity_ic(
                lambda xq: stream_ic_at_points(ks, ls, amps, xq)
            )
        coeffs = np.asarray(batch["ic_coeffs"], dtype=np.float64)
        at_points = lower_ic_at_points if c.bc == "lower" else channel_ic_at_points
        return self._project_velocity_ic(lambda xq: at_points(coeffs, xq))

    def _sample_timedep(self, key: Array, n: int) -> dict[str, Array]:
        c = self.config
        dtype = c.dtype
        if c.bc == "zero":
            ks, ls, amps = sample_stream_ic_modes(key, n)
            batch = {
                "ic_ks": ks,
                "ic_ls": ls,
                "ic_amps": jnp.asarray(amps, dtype=dtype),
            }
        else:
            coeffs = sample_ic_coeffs(key, n, c.bc)
            batch = {"ic_coeffs": jnp.asarray(coeffs, dtype=dtype)}
        batch["u_init"] = jnp.asarray(self.u_init64(batch), dtype=dtype)
        return batch

    # ------------------------------------------------------------------
    # model input featurization
    # ------------------------------------------------------------------

    def model_input(self, batch: dict[str, Array], model_name: str) -> Array:
        """The reference closure's input branch (train_FEONet.py:275-283 and
        FEONet_time_dep_Stokes/train_FEONet.py:369-385), as a pure fn."""
        c = self.config
        if model_name == "FCNN":
            return batch["coeff_f"]
        if model_name in ("RNN", "LinearStep", "LinearStepRNN"):
            return batch["u_init"]
        if model_name == "UNet1D":
            coords = jnp.asarray(self.space.mixed_coords(), dtype=batch["u_init"].dtype)
            coords_b = jnp.broadcast_to(
                coords[None], (batch["u_init"].shape[0],) + coords.shape
            )
            return jnp.concatenate([batch["u_init"][..., None], coords_b], axis=-1)
        if c.name in _TIMEDEP:
            resol = 64
            if c.bc == "lower":
                return lower_ic_on_grid(batch["ic_coeffs"], resol)
            if c.bc == "channel_flow":
                return channel_ic_on_grid(batch["ic_coeffs"], resol)
            raise ValueError("grid featurization for 'zero' BC ICs not defined "
                             "in the reference; use RNN/UNet1D models")
        if c.forcing == "sincos":
            return sincos_on_grid(batch["coeff_f"], c.resol_in)
        if c.forcing == "grf":
            fx = self.interp(batch["grf_ux"])  # (B, R, R)
            fy = self.interp(batch["grf_uy"])
            return jnp.stack([fx, fy], axis=-1)
        raise ValueError(f"no featurization for {c.name}/{c.forcing}")

    # ------------------------------------------------------------------
    # residual loss + prediction un-mapping
    # ------------------------------------------------------------------

    @property
    def device_ops(self) -> dict[str, Any]:
        """The operator pytree for jitted steps, passed as an ARGUMENT.

        Closure-captured device arrays are baked into the compiled program as
        literal constants; at the ~50k-DoF BSR scale that is >100 MB of HLO
        text — which breaks remote compilation (HTTP 413 on tunneled TPU
        backends) and bloats the executable everywhere. Threading the
        operators through as arguments keeps them runtime buffers.
        """
        ops: dict[str, Any] = {"op_train": self.op_train}
        for name in ("B1", "B2", "S", "precond", "conv_row_mask", "equil_dc",
                     "equil_dr", "bpx_G", "bpx_ubc"):
            v = getattr(self, name)
            if v is not None:
                ops[name] = v
        if self.config.name == "steady_ns":
            # the RAW BC-applied system for the linearized-about-label loss
            # (residual/losses.py:ns_linearized_residual); under BSR the
            # training operator IS the raw system unless equilibrated
            if self.A is not None:
                ops["A_raw"] = self.A
            elif self.equil64 is None:
                ops["A_raw"] = self.op_train
        if self.config.name in _TIMEDEP:
            ops["load_const"] = self.load_const
            if self.equil64 is not None:
                # the rollout loss consumes the dr-scaled equation space
                ops["S"] = self.S_train
                ops["load_const"] = self.load_const_train
            if self.config.rollout_metric == "physical":
                w = np.ones(self.ng)
                w[2 * self.n2 :] = self.config.p_weight
                ops["phys_w"] = jnp.asarray(w, dtype=self.config.dtype)
        return ops

    def loss(self, pred: Array, batch: dict[str, Array], ops: dict | None = None) -> Array:
        c = self.config
        if ops is None:
            ops = self.device_ops
        bpx_G = ops.get("bpx_G")
        if bpx_G is not None:
            # Factored BPX objective: || G^T (A (G w + u_bc) [+ conv] - f) ||^2.
            # BC rows of the inner residual vanish identically (BC-applied A
            # row u_r minus BC load g_r, with u_r = u_bc exactly); G^T gives
            # the O(1)-conditioned w-space normal operator G^T A G.
            from ..residual.losses import bpx_project, sum_of_squares, _apply_op
            from ..residual.losses import _masked_conv

            u = self.unmap(pred, ops)
            r = _apply_op(u, ops["op_train"]) - batch["load"]
            if c.name == "steady_ns":
                r = r + ops.get("conv_gamma", 1.0) * _masked_conv(
                    u, ops["B1"], ops["B2"], self.n2,
                    ops.get("conv_row_mask"),
                )
            return sum_of_squares(bpx_project(r, bpx_G))
        if c.name == "steady_ns":
            if "u0" in batch:  # cascade stage 2: defect of a frozen stage-1
                from ..residual.losses import nonlinear_defect_residual

                return nonlinear_defect_residual(
                    pred, ops["op_train"], batch["load"], ops["B1"],
                    ops["B2"], self.n2, batch["u0"], batch["B1u0"],
                    batch["B2u0"], conv_row_mask=ops.get("conv_row_mask"),
                    equil_dc=ops.get("equil_dc"),
                    equil_dr=ops.get("equil_dr"),
                )
            return nonlinear_residual(
                pred, ops["op_train"], batch["load"], ops["B1"], ops["B2"],
                self.n2, conv_row_mask=ops.get("conv_row_mask"),
                equil_dc=ops.get("equil_dc"), equil_dr=ops.get("equil_dr"),
                precond=ops.get("precond"),
                conv_scale=ops.get("conv_gamma", 1.0),
            )
        if c.name == "timedep_stokes":
            # cascade stage 2 carries a per-step defect RHS in 'load' and a
            # zero recursion init in 'u_init_loss' (u_init stays for the
            # featurization input)
            load = batch.get("load", ops["load_const"])
            u_init = batch.get("u_init_loss", batch["u_init"])
            return rollout_residual(
                pred, ops["S"], ops["op_train"], load, c.dt,
                u_init, precond=ops.get("precond"),
                equil_dc=ops.get("equil_dc"),
                phys_weight=ops.get("phys_w"),
            )
        if c.name == "timedep_ns":
            if "u0_prev" in batch:  # cascade stage 2 (exact expansion)
                from ..residual.losses import rollout_ns_defect_residual

                return rollout_ns_defect_residual(
                    pred, ops["S"], ops["op_train"], batch["load"], c.dt,
                    ops["B1"], ops["B2"], self.n2, batch["u0_prev"],
                    batch["B1u0p"], batch["B2u0p"],
                    conv_row_mask=ops.get("conv_row_mask"),
                    precond=ops.get("precond"),
                    equil_dc=ops.get("equil_dc"),
                    equil_dr=ops.get("equil_dr"),
                )
            from ..residual import rollout_ns_residual

            return rollout_ns_residual(
                pred, ops["S"], ops["op_train"], ops["load_const"], c.dt,
                batch["u_init"], ops["B1"], ops["B2"], self.n2,
                conv_row_mask=ops.get("conv_row_mask"),
                precond=ops.get("precond"),
                equil_dc=ops.get("equil_dc"), equil_dr=ops.get("equil_dr"),
                conv_scale=ops.get("conv_gamma", 1.0),
                phys_weight=ops.get("phys_w"),
            )
        return linear_residual(pred, ops["op_train"], batch["load"])

    def linearized_loss(
        self, pred_u: Array, truth_u: Array, ops: dict | None = None
    ) -> Array:
        """|| dr ∘ J(u*) (pred_u - u*) ||² — the steady-NS residual
        linearized about the label (TrainConfig.hybrid_kind='linearized').
        Both arguments in SOLUTION coordinates."""
        c = self.config
        if c.name != "steady_ns":
            raise ValueError(f"linearized_loss requires steady_ns, got {c.name!r}")
        if ops is None:
            ops = self.device_ops
        if "A_raw" not in ops:
            raise ValueError(
                "linearized_loss needs the raw system in ops['A_raw'] "
                "(unavailable for op_format='bsr' with equilibrate=True)"
            )
        from ..residual.losses import ns_linearized_residual

        return ns_linearized_residual(
            pred_u, truth_u, ops["A_raw"], ops["B1"], ops["B2"], self.n2,
            conv_row_mask=ops.get("conv_row_mask"),
            equil_dr=ops.get("equil_dr"),
        )

    def defect_batch64(
        self, batch: dict[str, Array], pred: Array
    ) -> dict[str, Array]:
        """Cascade stage-2 training batch: the f64-recomputed DEFECT of a
        frozen stage-1 prediction (residual boosting — no reference
        counterpart). Featurization inputs are kept; the RHS is replaced so
        that a fresh network trained on this batch learns the correction ê
        in the SAME training coordinates (combined prediction = pred + ê;
        ``unmap`` applies unchanged).

        pred: stage-1 outputs in training coordinates (B, d_out) or
        (B, T, d_out), float32. All heavy arithmetic is host float64.
        """
        c = self.config
        dtype = c.dtype
        pred64 = np.asarray(pred, dtype=np.float64)
        out = {k: v for k, v in batch.items()}

        def matT(A, X):
            """X @ A.T for dense ndarray or scipy sparse A (f64, no densify)."""
            if hasattr(A, "tocsr"):  # scipy sparse
                flat = X.reshape(-1, X.shape[-1])
                return np.asarray((A @ flat.T).T).reshape(
                    X.shape[:-1] + (A.shape[0],)
                )
            return X @ A.T

        if c.name in _TIMEDEP:
            dr_dc = self.equil64
            u_phys = pred64
            if self.precond64 is not None:
                u_phys = u_phys @ self.precond64.T
            if dr_dc is not None:  # composes: u = dc ∘ (M û)
                u_phys = u_phys * dr_dc[1]
            u_init = self.u_init64(batch)
            prev = np.concatenate([u_init[:, None, :], u_phys[:, :-1]], axis=1)
            r0 = (matT(self.sys64, u_phys) - matT(self.S64, prev)
                  - c.dt * self.load_const64)
            if c.name == "timedep_ns":
                # semi-implicit convection on the lagged state enters the
                # defect and the stage-2 cross terms
                n2 = self.n2
                mask64 = np.asarray(self.bc.mask, dtype=np.float64)
                B1p = matT(self.B1_64, prev)
                B2p = matT(self.B2_64, prev)
                z = np.zeros_like(prev[..., 2 * n2 :])
                d1 = np.concatenate(
                    [prev[..., :n2], prev[..., :n2], z], axis=-1
                )
                d2 = np.concatenate(
                    [prev[..., n2 : 2 * n2], prev[..., n2 : 2 * n2], z],
                    axis=-1,
                )
                conv0 = d1 * B1p + d2 * B2p
                if c.ns_bc_rows == "masked":
                    conv0 = conv0 * (1.0 - mask64)
                r0 = r0 + c.dt * conv0
                out["u0_prev"] = jnp.asarray(prev, dtype=dtype)
                out["B1u0p"] = jnp.asarray(B1p, dtype=dtype)
                out["B2u0p"] = jnp.asarray(B2p, dtype=dtype)
                # full physical stage-1 trajectory (t = 1..T): defect_truth64
                # needs u0_T, which the lagged `prev` does not contain
                out["u0_phys"] = jnp.asarray(u_phys, dtype=dtype)
            if dr_dc is not None:
                r0 = r0 * dr_dc[0]
            # loss computes lhs - (S e_prev + dt*load): load = -r0/dt
            out["load"] = jnp.asarray(-r0 / c.dt, dtype=dtype)
            out["u_init_loss"] = jnp.zeros_like(batch["u_init"])
            return out

        load64 = self.load64(batch, raw=self.bpx64 is not None)
        if c.name == "steady_ns":
            mask64 = np.asarray(self.bc.mask, dtype=np.float64)
            dr_dc = self.equil64
            u0 = pred64
            if dr_dc is not None:
                if self.precond64 is not None:
                    u0 = u0 @ self.precond64.T
                u0 = u0 * dr_dc[1]
            n2 = self.n2
            B1u0 = matT(self.B1_64, u0)
            B2u0 = matT(self.B2_64, u0)
            d1 = np.concatenate(
                [u0[:, :n2], u0[:, :n2], np.zeros_like(u0[:, 2 * n2 :])],
                axis=1,
            )
            d2 = np.concatenate(
                [u0[:, n2 : 2 * n2], u0[:, n2 : 2 * n2],
                 np.zeros_like(u0[:, 2 * n2 :])], axis=1,
            )
            conv0 = d1 * B1u0 + d2 * B2u0
            if c.ns_bc_rows == "masked":
                conv0 = conv0 * (1.0 - mask64)
            r0 = load64 - matT(self.A64, u0) - conv0
            if dr_dc is not None:
                r0 = r0 * dr_dc[0]
            out["load"] = jnp.asarray(r0, dtype=dtype)
            out["u0"] = jnp.asarray(u0, dtype=dtype)
            out["B1u0"] = jnp.asarray(B1u0, dtype=dtype)
            out["B2u0"] = jnp.asarray(B2u0, dtype=dtype)
            return out

        # steady linear: r0 = f - OP u0 in the training equation space
        if self.bpx64 is not None:
            u0 = (self.bpx64.G @ pred64.T).T + self.bpx64.u_bc
            r0 = load64 - matT(self.A64, u0)
            # stage-2 objective: G^T(A G e - r0) — same loss with u_bc=0;
            # the TOOL must zero ops['bpx_ubc'] for the stage-2 trainer
            out["load"] = jnp.asarray(r0, dtype=dtype)
            return out
        u0 = pred64
        if self.precond64 is not None:
            u0 = u0 @ self.precond64.T
        if self.equil64 is not None:  # composes: u = dc ∘ (M û)
            u0 = u0 * self.equil64[1]
        r0 = load64 - matT(self.A64, u0)
        if self.equil64 is not None:
            r0 = r0 * self.equil64[0]
        out["load"] = jnp.asarray(r0, dtype=dtype)
        return out

    def defect_truth64(self, defect_batch: dict[str, Array]) -> np.ndarray:
        """Exact PHYSICAL correction e* for a defect batch (host f64).

        timedep_stokes: the unique solution of the defect recursion

            sys64 e_t = S64 e_{t-1} + dt * loadphys_t,   e_0 = 0

        with loadphys the stored dr-scaled defect RHS unscaled back to
        physical rows. One LU factorization amortized over B*T solves — the
        labels for a SUPERVISED stage-2 cost T matvecs/solves per sample,
        no Newton/FEniCS (cf. the reference's create_data.py solves). The
        returned (B, T+1, ng) includes the zero t=0 row so it matches the
        trainer's truth[:, 1:T+1] slicing convention.

        timedep_ns: each IMEX step is linear given the previous state, so
        the exact corrected trajectory is the true rollout itself restarted
        from u_init (one factorization, T solves — Problem.ground_truth);
        e* = truth - stage1, (B, T+1, ng) with e*_0 = 0.

        steady_ns: the defect solves the exactly-quadratic system
        J(u0) e + Q(e,e) = r0 — a warm-started damped-Newton refinement
        (refine_ns) from the stored stage-1 state; returns (B, ng)."""
        import scipy.linalg as sla
        import scipy.sparse as sp

        c = self.config
        if c.name == "steady_ns":
            u0 = np.asarray(defect_batch["u0"], dtype=np.float64)
            refined, _rel = self.refine_ns(u0, defect_batch, steps=6)
            return refined - u0
        if c.name == "timedep_ns":
            u0_phys = np.asarray(defect_batch["u0_phys"], dtype=np.float64)
            T = u0_phys.shape[1]
            truth = self.ground_truth(defect_batch, n_steps=T)
            U0 = np.concatenate([truth[:, :1], u0_phys], axis=1)
            return truth - U0
        if c.name != "timedep_stokes":
            raise NotImplementedError(
                "defect_truth64: implemented for timedep_stokes, "
                f"timedep_ns and steady_ns (got {c.name!r})")
        load_train = np.asarray(defect_batch["load"], dtype=np.float64)
        if self.equil64 is not None:
            load_train = load_train / self.equil64[0]
        B, T, ng = load_train.shape
        sys64 = self.sys64
        S64 = self.S64
        if sp.issparse(sys64):
            sys64 = sys64.toarray()
        if sp.issparse(S64):
            S64 = S64.toarray()
        ST = np.asarray(S64, dtype=np.float64).T
        lu = sla.lu_factor(np.asarray(sys64, dtype=np.float64))
        e = np.zeros((B, T + 1, ng), dtype=np.float64)
        for t in range(T):
            rhs = e[:, t] @ ST + c.dt * load_train[:, t]
            e[:, t + 1] = sla.lu_solve(lu, rhs.T).T
        return e

    def shift_output(self, out: Array, batch: dict[str, Array]) -> Array:
        """stokes_shift: add the Stokes solution in TRAINING coordinates to
        the network output (which then represents only the convection
        correction). For Ruiz∘exact-inverse the Stokes solution in training
        coordinates is exactly the training rhs: û_st = M^{-1}(A^{-1}f/dc)
        = (dr A dc)(A^{-1}f/dc) = dr∘f = batch['load']; for SPAI-M it is
        approximate, which only moves a small residue into the learned
        correction. No-op unless ProblemConfig.stokes_shift."""
        if not self.config.stokes_shift:
            return out
        return out + batch["load"]

    def unmap(self, pred: Array, ops: dict | None = None) -> Array:
        """Map network output to solution coefficients: apply SPAI M, the
        equilibration column scale (u = dc * û), or the BPX congruence
        factor + exact BC lift (u = G w + u_bc)."""
        if self.ng_pad != self.space.ng and pred.shape[-1] == self.ng_pad:
            pred = pred[..., : self.space.ng]  # drop the pad_ng tail
        precond = self.precond if ops is None else ops.get("precond")
        equil_dc = self.equil_dc if ops is None else ops.get("equil_dc")
        bpx_G = self.bpx_G if ops is None else ops.get("bpx_G")
        if bpx_G is not None:
            ubc = self.bpx_ubc if ops is None else ops["bpx_ubc"]
            if isinstance(bpx_G, tuple):
                from ..ops.block_sparse import bsr_apply

                flat = pred.reshape(-1, pred.shape[-1])
                u = bsr_apply(flat, bpx_G[0], bpx_G[1])
                u = u.reshape(pred.shape[:-1] + (u.shape[-1],))
            else:
                u = jnp.matmul(pred, bpx_G.T,
                               precision=jax.lax.Precision.HIGHEST)
            return u + ubc
        if precond is not None:
            pred = jnp.matmul(pred, precond.T,
                              precision=jax.lax.Precision.HIGHEST)
        if equil_dc is not None:  # Ruiz(∘SPAI): u = dc ∘ (M û)
            pred = pred * equil_dc
        return pred

    # ------------------------------------------------------------------
    # ground truth (host float64 — the create_data.py replacement)
    # ------------------------------------------------------------------

    def ground_truth(
        self, batch: dict[str, Array], n_steps: int | None = None
    ) -> np.ndarray:
        """Reference solutions in float64 (host numpy, backend-independent).

        steady linear -> (B, ng); steady_ns -> (B, ng) via Newton;
        timedep -> (B, n_steps+1, ng) implicit-Euler trajectories.
        """
        c = self.config
        if c.name in _TIMEDEP:
            T = int(round(1.0 / c.dt)) if n_steps is None else n_steps
            u0 = self.u_init64(batch)
            if c.name == "timedep_ns":
                from ..linalg.solvers import semi_implicit_ns_rollout

                return semi_implicit_ns_rollout(
                    self.S64, self.A64, u0, self.load_const64, c.dt, T,
                    self._conv_fn, self.bc.mask,
                )
            return implicit_euler_rollout(
                self.S64, self.A64, u0, self.load_const64, c.dt, T
            )
        load64 = self.load64(batch)
        if c.name == "steady_ns":
            u, rel, _ = self._solve_ns_batch(load64)
            return u
        return solve_dense_batched(self.A64, load64)

    def _solve_ns_batch(
        self, load64: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Solve a batch of NS loads; returns (u, rel_res, iters).

        ns_branch='stable' (default) → batched stable-branch solvers
        (Picard + polish, one factorization for the whole batch);
        ns_branch='newton' → the reference-parity per-sample damped-Newton
        chains. See the ProblemConfig.ns_branch comment."""
        mask64 = np.asarray(self.bc.mask, dtype=np.float64)
        if self.config.ns_branch == "stable":
            loads = np.asarray(load64, dtype=np.float64)
            # velocity mass for the IMEX pseudo-time fallback (assembled
            # once, lazily — most batches converge in the Picard stage)
            if not hasattr(self, "_S_stable64"):
                self._S_stable64 = apply_bc_matrix(
                    assemble_velocity_mass(
                        self.space, fmt="csr" if self.is_bsr else "dense"
                    ),
                    self.bc.mask,
                )
            if self.is_bsr:
                from ..linalg.newton import stable_solve_ns_sparse

                us, rels, it = stable_solve_ns_sparse(
                    self.A64, self.B1_64, self.B2_64, loads, self.n2,
                    conv_row_mask=mask64, S=self._S_stable64,
                )
            elif self.config.ns_truth == "group":
                from ..linalg.newton import stable_solve_ns

                us, rels, it = stable_solve_ns(
                    self.A64, self.B1_64, self.B2_64, loads, self.n2,
                    conv_row_mask=mask64, S=self._S_stable64,
                )
            else:
                from ..linalg.newton import stable_solve_weak

                us, rels, it = stable_solve_weak(
                    self.A_truth64, self._conv_fn, self._jac_fn, loads,
                    mask64, S=self._S_stable64,
                )
            return us, rels, np.full(len(loads), it)
        if self.is_bsr:
            # sparse-LU Newton (50k-DoF stretch scale; dense J is 18 GB)
            from scipy.sparse import csc_matrix
            from scipy.sparse.linalg import splu

            from ..linalg.newton import newton_solve_ns_sparse

            A_lu = splu(csc_matrix(self.A64))

            def solve_one(f):
                return newton_solve_ns_sparse(
                    self.A64, self.B1_64, self.B2_64, f, self.n2,
                    conv_row_mask=mask64, A_lu=A_lu,
                )
        elif self.config.ns_truth == "group":
            def solve_one(f):
                return newton_solve_ns(
                    self.A64, self.B1_64, self.B2_64, f, self.n2,
                    conv_row_mask=mask64,
                )
        else:
            from ..linalg.newton import newton_solve_weak

            def solve_one(f):
                return newton_solve_weak(
                    self.A_truth64, self._conv_fn, self._jac_fn, f, mask64
                )
        out = [solve_one(f) for f in np.asarray(load64, dtype=np.float64)]
        us = np.stack([o[0] for o in out])
        rels = np.asarray([o[1] for o in out])
        its = np.asarray([o[2] for o in out])
        return us, rels, its

    def refine_ns(
        self,
        u: np.ndarray,
        batch: dict[str, Array],
        steps: int = 3,
        tol: float = 1e-12,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Neural-warm-started Newton refinement (steady_ns, host f64).

        Deployment pattern for the nonlinear problem: the network prediction
        initializes a few damped-Newton steps on the SAME weak system the
        ground truth solves. Inside the basin Newton converges quadratically,
        so 2-3 steps turn an O(1e-1) surrogate into a solver-accurate
        solution — skipping the cold solve's long Picard/IMEX march to the
        basin (linalg/newton.py:stable_solve_weak; Picard itself is
        EXPANSIVE around these roots, which is why a cheap fixed-point
        refinement is not an option). Returns (u_refined, rel_res).
        """
        from ..linalg.newton import _damped_newton

        c = self.config
        if c.name != "steady_ns":
            raise ValueError(f"refine_ns requires steady_ns, got {c.name!r}")
        loads = self.load64(batch)
        mask64 = np.asarray(self.bc.mask, dtype=np.float64)
        if self.is_bsr:
            # Sparse twin at the ~50k-DoF stretch scale (dense J is 18 GB):
            # per-sample CSR-Jacobian damped Newton warm-started at the
            # surrogate prediction — same deployment pattern, splu per
            # iteration instead of dense LU (linalg/newton.py:213).
            from ..linalg.newton import newton_solve_ns_sparse

            u = np.asarray(u, dtype=np.float64).copy()
            rels = np.empty(u.shape[0])
            for i in range(u.shape[0]):
                ui, rel, _ = newton_solve_ns_sparse(
                    self.A64, self.B1_64, self.B2_64, loads[i], self.n2,
                    u0=u[i], conv_row_mask=mask64,
                    max_iters=max(steps, 0), tol=tol,
                )
                u[i] = ui
                rels[i] = rel
            return u, rels
        keep = 1.0 - mask64
        if c.ns_truth == "weak":
            A = np.asarray(self.A_truth64, dtype=np.float64)
            conv = lambda u_: keep * self._conv_fn(u_)
            jac = lambda u_: A + keep[:, None] * self._jac_fn(u_)
        else:
            from ..linalg.newton import (_masked_convection_np,
                                         _ns_jacobian_np)

            A = np.asarray(self.A64, dtype=np.float64)
            B1 = np.asarray(self.B1_64, np.float64)
            B2 = np.asarray(self.B2_64, np.float64)
            conv = lambda u_: _masked_convection_np(
                u_, B1, B2, self.n2, mask64)
            jac = lambda u_: _ns_jacobian_np(u_, A, B1, B2, self.n2, mask64)
        u = np.asarray(u, dtype=np.float64).copy()
        rels = np.empty(u.shape[0])
        for i in range(u.shape[0]):
            f = loads[i]
            f_norm = max(float(np.linalg.norm(f)), 1e-30)
            ui, r, _ = _damped_newton(
                lambda u_: u_ @ A.T + conv(u_) - f,
                jac,
                u[i], f_norm, max(steps, 0), tol,
            )
            u[i] = ui
            rels[i] = r / f_norm
        return u, rels

    def sample_converged(
        self,
        key: Array,
        n: int,
        tol: float = 1e-9,
        max_rounds: int = 20,
    ) -> tuple[dict[str, Array], np.ndarray]:
        """Sample n problem instances whose ground truth converges.

        For steady_ns this is the reference's resample-on-Newton-failure loop
        (FEONet_steady_Navier-Stokes/assemble_fenics.py:204-245: catch
        RuntimeError, draw again); other problems always converge and return
        (batch, truth) in one round.
        Returns (batch, truth).
        """
        c = self.config
        if c.name != "steady_ns":
            batch = self.sample_batch(key, n)
            kw = {"n_steps": c.seq_len} if c.name in _TIMEDEP else {}
            return batch, self.ground_truth(batch, **kw)

        kept_batches: list[dict[str, Array]] = []
        kept_truth: list[np.ndarray] = []
        kept = 0
        for _ in range(max_rounds):
            need = n - kept
            if need <= 0:
                break
            key, sub = jax.random.split(key)
            batch = self.sample_batch(sub, need)
            u, rel, _ = self._solve_ns_batch(self.load64(batch))
            ok = np.asarray(rel) < tol
            if ok.any():
                idx = np.nonzero(ok)[0]
                kept_batches.append({k: v[idx] for k, v in batch.items()})
                kept_truth.append(u[idx])
                kept += int(ok.sum())
        if kept < n:
            raise RuntimeError(
                f"only {kept}/{n} NS samples converged after {max_rounds} rounds"
            )
        batch = {
            k: jnp.concatenate([b[k] for b in kept_batches])[:n]
            for k in kept_batches[0]
        }
        return batch, np.concatenate(kept_truth)[:n]


def build_problem(config: ProblemConfig) -> Problem:
    """Construct mesh/space/BCs and assemble all operators for a config."""
    c = config
    if c.name not in PROBLEM_NAMES:
        raise ValueError(f"unknown problem {c.name!r}; have {PROBLEM_NAMES}")
    if c.name == "stokes_hole":
        mesh = square_with_hole_mesh(h=c.hole_h)
        space = build_taylor_hood(mesh)
        bc = make_bc(space, hole_bcs(c.bc))
    else:
        mesh = structured_rectangle(c.nx, c.nx)
        space = build_taylor_hood(mesh)
        variant = "timedep" if c.name in _TIMEDEP else "steady"
        bc = make_bc(space, square_bcs(c.bc, variant=variant))
    return Problem(config, space, bc)
