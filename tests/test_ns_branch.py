"""Stable-branch steady-NS ground truth: reachability, not root-picking.

Measured structure of the discrete steady-NS system at the reference's
sincos amplitudes (see linalg/newton.py module comment):

  * a large minority of draws have NO dynamically reachable steady state —
    the from-rest semi-implicit trajectory passes near a saddle and escapes
    to blowup at every dt; damped Newton (the reference's FEniCS truth
    generator, FEONet_steady_Navier-Stokes/assemble_fenics.py:204-217) may
    still return an unreachable root there;
  * whenever the dynamics DOES converge, damped Newton finds the SAME root.

These tests pin: the stable solver converges (batched) to machine residual
on reachable draws; its root equals the t->infinity limit of semi-implicit
time stepping AND the damped-Newton root; rootless draws report honest
residuals and are resampled by sample_converged (the reference's
resample-on-Newton-failure loop, assemble_fenics.py:239-241).
"""

import jax
import numpy as np

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.linalg import newton_solve_ns


def _setup(n=4, key=7):
    """n CONVERGED draws (some sincos draws at these amplitudes are
    rootless — the dynamics escapes to blowup — and get resampled, same as
    the reference's resample-on-Newton-failure loop)."""
    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    ns_truth="group"))
    b, truth = p.sample_converged(jax.random.PRNGKey(key), n)
    loads = np.asarray(p.load64(b))
    return p, b, loads, truth


def _conv64(p, u):
    n2 = p.n2
    keep = 1.0 - np.asarray(p.bc.mask)  # mask is 1 on BC rows
    z = np.zeros_like(u[:, 2 * n2:])
    d1 = np.concatenate([u[:, :n2], u[:, :n2], z], -1)
    d2 = np.concatenate([u[:, n2:2 * n2], u[:, n2:2 * n2], z], -1)
    return keep * (d1 * (u @ p.B1_64.T) + d2 * (u @ p.B2_64.T))


def test_stable_solver_is_the_time_marched_root():
    p, _, loads, us = _setup()
    _, rels, _ = p._solve_ns_batch(loads)  # Picard + IMEX fallback + polish
    assert rels.max() < 1e-9, rels

    # semi-implicit (IMEX) time march from rest -> the physical steady state.
    # The mass matrix must carry the STEADY problem's BC rows (the timedep
    # variant masks different rows and marches a different dynamical system).
    from feonet_navier_stokes_tpu.fem.assemble import (
        apply_bc_matrix, assemble_velocity_mass)

    S = apply_bc_matrix(assemble_velocity_mass(p.space, fmt="dense"),
                        p.bc.mask)
    dt = 0.02
    Sys = np.linalg.inv(S + dt * p.A64)
    u = np.zeros_like(loads)
    for _ in range(6000):
        u = (u @ S.T + dt * (loads - _conv64(p, u))) @ Sys.T
    rel = np.linalg.norm(u - us, axis=1) / np.linalg.norm(us, axis=1)
    assert rel.max() < 1e-6, rel

    # ... and on REACHABLE draws damped Newton finds the SAME root (the
    # stable/newton branches differ by filtering, not by root choice)
    mask = np.asarray(p.bc.mask, np.float64)
    newton = np.stack([
        newton_solve_ns(p.A64, p.B1_64, p.B2_64, f, p.n2,
                        conv_row_mask=mask)[0] for f in loads
    ])
    diff = np.linalg.norm(newton - us, axis=1) / np.linalg.norm(us, axis=1)
    assert diff.max() < 1e-6, diff


def test_rootless_draws_report_honest_residuals_and_get_resampled():
    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    ns_truth="group"))
    # raw batch at key=7: measured to contain draws whose dynamics escapes
    # (blowup at dt=0.02/0.005/0.001; damped Newton stalls at rel ~3e-3)
    b = p.sample_batch(jax.random.PRNGKey(7), 4)
    _, rels, _ = p._solve_ns_batch(np.asarray(p.load64(b)))
    assert (rels > 1e-6).sum() == 2, rels  # honest failures, not fake zeros
    assert (rels < 1e-9).sum() == 2, rels
    # sample_converged must deliver a full batch of converged truth anyway
    b2, truth = p.sample_converged(jax.random.PRNGKey(7), 4)
    _, rels2, _ = p._solve_ns_batch(np.asarray(p.load64(b2)))
    assert rels2.max() < 1e-9, rels2
    assert truth.shape == (4, p.ng)


def test_stokes_shift_zero_output_is_exact_stokes():
    """With stokes_shift + Ruiz∘exact-inverse preconditioning, a zero
    network output must decode to exactly the Stokes solution A^{-1}f (the
    shift makes the linear 90% of the solution map exact linear algebra;
    the network only learns the convection correction)."""
    import jax.numpy as jnp

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    equilibrate=True, precond_mode="exact",
                                    stokes_shift=True))
    b = p.sample_batch(jax.random.PRNGKey(0), 3)
    out = jnp.zeros((3, p.ng), jnp.float32)
    u = np.asarray(p.unmap(p.shift_output(out, b)), np.float64)
    stokes = np.linalg.solve(p.A64, np.asarray(p.load64(b), np.float64).T).T
    rel = np.linalg.norm(u - stokes, axis=1) / np.linalg.norm(stokes, axis=1)
    assert rel.max() < 1e-5, rel  # f32 roundoff


def test_problem_ground_truth_uses_stable_branch():
    # group truth
    p, b, loads, us = _setup(n=2)
    assert p.config.ns_branch == "stable"
    # weak (true trilinear) truth converges on the stable branch too
    pw = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4))
    uw, rw, _ = pw._solve_ns_batch(np.asarray(pw.load64(b)))
    assert rw.max() < 1e-9
    # group vs weak roots agree to discretization error, not branch distance
    rel = np.linalg.norm(us - uw, axis=1) / np.linalg.norm(uw, axis=1)
    assert rel.max() < 0.05, rel


def test_refine_ns_contracts_from_perturbed_truth():
    """Neural-warm-started Picard refinement: from a 10%-perturbed stable
    truth, 3 sweeps shrink both the coefficient error and the residual by
    an order of magnitude (the deployment pattern for the surrogate)."""
    import jax
    import numpy as np

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=5,
                                    ns_branch="stable"))
    batch, truth = p.sample_converged(jax.random.PRNGKey(2), 6)
    truth = np.asarray(truth, dtype=np.float64)
    rng = np.random.default_rng(0)
    pert = truth * (1.0 + 0.1 * rng.standard_normal(truth.shape))
    err0 = np.linalg.norm(pert - truth, axis=1) / np.linalg.norm(truth, axis=1)

    refined, rel = p.refine_ns(pert, batch, steps=8)
    err = np.linalg.norm(refined - truth, axis=1) / np.linalg.norm(truth, axis=1)
    assert float(err.mean()) < 1e-4 * float(err0.mean()), (err0.mean(), err.mean())
    assert float(rel.max()) < 1e-8, rel


def test_refine_ns_sparse_bsr_contracts():
    """The BSR branch of refine_ns (sparse CSR-Jacobian Newton, the ~47k
    stretch deployment path) contracts a 10%-perturbed stable truth to
    solver accuracy, same contract as the dense path above."""
    import jax
    import numpy as np

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=5,
                                    ns_branch="stable", op_format="bsr"))
    batch, truth = p.sample_converged(jax.random.PRNGKey(3), 4)
    truth = np.asarray(truth, dtype=np.float64)
    rng = np.random.default_rng(1)
    pert = truth * (1.0 + 0.1 * rng.standard_normal(truth.shape))
    err0 = np.linalg.norm(pert - truth, axis=1) / np.linalg.norm(truth, axis=1)

    refined, rel = p.refine_ns(pert, batch, steps=8)
    err = np.linalg.norm(refined - truth, axis=1) / np.linalg.norm(truth, axis=1)
    assert float(err.mean()) < 1e-4 * float(err0.mean()), (err0.mean(), err.mean())
    # damping can spend a couple of the 8 iterations on the hardest draw;
    # 1e-6 is still far below any surrogate's error
    assert float(rel.max()) < 1e-6, rel
