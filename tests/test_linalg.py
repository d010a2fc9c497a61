"""Linear-algebra layer: SPAI conditioning, batched solves, rollout, Newton."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.fem import (
    assemble_stokes,
    assemble_velocity_mass,
    assemble_convection,
    assemble_load_sincos,
    assemble_scalar_block,
    apply_bc_matrix,
    apply_bc_vector,
    make_bc,
)
from feonet_navier_stokes_tpu.fem.bcs import square_bcs
from feonet_navier_stokes_tpu.linalg import (
    spai,
    condition_number,
    solve_dense_batched,
    implicit_euler_rollout,
    masked_convection,
    ns_residual,
    newton_solve_ns,
)
from feonet_navier_stokes_tpu.sampling import sample_sincos_coeffs


@pytest.fixture(scope="module")
def stokes_system(space_4x4):
    bc = make_bc(space_4x4, square_bcs("channel_flow"))
    A = assemble_stokes(space_4x4, mu=1.0, dtype=jnp.float64)
    mask = jnp.asarray(bc.mask)
    Abc = apply_bc_matrix(A, mask)
    return space_4x4, bc, Abc


def test_spai_improves_conditioning(space_4x4):
    """Quick functional check on the P2 stiffness block (SPD -> fast SPAI
    convergence). The full reference parity number — ne=72 channel matrix
    cond 167.33 -> 1.489 after SPAI(20000), matching
    FEONet_Stokes_square/test.ipynb cells 3/6 to 4 digits — is verified in
    the slow suite (test_spai_parity_ne72, marked slow) and in bench.py."""
    K = assemble_scalar_block(space_4x4, "stiffness", dtype=jnp.float64)
    n2 = space_4x4.n2
    K = K + 0.1 * jnp.eye(n2)  # lift the constant-mode null space
    c0 = condition_number(K)
    M = spai(K, 300)
    c1 = condition_number(K @ M)
    assert c1 < 1.05, f"SPAI failed: {c0} -> {c1}"


@pytest.mark.slow
def test_spai_parity_ne72_channel():
    """cond(A @ SPAI(A, 20000)) == 1.4890 vs the reference's 1.489
    (FEONet_Stokes_square/test.ipynb cell 6). ~5 min on CPU."""
    from feonet_navier_stokes_tpu.geometry import (
        build_taylor_hood,
        structured_rectangle,
    )

    sp = build_taylor_hood(structured_rectangle(6, 6))
    bc = make_bc(sp, square_bcs("channel_flow"))
    A = apply_bc_matrix(
        assemble_stokes(sp, mu=0.1, dtype=jnp.float64), jnp.asarray(bc.mask)
    )
    M = spai(A, 20000)
    np.testing.assert_allclose(condition_number(A @ M), 1.489, rtol=1e-3)


def test_batched_solve_matches_numpy(stokes_system):
    space, bc, Abc = stokes_system
    coeffs = sample_sincos_coeffs(jax.random.PRNGKey(0), 5, dtype=jnp.float64)
    loads = assemble_load_sincos(space, coeffs, dtype=jnp.float64)
    loads = apply_bc_vector(loads, jnp.asarray(bc.mask), jnp.asarray(bc.values))
    X = solve_dense_batched(Abc, loads)
    X_np = np.linalg.solve(np.asarray(Abc), np.asarray(loads).T).T
    np.testing.assert_allclose(np.asarray(X), X_np, rtol=1e-9, atol=1e-12)


def test_implicit_euler_matches_loop(space_4x4):
    bc = make_bc(space_4x4, square_bcs("zero"))
    mask_np = bc.mask.copy()
    mask_np[2 * space_4x4.n2] = 1.0  # pin pressure (full-Dirichlet velocity)
    mask, vals = jnp.asarray(mask_np), jnp.asarray(bc.values)
    A = apply_bc_matrix(
        assemble_stokes(space_4x4, mu=1.0, div_sign_pu=+1.0, dtype=jnp.float64), mask
    )
    S = apply_bc_matrix(assemble_velocity_mass(space_4x4, dtype=jnp.float64), mask)
    ng = space_4x4.ng
    rng = np.random.default_rng(0)
    u0 = jnp.asarray(rng.standard_normal((3, ng)))
    load = jnp.asarray(rng.standard_normal(ng))
    dt, T = 0.01, 5
    traj = implicit_euler_rollout(S, A, u0, load, dt, T)
    assert traj.shape == (3, T + 1, ng)
    # numpy reference loop
    sys_np = np.asarray(S + dt * A)
    u = np.asarray(u0)
    for t in range(T):
        rhs = u @ np.asarray(S).T + dt * np.asarray(load)
        u = np.linalg.solve(sys_np, rhs.T).T
        np.testing.assert_allclose(np.asarray(traj[:, t + 1]), u, rtol=1e-8, atol=1e-10)


def test_masked_convection_identity(space_4x4):
    """conv = d1*(B1 u) + d2*(B2 u) with d built from same-node velocity
    values — cross-check against an explicit index-gather implementation
    (the reference's formulation, train_FEONet.py:314-322)."""
    B1, B2 = assemble_convection(space_4x4, dtype=jnp.float64)
    n2, ng = space_4x4.n2, space_4x4.ng
    u = jnp.asarray(np.random.default_rng(1).standard_normal((2, ng)))
    conv = np.asarray(masked_convection(u, B1, B2, n2))
    # explicit version
    u_np = np.asarray(u)
    Bu1 = u_np @ np.asarray(B1).T
    Bu2 = u_np @ np.asarray(B2).T
    i = np.arange(n2)
    j = np.arange(n2, 2 * n2)
    expected = np.zeros_like(u_np)
    expected[:, i] += u_np[:, i] * Bu1[:, i]
    expected[:, j] += u_np[:, i] * Bu1[:, j]
    expected[:, i] += u_np[:, j] * Bu2[:, i]
    expected[:, j] += u_np[:, j] * Bu2[:, j]
    np.testing.assert_allclose(conv, expected, rtol=1e-12)


def test_newton_steady_ns(space_4x4):
    """Newton on the assembled NS system converges to machine residual and
    satisfies the BC rows exactly (reference: compare_ordering_nonlinear.ipynb
    cell 25 reaches 1e-10 in ~8 iterations)."""
    bc = make_bc(space_4x4, square_bcs("lower"))
    mask, vals = jnp.asarray(bc.mask), jnp.asarray(bc.values)
    A = apply_bc_matrix(assemble_stokes(space_4x4, mu=0.1, dtype=jnp.float64), mask)
    B1, B2 = assemble_convection(space_4x4, dtype=jnp.float64)
    # seed chosen to converge on this coarse mesh; non-converging draws are
    # resampled by the data pipeline exactly like the reference
    # (assemble_fenics.py:239-241) — see test_ns_resampling_pipeline.
    coeffs = sample_sincos_coeffs(jax.random.PRNGKey(2), 1, dtype=jnp.float64)
    load = assemble_load_sincos(space_4x4, coeffs, dtype=jnp.float64)[0]
    load = apply_bc_vector(load, mask, jnp.asarray(bc.values))

    u, rel_res, iters = newton_solve_ns(
        A, B1, B2, load, space_4x4.n2, conv_row_mask=mask
    )
    assert float(rel_res) < 1e-10, f"rel residual {rel_res} after {iters} iters"
    assert int(iters) < 15
    # BC rows: u_r == g_r exactly (residual rows are u - g there)
    idx = bc.indices
    np.testing.assert_allclose(
        np.asarray(u)[idx], np.asarray(bc.values)[idx], atol=1e-9
    )
    # residual identity check
    r = ns_residual(u, A, B1, B2, load, space_4x4.n2, conv_row_mask=mask)
    assert float(jnp.linalg.norm(r)) / float(jnp.linalg.norm(load)) < 1e-10


def test_equilibrate_scaling_identity(stokes_system):
    """Ruiz equilibration: A_eq == diag(dr) A diag(dc), row/col max-norms ~1,
    and the scaled solve recovers the raw solution via u = dc * u_hat."""
    from scipy.sparse import csr_matrix

    from feonet_navier_stokes_tpu.linalg import equilibrate

    _, _, Abc = stokes_system
    A = np.asarray(Abc)
    A_eq, dr, dc = equilibrate(A)
    np.testing.assert_allclose(A_eq, dr[:, None] * A * dc[None, :], rtol=1e-12)
    assert np.abs(A_eq).max(axis=1).max() < 1.5
    assert np.abs(A_eq).max(axis=1).min() > 0.5
    assert np.abs(A_eq).max(axis=0).min() > 0.5
    # sparse path agrees with the dense path
    A_eq_sp, dr_sp, dc_sp = equilibrate(csr_matrix(A))
    np.testing.assert_allclose(A_eq_sp.toarray(), A_eq, rtol=1e-12)
    np.testing.assert_allclose(dr_sp, dr, rtol=1e-12)
    # solve round-trip: A_eq u_hat = dr*f  =>  dc*u_hat solves A u = f
    f = np.random.default_rng(3).standard_normal(A.shape[0])
    u_hat = np.linalg.solve(A_eq, dr * f)
    np.testing.assert_allclose(dc * u_hat, np.linalg.solve(A, f), rtol=1e-8)


def test_spai_sparse_improves_conditioning(stokes_system):
    """Static-pattern (Grote-Huckle) SPAI. On the saddle-point Stokes system
    the pattern of A is too poor to precondition (cond can even worsen —
    the inverse of an indefinite operator is not A-patterned), but the A**2
    pattern is a real preconditioner: cond 1861 -> ~12 on the 4x4 channel
    system, two orders of magnitude, with M still sparse/BSR-tileable."""
    from scipy.sparse import csc_matrix

    from feonet_navier_stokes_tpu.linalg import spai_sparse

    _, _, Abc = stokes_system
    A = np.asarray(Abc)
    c0 = condition_number(A)
    M_a = spai_sparse(A, pattern="A")
    # pattern containment: nonzeros of M are a subset of nonzeros of A
    A_pat = csc_matrix(A)
    M_pat = M_a.copy()
    M_pat.data[:] = 1.0
    assert set(zip(*M_pat.nonzero())) <= set(zip(*A_pat.nonzero()))
    c2 = condition_number(A @ spai_sparse(A, pattern="A2").toarray())
    assert c2 < 0.02 * c0, f"{c0} -> {c2}"


def test_native_spai_matches_scipy_path(space_4x4):
    """The C++ kernel (native/spai.cpp) and the scipy CSR fallback follow the
    same iteration to float64 rounding."""
    from feonet_navier_stokes_tpu._native import native_lib
    from feonet_navier_stokes_tpu.linalg.spai import _spai_native
    from scipy.sparse import csr_matrix

    if native_lib() is None:
        pytest.skip("native kernel not buildable")
    mask = jnp.asarray(make_bc(space_4x4, square_bcs("lower")).mask)
    A = np.asarray(apply_bc_matrix(assemble_stokes(space_4x4, mu=0.1), mask))
    A_sp = csr_matrix(A)
    A_sp.sort_indices()
    one_norm = np.max(np.abs((A_sp @ A_sp.T).toarray()).sum(axis=0))
    M_nat = np.ascontiguousarray((2.0 / one_norm) * A)
    assert _spai_native(A_sp, M_nat, 500)
    M_ref = (2.0 / one_norm) * A.copy()
    eye = np.eye(A.shape[0])
    for _ in range(500):
        G = eye - A_sp @ M_ref
        AG = A_sp @ G
        alpha = np.sum(G * AG) / np.sum(AG * AG)
        M_ref += alpha * G
    np.testing.assert_allclose(M_nat, M_ref, atol=1e-11)


def test_linear_map_lstsq_global_optimum():
    """The closed-form LinearMap fit solves the convex residual objective to
    (near) machine precision on a tiny stokes_square config — val rel-L2
    collapses far below anything gradient training reaches."""
    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg import linear_map_lstsq, set_linear_map_params
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    p = build_problem(ProblemConfig(
        name="stokes_square", bc="channel_flow", nx=4, precond_mode="exact"))
    fit = linear_map_lstsq(p, num_train=800)
    assert fit["train_fit_rms"] < 1e-7

    trainer = Trainer(p, TrainConfig(model="LinearMap", num_val=50))
    set_linear_map_params(trainer, fit)
    _, val_ds = trainer.make_datasets()
    errs = trainer.evaluate(val_ds)
    assert errs["coeff"] < 1e-5, errs


def test_linear_step_exact_propagator():
    """linear_step_exact installs the exact discrete propagator: the rollout
    residual loss vanishes and val trajectories match the implicit-Euler
    ground truth to f32 precision."""
    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg import linear_step_exact, set_linear_step_params
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    p = build_problem(ProblemConfig(
        name="timedep_stokes", bc="lower", nx=5, dt=0.01, seq_len=6,
        equilibrate=True, precond_mode="exact"))
    fit = linear_step_exact(p)
    trainer = Trainer(p, TrainConfig(model="LinearStep", num_val=20))
    set_linear_step_params(trainer, fit)
    _, val_ds = trainer.make_datasets()

    x = p.model_input(val_ds.batch, "LinearStep")
    pred, _ = trainer._apply(trainer.state.params, trainer.state.batch_stats,
                             x, train=False)
    loss = float(p.loss(pred, val_ds.batch, trainer.ops))
    denom = float((val_ds.batch["u_init"] ** 2).sum())
    assert loss / denom < 1e-8, (loss, denom)

    errs = trainer.evaluate(val_ds)
    assert errs["traj_rel_l2"] < 1e-4, errs
