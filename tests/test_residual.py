"""Residual losses: zero at ground truth, match explicit formulations,
gradients finite."""

import jax
import jax.numpy as jnp
import numpy as np

from feonet_navier_stokes_tpu.residual import (
    linear_residual,
    nonlinear_residual,
    rollout_residual,
)
from feonet_navier_stokes_tpu.linalg import masked_convection


def test_linear_residual_matches_reference_loop():
    """Our fused reduction equals the reference's per-DoF MSE-sum loop
    (FEONet_Stokes_square/train_FEONet.py:290-296)."""
    rng = np.random.default_rng(0)
    B, ng = 7, 23
    op = rng.standard_normal((ng, ng))
    pred = rng.standard_normal((B, ng))
    rhs = rng.standard_normal((B, ng))
    got = float(linear_residual(jnp.asarray(pred), jnp.asarray(op), jnp.asarray(rhs)))
    # reference loop: loss = sum_ii sum_b (LHS[b,ii]-RHS[b,ii])^2
    LHS = pred @ op.T
    want = sum(np.sum((LHS[:, i] - rhs[:, i]) ** 2) for i in range(ng))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_linear_residual_zero_at_solution():
    rng = np.random.default_rng(1)
    ng = 16
    op = rng.standard_normal((ng, ng)) + 4 * np.eye(ng)
    u = rng.standard_normal((3, ng))
    rhs = u @ op.T
    assert float(linear_residual(jnp.asarray(u), jnp.asarray(op), jnp.asarray(rhs))) < 1e-20


def test_nonlinear_residual_zero_at_newton_solution():
    """Plugging the group-FEM Newton solution into the training loss gives ~0
    — the property the reference validates in compare_ordering_nonlinear.ipynb
    cells 24-25/33."""
    import jax
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg import newton_solve_ns

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4, ns_truth="group"))
    b = p.sample_batch(jax.random.PRNGKey(2), 1)
    load = b["load"].astype(jnp.float64)[0]
    u, rel, _ = newton_solve_ns(
        p.A64, p.B1_64, p.B2_64, load, p.n2, conv_row_mask=jnp.asarray(p.bc.mask)
    )
    assert float(rel) < 1e-10
    loss = nonlinear_residual(
        u[None], p.A64, load[None], p.B1_64, p.B2_64, p.n2,
        conv_row_mask=jnp.asarray(p.bc.mask),
    )
    assert float(loss) < 1e-18 * float(jnp.sum(load**2)) + 1e-16


def test_rollout_residual_zero_at_exact_rollout():
    """The implicit-Euler trajectory makes every rollout residual vanish."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five", seq_len=4)
    )
    b = p.sample_batch(jax.random.PRNGKey(3), 2)
    traj = p.ground_truth(b, n_steps=4)  # (B, 5, ng) includes u0
    loss = rollout_residual(
        traj[:, 1:], p.S64, p.sys64, p.load_const64, p.config.dt,
        p.u_init64(b),
    )
    # scale-relative: compare against the loss of a perturbed trajectory
    loss_bad = rollout_residual(
        traj[:, 1:] * 1.01, p.S64, p.sys64, p.load_const64, p.config.dt,
        p.u_init64(b),
    )
    assert float(loss) < 1e-12 * float(loss_bad)


def test_rollout_self_conditioning():
    """RHS at step t must use the PREDICTION at t-1 (not the truth): a wrong
    u_{t-1} changes residual at t."""
    rng = np.random.default_rng(4)
    B, T, ng = 2, 3, 8
    S = np.eye(ng) + 0.1 * rng.standard_normal((ng, ng))
    sys = np.eye(ng) + 0.1 * rng.standard_normal((ng, ng))
    load = rng.standard_normal(ng)
    u0 = rng.standard_normal((B, ng))
    pred = rng.standard_normal((B, T, ng))
    l0 = rollout_residual(jnp.asarray(pred), jnp.asarray(S), jnp.asarray(sys), jnp.asarray(load), 0.1, jnp.asarray(u0))
    pred2 = pred.copy()
    pred2[:, 0] += 1.0  # changes LHS at t=0 AND RHS at t=1
    l1 = rollout_residual(jnp.asarray(pred2), jnp.asarray(S), jnp.asarray(sys), jnp.asarray(load), 0.1, jnp.asarray(u0))
    # explicit loop reference
    def explicit(ps):
        prev = u0
        per_t = []
        for t in range(T):
            resid = ps[:, t] @ sys.T - (prev @ S.T + 0.1 * load)
            per_t.append(np.sum(resid**2))
            prev = ps[:, t]
        return np.mean(per_t)
    np.testing.assert_allclose(float(l0), explicit(pred), rtol=1e-5)
    np.testing.assert_allclose(float(l1), explicit(pred2), rtol=1e-5)


def test_nonlinear_gradient_finite():
    rng = np.random.default_rng(5)
    ng, n2 = 10, 4
    A = jnp.asarray(rng.standard_normal((ng, ng)))
    B1 = jnp.asarray(rng.standard_normal((ng, ng)))
    B2 = jnp.asarray(rng.standard_normal((ng, ng)))
    pred = jnp.asarray(rng.standard_normal((2, ng)))
    rhs = jnp.asarray(rng.standard_normal((2, ng)))
    g = jax.grad(lambda u: nonlinear_residual(u, A, rhs, B1, B2, n2))(pred)
    assert np.isfinite(np.asarray(g)).all()


def test_rollout_residual_precond_coordinates():
    """With SPAI the rollout's self-conditioning must map predictions back to
    physical coordinates (u = M u_hat) before the S-term: the exact
    trajectory, expressed as u_hat = M^{-1} u, must still zero the loss."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five",
                      seq_len=4, precond_iters=500)
    )
    b = p.sample_batch(jax.random.PRNGKey(3), 2)
    traj = p.ground_truth(b, n_steps=4)
    Minv = np.linalg.inv(p.precond64)
    pred_hat = traj[:, 1:] @ Minv.T
    loss = rollout_residual(
        pred_hat, p.S, p.op_train, p.load_const, p.config.dt,
        jnp.asarray(p.u_init64(b)), precond=p.precond,
    )
    loss_bad = rollout_residual(
        pred_hat * 1.01, p.S, p.op_train, p.load_const, p.config.dt,
        jnp.asarray(p.u_init64(b)), precond=p.precond,
    )
    assert float(loss) < 1e-9 * float(loss_bad)


def test_rollout_residual_equilibrated_coordinates():
    """Ruiz-equilibrated rollout (the label-free pressure-conditioning path):
    the exact trajectory expressed in scaled coordinates u_hat = u / dc must
    zero the loss built from dr-scaled operators — and the scaled system must
    be orders better conditioned than the raw (S + dt*A)."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five",
                      seq_len=4, equilibrate=True)
    )
    dr, dc = p.equil64
    # f64 twins of the device operators (exact zero-at-truth check)
    op_eq = dr[:, None] * p.sys64 * dc[None, :]
    S_eq = dr[:, None] * p.S64
    load_eq = dr * p.load_const64
    b = p.sample_batch(jax.random.PRNGKey(3), 2)
    traj = p.ground_truth(b, n_steps=4)
    pred_hat = traj[:, 1:] / dc[None, None, :]
    u0 = jnp.asarray(p.u_init64(b))
    loss = rollout_residual(
        pred_hat, S_eq, op_eq, load_eq, p.config.dt, u0,
        equil_dc=jnp.asarray(dc),
    )
    loss_bad = rollout_residual(
        pred_hat * 1.01, S_eq, op_eq, load_eq, p.config.dt, u0,
        equil_dc=jnp.asarray(dc),
    )
    assert float(loss) < 1e-12 * float(loss_bad)
    # conditioning: the whole point of the path
    assert np.linalg.cond(op_eq) < 0.01 * np.linalg.cond(p.sys64)
    # device-ops plumbing: Problem.loss at truth is tiny vs a perturbation
    dev_loss = p.loss(jnp.asarray(pred_hat, jnp.float32), b)
    dev_bad = p.loss(jnp.asarray(pred_hat * 1.01, jnp.float32), b)
    assert float(dev_loss) < 1e-4 * float(dev_bad)
    # unmap returns physical coordinates
    np.testing.assert_allclose(
        np.asarray(p.unmap(jnp.asarray(pred_hat))), traj[:, 1:], rtol=1e-6
    )


def test_nonlinear_residual_equilibrated_zero_at_newton():
    """Equilibrated steady-NS residual: dr(A u + conv(u) - f) with u = dc*û
    vanishes at the group-FEM Newton solution."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg import newton_solve_ns

    p = build_problem(
        ProblemConfig(name="steady_ns", bc="lower", nx=4, ns_truth="group",
                      equilibrate=True)
    )
    dr, dc = p.equil64
    b = p.sample_batch(jax.random.PRNGKey(2), 1)
    load64 = p.load64(b)[0]
    mask = jnp.asarray(p.bc.mask)
    u, rel, _ = newton_solve_ns(
        p.A64, p.B1_64, p.B2_64, load64, p.n2, conv_row_mask=mask
    )
    assert float(rel) < 1e-10
    op_eq = dr[:, None] * p.A64 * dc[None, :]
    loss = nonlinear_residual(
        (u / dc)[None], op_eq, (dr * load64)[None], p.B1_64, p.B2_64, p.n2,
        conv_row_mask=mask, equil_dc=jnp.asarray(dc), equil_dr=jnp.asarray(dr),
    )
    loss_bad = nonlinear_residual(
        (u / dc)[None] * 1.01, op_eq, (dr * load64)[None], p.B1_64, p.B2_64,
        p.n2, conv_row_mask=mask, equil_dc=jnp.asarray(dc),
        equil_dr=jnp.asarray(dr),
    )
    assert float(loss) < 1e-12 * float(loss_bad)


def test_exact_precond_ns_zero_at_newton_and_cond():
    """precond_mode='exact' (Ruiz∘exact-inverse): cond(op_train) == 1+O(eps)
    — the SPAI iteration stalls on the steady-NS operator (cond 193 after
    2000 iters at nx=4) which is why the label-free NS objective needed this
    mode — and the composed nonlinear residual still vanishes exactly at the
    group-FEM Newton solution."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.linalg import newton_solve_ns

    p = build_problem(
        ProblemConfig(name="steady_ns", bc="lower", nx=4, ns_truth="group",
                      equilibrate=True, precond_mode="exact")
    )
    cond = np.linalg.cond(np.asarray(p._base_eq64 @ p.precond64))
    assert cond < 1 + 1e-8, cond

    dr, dc = p.equil64
    b = p.sample_batch(jax.random.PRNGKey(2), 1)
    load64 = p.load64(b)[0]
    mask = jnp.asarray(p.bc.mask)
    u, rel, _ = newton_solve_ns(
        p.A64, p.B1_64, p.B2_64, load64, p.n2, conv_row_mask=mask
    )
    assert float(rel) < 1e-10
    uhat = np.linalg.solve(p.precond64, np.asarray(u, np.float64) / dc)
    ops = p.device_ops
    rhs = jnp.asarray(dr * load64, jnp.float32)[None]

    def loss_at(x):
        return float(nonlinear_residual(
            jnp.asarray(x, jnp.float32)[None], ops["op_train"], rhs,
            ops["B1"], ops["B2"], p.n2,
            conv_row_mask=ops.get("conv_row_mask"),
            equil_dc=ops.get("equil_dc"), equil_dr=ops.get("equil_dr"),
            precond=ops.get("precond"),
        ))

    assert loss_at(uhat) < 1e-6 * loss_at(uhat * 1.01)


def test_conv_scale_continuation():
    """conv_scale=0 reduces the NS residual to the linear Stokes residual;
    the trainer ramps it via TrainConfig.conv_ramp_epochs (the training-
    objective analog of newton_solve_continuation's homotopy)."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4))
    b = p.sample_batch(jax.random.PRNGKey(0), 3)
    pred = jax.random.normal(jax.random.PRNGKey(1), (3, p.d_out))
    ops = p.device_ops
    at0 = nonlinear_residual(
        pred, ops["op_train"], b["load"], ops["B1"], ops["B2"], p.n2,
        conv_row_mask=ops.get("conv_row_mask"), conv_scale=0.0,
    )
    lin = linear_residual(pred, ops["op_train"], b["load"])
    np.testing.assert_allclose(float(at0), float(lin), rtol=1e-6)
    at1 = nonlinear_residual(
        pred, ops["op_train"], b["load"], ops["B1"], ops["B2"], p.n2,
        conv_row_mask=ops.get("conv_row_mask"), conv_scale=1.0,
    )
    assert abs(float(at1) - float(lin)) > 0  # gamma=1 is the true objective

    # trainer smoke: the ramped step runs, trains, and the first-step loss
    # matches the gamma~0 (linear) objective value
    tc = TrainConfig(model="FCNN", lr=1e-3, epochs=8, num_train=8, num_val=4,
                     eval_every=8, conv_ramp_epochs=1000, truth_for_train=False,
                     model_kwargs={"hidden_dims": (8,)}, data_parallel=False)
    tr = Trainer(p, tc)
    train_ds, val_ds = tr.make_datasets(with_truth=False)
    hist = tr.fit(train_ds, None, verbose=False)
    assert np.isfinite(hist[-1]["loss"])


def test_ns_linearized_residual_matches_taylor():
    """ns_linearized_residual == the first-order Taylor expansion of the true
    steady-NS Galerkin residual about the label: for u = u* + eps*v with u*
    a root (rel_res <= 1e-9), ||r(u)||^2 / linearized -> 1 as eps -> 0, and
    the term vanishes exactly at the label."""
    import jax
    import numpy as np
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.residual.losses import (
        ns_linearized_residual, nonlinear_residual)

    # ns_truth='group': the label must be a root of the SAME (group-FEM)
    # system the loss linearizes — the default weak-form truth carries the
    # reference's own ~1.7e-3 quadrature floor in this system (SURVEY.md §4)
    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    ns_truth="group"))
    batch, truth = p.sample_converged(jax.random.PRNGKey(0), 3)
    ops = p.device_ops
    truth32 = jnp.asarray(truth, jnp.float32)

    # exact at the label
    z = ns_linearized_residual(
        truth32, truth32, ops["A_raw"], ops["B1"], ops["B2"], p.n2,
        conv_row_mask=ops.get("conv_row_mask"))
    assert float(z) == 0.0

    rng = np.random.default_rng(1)
    v = rng.standard_normal(truth.shape)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ratios = []
    for eps in (1e-2, 1e-3):
        pred = jnp.asarray(truth + eps * v, jnp.float32)
        lin = float(ns_linearized_residual(
            pred, truth32, ops["A_raw"], ops["B1"], ops["B2"], p.n2,
            conv_row_mask=ops.get("conv_row_mask")))
        # true residual loss of the perturbed state (raw coordinates)
        full = float(nonlinear_residual(
            pred, ops["op_train"], batch["load"], ops["B1"], ops["B2"],
            p.n2, conv_row_mask=ops.get("conv_row_mask")))
        ratios.append(full / lin)
    assert abs(ratios[0] - 1.0) < 0.05, ratios   # O(eps) agreement
    assert abs(ratios[1] - 1.0) < 0.05, ratios


def test_ns_linearized_equilibrated_row_scale():
    """With equilibrate=True the linearized term row-scales by dr, matching
    the Galerkin losses' equation space (problems/base.py:linearized_loss)."""
    import jax
    import numpy as np
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4,
                                    equilibrate=True))
    batch, truth = p.sample_converged(jax.random.PRNGKey(0), 2)
    ops = p.device_ops
    truth32 = jnp.asarray(truth, jnp.float32)
    pred = truth32 + 1e-3
    lin = float(p.linearized_loss(pred, truth32, ops))
    assert np.isfinite(lin) and lin > 0
    # manual: dr ∘ (A v + conv'(u*) v) with v = 1e-3
    from feonet_navier_stokes_tpu.residual.losses import ns_linearized_residual
    manual = float(ns_linearized_residual(
        pred, truth32, ops["A_raw"], ops["B1"], ops["B2"], p.n2,
        conv_row_mask=ops.get("conv_row_mask"), equil_dr=ops.get("equil_dr")))
    np.testing.assert_allclose(lin, manual, rtol=1e-6)
