"""Solver-free NS defect correctors (linalg/ns_corrector.py).

The identities under test:

* the polarized bilinear convection Q reproduces the trilinear form
  (Q(u,u) == conv_fn(u)) and its increments (no-cancellation evaluation);
* steady_ns: a least-squares inverse-Jacobian fitted from (residual,
  exact-defect) pairs contracts a perturbed prediction by orders of
  magnitude when iterated — with NO solver at apply time;
* timedep_ns: the defect step map g -> e is an exact linear map (the IMEX
  scheme is linear given the previous state), so tdns_step_fit identifies
  it to near machine precision and the f32 rollout corrects a perturbed
  trajectory to the f32 floor;
* defect_truth64 extends to steady_ns and timedep_ns (VERDICT r4 weak#5).

The steady fit tests use MANUFACTURED solutions — pick smooth u*, define
load := A_truth u* + keep∘Q(u*,u*) — because the weak system is then solved
exactly by construction at any batch size, while sample_converged at the
reference forcing amplitudes legitimately grinds through divergent draws
(minutes for the ~200 samples a well-posed (ng+1)-column fit needs).
"""

import jax
import numpy as np
import pytest

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.linalg.ns_corrector import (
    apply_steady_defect_fit,
    apply_tdns_step_fit,
    steady_defect_fit,
    steady_weak_residual,
    tdns_step_fit,
)
from feonet_navier_stokes_tpu.train.metrics import component_errors


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a, np.float64) - b)
                 / np.linalg.norm(b))


@pytest.fixture(scope="module")
def ns_problem():
    return build_problem(ProblemConfig(name="steady_ns", bc="lower", nx=4))


def _manufactured(p, n, seed, scale=1.0):
    """(truth, loads) pairs solving the weak system EXACTLY by construction:
    smooth random u*, load := A_truth u* + keep∘Q(u*,u*) (+ BC rows kept as
    the identity rows of A_truth reproduce u* there)."""
    from feonet_navier_stokes_tpu.fem.nonlinear import make_convection_pair

    rng = np.random.default_rng(seed)
    # a solution FAMILY (like physical samples): perturbations around one
    # base state, so J(u_i) varies mildly across the batch — the regime the
    # averaged-inverse fit targets
    ng = p.ng
    base = rng.standard_normal(ng) * scale
    u = base + rng.standard_normal((n, ng)) * (0.2 * scale)
    A = np.asarray(p.A_truth64, np.float64)
    keep = 1.0 - np.asarray(p.bc.mask, np.float64)
    Q = make_convection_pair(p.space)
    loads = u @ A.T + keep * Q(u, u)
    return u, loads


def test_convection_pair_polarization(ns_problem):
    from feonet_navier_stokes_tpu.fem.nonlinear import make_convection_pair

    p = ns_problem
    Q = make_convection_pair(p.space)
    rng = np.random.default_rng(0)
    u = rng.standard_normal((3, p.ng))
    e = rng.standard_normal((3, p.ng)) * 1e-3
    # trilinear diagonal == conv_fn
    ref = p._conv_fn(u)
    assert _rel(Q(u, u), ref) < 1e-12
    # polarized increment == conv(u+e) - conv(u), without the subtraction
    inc = Q(u, e) + Q(e, u) + Q(e, e)
    ref_inc = p._conv_fn(u + e) - p._conv_fn(u)
    assert _rel(inc, ref_inc) < 1e-9


def test_manufactured_pairs_solve_weak_system(ns_problem):
    p = ns_problem
    truth, loads = _manufactured(p, 4, seed=5, scale=0.5)
    r = steady_weak_residual(p, truth, loads)
    rel = np.linalg.norm(r, axis=1) / np.linalg.norm(loads, axis=1)
    assert rel.max() < 1e-13, rel


def test_steady_defect_fit_contracts(ns_problem):
    p = ns_problem
    # the conv-feature refinement has 3*ng+1 = 562 columns at nx=4: the fit
    # set must comfortably overdetermine it (manufactured pairs are cheap)
    truth, loads = _manufactured(p, 1060, seed=6, scale=0.5)
    rng = np.random.default_rng(2)
    n_fit = 1000
    # synthetic frozen stage-1: truth + 2% perturbation
    u0 = truth * (1 + 0.02 * rng.standard_normal(truth.shape))
    fit = steady_defect_fit(p, u0[:n_fit], truth[:n_fit], loads[:n_fit],
                            stages=2)
    assert fit["fit_rel"][0] < 0.2, fit["fit_rel"]
    assert fit["train_contraction"] < 0.1, fit["train_contraction"]
    # held-out contraction, float64 apply (f32 covered below). White-noise
    # defects are the pessimistic case for the averaged-inverse maps (real
    # network errors are smooth); the measured stage-0 gain here is ~18x.
    u_corr = apply_steady_defect_fit(
        fit, p, loads[n_fit:], u0[n_fit:], dtype=np.float64)
    raw = component_errors(u0[n_fit:].astype(np.float32),
                           truth[n_fit:].astype(np.float32), p.n2)["coeff"]
    cor = component_errors(u_corr.astype(np.float32),
                           truth[n_fit:].astype(np.float32), p.n2)["coeff"]
    assert cor < raw / 10, (raw, cor)
    assert cor < 1.5e-3, cor
    # f32 apply lands within ~f32 rounding of the f64 one
    u32 = apply_steady_defect_fit(
        fit, p, loads[n_fit:], u0[n_fit:], dtype=np.float32)
    cor32 = component_errors(u32, truth[n_fit:].astype(np.float32),
                             p.n2)["coeff"]
    assert cor32 < max(5 * cor, 5e-5), (cor, cor32)


def test_steady_defect_truth64(ns_problem):
    """The exact-defect route through defect_batch64 + refine_ns on REAL
    converged samples (small n: the stable solve resamples divergent
    draws)."""
    p = ns_problem
    batch, truth = p.sample_converged(jax.random.PRNGKey(7), 2)
    rng = np.random.default_rng(1)
    u0 = np.asarray(truth) * (1 + 0.02 * rng.standard_normal(truth.shape))
    d = p.defect_batch64(batch, np.asarray(u0, np.float32))
    e_star = p.defect_truth64(d)
    assert e_star.shape == (2, p.ng)
    combined = np.asarray(d["u0"], np.float64) + e_star
    r = steady_weak_residual(p, combined, p.load64(batch))
    rel = np.linalg.norm(r, axis=1) / np.linalg.norm(p.load64(batch), axis=1)
    assert rel.max() < 1e-9, rel


@pytest.fixture(scope="module")
def tdns_problem():
    return build_problem(ProblemConfig(name="timedep_ns", bc="lower", nx=4,
                                       forcing="five", seq_len=5))


def test_tdns_defect_truth64(tdns_problem):
    p = tdns_problem
    batch = p.sample_batch(jax.random.PRNGKey(3), 3)
    truth = p.ground_truth(batch, n_steps=5)
    rng = np.random.default_rng(4)
    u0 = truth[:, 1:] * (1 + 0.05 * rng.standard_normal(truth[:, 1:].shape))
    d = p.defect_batch64(batch, np.asarray(u0, np.float32))
    e_star = p.defect_truth64(d)
    assert e_star.shape == (3, 6, p.ng)
    assert np.all(e_star[:, 0] == 0.0)
    combined = np.asarray(d["u0_phys"], np.float64) + e_star[:, 1:]
    assert _rel(combined, truth[:, 1:]) < 1e-5


def test_tdns_step_fit_exact_and_corrects(tdns_problem):
    p = tdns_problem
    T = 5
    batch = p.sample_batch(jax.random.PRNGKey(5), 60)
    truth = p.ground_truth(batch, n_steps=T)
    rng = np.random.default_rng(6)
    u0 = truth[:, 1:] * (1 + 0.05 * rng.standard_normal(truth[:, 1:].shape))
    fit = tdns_step_fit(p, batch, u0)
    # the step map is exactly linear -> near machine-precision identification
    assert fit["fit_rel"] < 1e-8, fit["fit_rel"]
    # held-out correction at f32
    batch2 = p.sample_batch(jax.random.PRNGKey(8), 8)
    truth2 = p.ground_truth(batch2, n_steps=T)
    u0_2 = truth2[:, 1:] * (1 + 0.05 * rng.standard_normal(truth2[:, 1:].shape))
    corr = apply_tdns_step_fit(fit, p, batch2, u0_2)
    raw = _rel(u0_2, truth2[:, 1:])
    cor = _rel(corr, truth2[:, 1:])
    assert cor < raw / 100, (raw, cor)
    assert cor < 1e-4, cor
