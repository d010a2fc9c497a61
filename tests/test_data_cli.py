"""Dataset npz export/import (reference layout), CLI surface, graft entry."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.data import (
    export_reference_npz,
    load_reference_npz,
    dataset_path,
)

REFERENCE_KEYS = {
    # the reference npz contract (FEONet_Stokes_square/assemble_fenics.py:209-222)
    "ne", "ng", "p", "gfl", "idx_sol", "pos_u", "pos_p", "matrix",
    "train_coeff_fs", "train_load_vectors",
    "train_fenics_u1", "train_fenics_u2", "train_fenics_p",
    "validate_coeff_fs", "validate_load_vectors",
    "validate_fenics_u1", "validate_fenics_u2", "validate_fenics_p",
}


def test_npz_roundtrip_reference_layout(tmp_path):
    p = build_problem(ProblemConfig(name="stokes_square", bc="channel_flow", nx=4))
    tb, tt = p.sample_converged(jax.random.PRNGKey(5), 5)
    vb, vt = p.sample_converged(jax.random.PRNGKey(10), 3)
    path = dataset_path(str(tmp_path), p)
    export_reference_npz(path, p, tb, tt, vb, vt)
    z = load_reference_npz(path)
    assert REFERENCE_KEYS <= set(z.keys())
    assert int(z["ne"]) == 32 and int(z["ng"]) == p.ng
    assert z["matrix"].shape == (p.ng, p.ng)
    assert z["train_fenics_u1"].shape == (5, p.n2)
    # idx_sol gathers reconstruct the full coefficient vector
    u_full = np.concatenate(
        [z["train_fenics_u1"], z["train_fenics_u2"], z["train_fenics_p"]], axis=1
    )
    np.testing.assert_allclose(u_full, np.asarray(tt), rtol=1e-6)
    # p (mixed coords) rows for idx_sol[0] are the velocity DoF coords
    np.testing.assert_allclose(z["p"][z["idx_sol"][0]], z["pos_u"])


def test_timedep_npz_has_operators(tmp_path):
    p = build_problem(
        ProblemConfig(name="timedep_stokes", bc="lower", nx=4, forcing="five", seq_len=2)
    )
    tb, tt = p.sample_converged(jax.random.PRNGKey(5), 3)
    vb, vt = p.sample_converged(jax.random.PRNGKey(10), 2)
    path = dataset_path(str(tmp_path), p)
    assert "dt_0_01" in path
    export_reference_npz(path, p, tb, tt[:, -1], vb, vt[:, -1])
    z = load_reference_npz(path)
    assert {"S", "A", "load_vector"} <= set(z.keys())


def test_cli_help_and_solve():
    out = subprocess.run(
        [sys.executable, "-m", "feonet_navier_stokes_tpu.cli.main", "--help"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0
    for cmd in ("assemble", "solve", "train", "eval", "bench"):
        assert cmd in out.stdout


def test_graft_entry_single():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    coeff, loss = jax.jit(fn)(*args)
    assert coeff.shape == (4, 387)
    assert np.isfinite(float(loss))


def test_graft_entry_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_graft2", "/root/repo/__graft_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    m.dryrun_multichip(8)


def test_export_equilibrated_stores_raw_loads(tmp_path):
    """The reference-layout npz must hold RAW loads even when the problem's
    training batch is Ruiz-scaled."""
    import jax
    import numpy as np

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
    from feonet_navier_stokes_tpu.data import export_reference_npz

    p = build_problem(ProblemConfig(name="stokes_square", bc="lower", nx=4,
                                    equilibrate=True))
    b, t = p.sample_converged(jax.random.PRNGKey(0), 3)
    path = str(tmp_path / "x.npz")
    export_reference_npz(path, p, b, t, b, t)
    z = np.load(path, allow_pickle=True)
    raw = p.load64(b)
    np.testing.assert_allclose(z["train_load_vectors"], raw, rtol=1e-12)
    # and the raw load differs from the scaled training batch load
    assert np.abs(np.asarray(b["load"], np.float64) - raw).max() > 1e-6


def test_train_cache_problem_fingerprint(tmp_path):
    """--data-cache stores the problem config fingerprint and refuses a
    mismatched reload (regression: the r3 td_cascade forcing mismatch —
    a 'five' cache under a 'sincos' problem — burned three TPU runs)."""
    cache = str(tmp_path / "cache.npz")

    def run(*extra):
        return subprocess.run(
            [sys.executable, "-m", "feonet_navier_stokes_tpu.cli.main",
             "train", "--problem", "stokes_square", "--bc", "lower",
             "--nx", "4", "--model", "FCNN", "--loss-mode", "residual",
             "--no-train-truth", "--num-train", "4", "--num-val", "2",
             "--epochs", "1", "--eval-every", "1", "--data-cache", cache,
             *extra],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "JAX_PLATFORM_NAME": "cpu"},
        )

    assert run("--forcing", "sincos").returncode == 0      # builds the cache
    assert run("--forcing", "sincos").returncode == 0      # matching reload
    bad = run("--bc", "zero")                              # mismatched reload
    assert bad.returncode == 1
    assert "different problem config" in bad.stderr
    assert "bc" in bad.stderr


def test_train_cache_prefix_reuse(tmp_path):
    """A cache holding MORE train samples than --num-train is sliced
    deterministically to the first num_train (one committed cache serves a
    whole data-scaling curve); a smaller/equal request never rejects."""
    cache = str(tmp_path / "cache.npz")

    def run(n):
        return subprocess.run(
            [sys.executable, "-m", "feonet_navier_stokes_tpu.cli.main",
             "train", "--problem", "stokes_square", "--bc", "lower",
             "--nx", "4", "--model", "FCNN", "--loss-mode", "residual",
             "--no-train-truth", "--num-train", str(n), "--num-val", "2",
             "--epochs", "1", "--eval-every", "1", "--data-cache", cache],
            capture_output=True, text=True, cwd="/root/repo",
            env={**os.environ, "JAX_PLATFORM_NAME": "cpu"},
        )

    assert run(8).returncode == 0                 # builds an 8-sample cache
    out = run(3)                                  # prefix reuse
    assert out.returncode == 0
    assert "sliced cached train split to num_train=3" in out.stdout
    full = run(8)                                 # exact-size reload: no slice
    assert full.returncode == 0
    assert "sliced cached" not in full.stdout
