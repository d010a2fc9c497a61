"""Dataset-cache tooling: fingerprint core match + prefix-reuse slice.

tools/stretch_run.py caches are identified by (problem, nx, bc); split sizes
are PREFIX-reusable — any cache with num_train >= requested serves the
deterministic first-N slice (VERDICT round-2 item 8: replaces the exact-
num_train fingerprint and its snapshot-while-extending footgun).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "stretch_run.py")


def _run(tmp_path, *extra, expect_rc=0):
    cmd = [
        sys.executable, SCRIPT, "--nx", "4", "--epochs", "4",
        "--eval-every", "2", "--num-val", "2", "--filters", "2",
        "--log", str(tmp_path / "log.jsonl"),
        "--out", str(tmp_path / "result.json"),
        *extra,
    ]
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       env=env, cwd=REPO)
    assert r.returncode == expect_rc, (r.stdout[-2000:], r.stderr[-2000:])
    return r


@pytest.mark.slow
def test_stretch_cache_prefix_reuse(tmp_path):
    cache = str(tmp_path / "cache.npz")
    # 1) generate + cache 8 train samples
    _run(tmp_path, "--num-train", "8", "--data-cache", cache)
    z = np.load(cache, allow_pickle=True)
    assert z["train_batch_coeff_f"].shape[0] == 8
    full = np.asarray(z["train_batch_coeff_f"])

    # 2) prefix reuse: request 4 from the 8-sample cache -> first-4 slice
    r = _run(tmp_path, "--num-train", "4", "--data-cache", cache)
    assert "train 4" in r.stdout

    # 3) over-request fails with the extend hint
    r = _run(tmp_path, "--num-train", "16", "--data-cache", cache,
             expect_rc=1)
    assert "8 train samples" in (r.stdout + r.stderr)

    # 4) core-config mismatch (different bc) is rejected
    r = _run(tmp_path, "--num-train", "4", "--bc", "lower",
             "--data-cache", cache, expect_rc=1)
    assert "mismatched" in (r.stdout + r.stderr)

    # cache contents unchanged by the reuse runs
    z2 = np.load(cache, allow_pickle=True)
    np.testing.assert_array_equal(np.asarray(z2["train_batch_coeff_f"]), full)


def test_slim_cache_roundtrip(tmp_path):
    """export drops the re-derivable load vectors + casts truth to f32;
    rehydrate re-assembles the loads bit-compatibly (same f64 assembly ->
    f32 cast as sample_batch). Guards the git-preservation path for the
    warm-gen datasets (the 47k caches were lost with the round-2 VM)."""
    import jax

    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    p = build_problem(ProblemConfig(
        name="steady_ns", bc="lower", nx=6, equilibrate=True,
        ns_branch="stable",
    ))
    batch, truth = p.sample_converged(jax.random.PRNGKey(0), 2)
    cache = str(tmp_path / "full.npz")
    np.savez(cache,
             train_batch_coeff_f=np.asarray(batch["coeff_f"]),
             train_batch_load=np.asarray(batch["load"]),
             train_truth=np.asarray(truth),
             val_batch_coeff_f=np.asarray(batch["coeff_f"]),
             val_batch_load=np.asarray(batch["load"]),
             val_truth=np.asarray(truth))
    slim = str(tmp_path / "slim.npz")
    out = str(tmp_path / "rehydrated.npz")
    tool = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "slim_cache.py")
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu")
    for cmd in (
        [sys.executable, tool, "export", "--cache", cache, "--out", slim],
        [sys.executable, tool, "rehydrate", "--slim", slim, "--out", out,
         "--nx", "6"],
    ):
        r = subprocess.run(cmd, capture_output=True, text=True, env=env)
        assert r.returncode == 0, r.stdout + r.stderr
    z = np.load(out)
    np.testing.assert_array_equal(
        z["train_batch_load"], np.asarray(batch["load"], np.float32))
    np.testing.assert_allclose(
        z["train_truth"], np.asarray(truth, np.float32), rtol=0, atol=0)
    assert os.path.getsize(slim) < os.path.getsize(cache)
