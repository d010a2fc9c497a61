"""Visualization + CLI surfaces: eval --plot, train --resume, NaN abort.

Covers the reference's notebook-only L5 layer (tricontourf compare plots,
FEONet_Stokes_square/plot_results_channel_flow.ipynb cells 18-20) through the
CLI so no Python is needed to reproduce them, plus the resume/failure paths.
"""

import json
import os

import jax
import numpy as np
import pytest

from feonet_navier_stokes_tpu.cli.main import main as cli_main
from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train import Trainer, TrainConfig


@pytest.fixture(scope="module")
def tiny_problem():
    return build_problem(ProblemConfig(name="stokes_square", bc="lower", nx=4))


def test_tricontourf_compare_writes_figure(tiny_problem, tmp_path):
    p = tiny_problem
    from feonet_navier_stokes_tpu.viz import tricontourf_compare

    b = p.sample_batch(jax.random.PRNGKey(0), 2)
    gt = p.ground_truth(b)
    for comp in ("u1", "p", "speed"):
        out = str(tmp_path / f"cmp_{comp}.png")
        path = tricontourf_compare(p, gt[0], gt[0] * 1.05, component=comp, out_path=out)
        assert os.path.isfile(path) and os.path.getsize(path) > 10_000


def test_plot_training_history(tmp_path):
    from feonet_navier_stokes_tpu.viz import plot_training_history

    hist = [
        {"epoch": e, "loss": 1.0 / e, "u1": 0.5 / e, "coeff": 0.7 / e}
        for e in (100, 200, 300)
    ]
    out = plot_training_history(hist, str(tmp_path / "hist.png"))
    assert os.path.isfile(out) and os.path.getsize(out) > 5_000


def test_cli_eval_plot_end_to_end(tmp_path, capsys):
    """feonet train (tiny) -> feonet eval --plot renders the comparison."""
    ckpt_dir = str(tmp_path / "ckpt")
    png = str(tmp_path / "cmp.png")
    common = ["--problem", "stokes_square", "--bc", "lower", "--nx", "4",
              "--model", "FCNN"]
    rc = cli_main(["train", *common, "--epochs", "5", "--eval-every", "5",
                   "--num-train", "8", "--num-val", "4",
                   "--ckpt-dir", ckpt_dir])
    assert rc == 0
    latest = Trainer.latest_checkpoint(ckpt_dir)
    assert latest is not None
    rc = cli_main(["eval", *common, "--ckpt", latest, "--num-val", "4",
                   "--plot", png, "--plot-component", "u1"])
    assert rc == 0
    out = capsys.readouterr().out
    metrics = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert {"u1", "u2", "p", "coeff"} <= set(metrics)
    assert os.path.isfile(png) and os.path.getsize(png) > 10_000


def test_cli_eval_refine_steps(tmp_path, capsys):
    """feonet eval --refine-steps N (steady_ns): warm-started Newton
    refinement of the predictions reaches solver accuracy regardless of how
    little the network trained — the deployment path for <1e-3 NS
    (docs/navier_stokes.md section 3)."""
    ckpt_dir = str(tmp_path / "ckpt")
    common = ["--problem", "steady_ns", "--bc", "lower", "--nx", "4",
              "--model", "FCNN"]
    rc = cli_main(["train", *common, "--epochs", "400", "--eval-every", "400",
                   "--num-train", "8", "--num-val", "4",
                   "--loss-mode", "supervised", "--ckpt-dir", ckpt_dir])
    assert rc == 0
    capsys.readouterr()
    latest = Trainer.latest_checkpoint(ckpt_dir)
    rc = cli_main(["eval", *common, "--ckpt", latest, "--num-val", "4",
                   "--refine-steps", "25"])
    assert rc == 0
    out = capsys.readouterr().out
    metrics = json.loads([l for l in out.splitlines() if l.startswith("{")][-1])
    assert metrics["refined_rel_res_max"] < 1e-8
    assert metrics["refined_coeff"] < 1e-6
    assert metrics["refined_coeff"] < metrics["coeff"]


def test_cli_train_resume(tmp_path, capsys):
    """--resume restores the latest step_* checkpoint from --ckpt-dir."""
    ckpt_dir = str(tmp_path / "ckpt")
    common = ["--problem", "stokes_square", "--bc", "lower", "--nx", "4",
              "--model", "FCNN", "--num-train", "8", "--num-val", "4",
              "--eval-every", "5", "--ckpt-dir", ckpt_dir]
    assert cli_main(["train", *common, "--epochs", "5"]) == 0
    capsys.readouterr()
    assert cli_main(["train", *common, "--epochs", "5", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "resumed from" in out and "step 5" in out


def test_nan_limit_aborts(tiny_problem, monkeypatch):
    """A persistently non-finite loss aborts after nan_limit eval windows
    (the reference only skips batches; we fail fast and keep the last good
    params via the jitted skip-update guard)."""
    import jax.numpy as jnp

    monkeypatch.setattr(
        type(tiny_problem), "loss",
        lambda self, pred, batch, ops=None: jnp.float32(jnp.nan),
    )
    tc = TrainConfig(
        model="FCNN", epochs=50, num_train=8, num_val=4, eval_every=1,
        nan_limit=3, model_kwargs={"hidden_dims": (8,)}, data_parallel=False,
    )
    tr = Trainer(tiny_problem, tc)
    train_ds, _ = tr.make_datasets()
    with pytest.raises(FloatingPointError, match="non-finite"):
        tr.fit(train_ds, None, verbose=False)
