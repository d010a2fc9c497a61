"""Slim (params-only) checkpoint roundtrip — tools/slim_ckpt.py."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem
from feonet_navier_stokes_tpu.train import Trainer, TrainConfig

sys.path.insert(0, "/root/repo")
from tools.slim_ckpt import load_params_npz  # noqa: E402


def test_slim_ckpt_roundtrip(tmp_path):
    p = build_problem(ProblemConfig(name="stokes_square", bc="lower", nx=4))
    tc = TrainConfig(model="FCNN", num_train=4, num_val=2, epochs=3,
                     eval_every=3, loss_mode="residual",
                     truth_for_train=False)
    tr = Trainer(p, tc)
    ds, _ = tr.make_datasets()
    tr.fit(ds, None, verbose=False)
    ckpt = tr.save_checkpoint(str(tmp_path / "ckpt"))
    out = str(tmp_path / "slim.npz")
    r = subprocess.run([sys.executable, "tools/slim_ckpt.py", "export",
                        "--ckpt", ckpt, "--out", out],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr

    restored = load_params_npz(out)
    x = p.model_input(ds.batch, tc.model)
    y_live = tr.model.apply({"params": tr.state.params}, x, train=False)
    y_slim = tr.model.apply({"params": restored["params"]}, x, train=False)
    np.testing.assert_array_equal(np.asarray(y_live), np.asarray(y_slim))
    assert restored["step"] == 3
