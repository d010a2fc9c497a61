"""Multi-host scaffold (SURVEY.md §2: 'DCN for multi-host later'): a real
2-process CPU dryrun — jax.distributed.initialize over a Gloo coordinator,
a global 8-device mesh spanning both processes, one fully-sharded train
step whose grad psum crosses the process boundary."""

import pytest


@pytest.mark.slow
def test_two_process_dryrun():
    from feonet_navier_stokes_tpu.parallel import dryrun_multihost

    lines = dryrun_multihost(2)
    # 2 processes x (DP + TP) layouts
    assert len(lines) == 4, lines
    for kind in ("DP", "TP"):
        kind_lines = [l for l in lines if f"{kind} train step" in l]
        assert len(kind_lines) == 2, lines
        # both processes computed the identical global loss
        losses = {line.split("loss=")[1] for line in kind_lines}
        assert len(losses) == 1, kind_lines
