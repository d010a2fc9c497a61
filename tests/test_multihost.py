"""Multi-host scaffold (SURVEY.md §2: 'DCN for multi-host later'): a real
2-process CPU dryrun — jax.distributed.initialize over a Gloo coordinator,
a global 8-device mesh spanning both processes, one fully-sharded train
step whose grad psum crosses the process boundary."""

import pytest


@pytest.mark.slow
def test_two_process_dryrun():
    from feonet_navier_stokes_tpu.parallel import dryrun_multihost

    lines = dryrun_multihost(2)
    assert len(lines) == 2
    # both processes computed the identical global loss
    losses = {line.split("loss=")[1] for line in lines}
    assert len(losses) == 1
