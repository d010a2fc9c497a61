"""Test configuration: 8 virtual CPU devices + float64 for numerical parity.

Tests run on a virtual multi-device CPU mesh (real TPU hardware is single-chip
in CI); bench.py targets the real TPU.
"""

import os

# NOTE: under the axon TPU terminal the JAX_PLATFORMS env var is ignored
# (the plugin re-registers the TPU); jax.config / JAX_PLATFORM_NAME do work.
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from feonet_navier_stokes_tpu.geometry import structured_rectangle, build_taylor_hood


@pytest.fixture(scope="session")
def space_6x6():
    return build_taylor_hood(structured_rectangle(6, 6))


@pytest.fixture(scope="session")
def space_4x4():
    return build_taylor_hood(structured_rectangle(4, 4))
