"""On-device load assembly vs the host f64 contract (fem/device_assemble.py).

The device path (jit/vmap einsum + segment_sum, training dtype) must agree
with the host float64 assemblers to f32 rounding — the host path IS the
create_data.py-parity ground truth, so any divergence is a device-path bug.
"""

import jax
import jax.numpy as jnp
import numpy as np

from feonet_navier_stokes_tpu.geometry import (build_taylor_hood,
                                               structured_rectangle)
from feonet_navier_stokes_tpu.fem import (apply_bc_vector,
                                          assemble_load_from_velocity_values,
                                          assemble_load_sincos, make_bc)
from feonet_navier_stokes_tpu.fem.bcs import square_bcs
from feonet_navier_stokes_tpu.fem.device_assemble import (
    make_device_load_grf, make_device_load_sincos)
from feonet_navier_stokes_tpu.sampling.forcing import sample_sincos_coeffs


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a, np.float64) - b)
                 / np.linalg.norm(b))


def test_device_sincos_matches_host(space_6x6):
    sp = space_6x6
    bc = make_bc(sp, square_bcs("channel_flow"))
    coeffs = np.asarray(sample_sincos_coeffs(jax.random.PRNGKey(0), 16))
    host = apply_bc_vector(assemble_load_sincos(sp, coeffs), bc.mask,
                           bc.values)
    fn = jax.jit(make_device_load_sincos(sp, bc.mask, bc.values))
    dev = fn(jnp.asarray(coeffs, jnp.float32))
    assert _rel(dev, host) < 1e-5


def test_device_sincos_validate_form(space_4x4):
    sp = space_4x4
    coeffs = np.asarray(sample_sincos_coeffs(jax.random.PRNGKey(1), 8))
    host = assemble_load_sincos(sp, coeffs, validate_form=True)
    fn = make_device_load_sincos(sp, validate_form=True)
    dev = fn(jnp.asarray(coeffs, jnp.float32))
    assert _rel(dev, host) < 1e-5


def test_device_grf_matches_host(space_6x6):
    sp = space_6x6
    bc = make_bc(sp, square_bcs("lower"))
    rng = np.random.default_rng(2)
    u1 = rng.standard_normal((8, sp.n2)).astype(np.float32)
    u2 = rng.standard_normal((8, sp.n2)).astype(np.float32)
    host = apply_bc_vector(
        assemble_load_from_velocity_values(sp, u1, u2), bc.mask, bc.values)
    fn = jax.jit(make_device_load_grf(sp, bc.mask, bc.values))
    dev = fn(jnp.asarray(u1), jnp.asarray(u2))
    assert _rel(dev, host) < 1e-5


def test_device_assembly_throughput_smoke():
    """The device path must at least run under jit on a larger mesh (the
    real throughput number is bench.py's assembly_mdof_per_s_device)."""
    sp = build_taylor_hood(structured_rectangle(15, 15))
    fn = jax.jit(make_device_load_sincos(sp))
    coeffs = np.asarray(sample_sincos_coeffs(jax.random.PRNGKey(3), 64))
    out = fn(jnp.asarray(coeffs, jnp.float32))
    out.block_until_ready()
    assert out.shape == (64, sp.ng)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_problem_device_loads_flag():
    """ProblemConfig.device_loads: sample_batch's training loads match the
    host f64 path to f32 rounding, for plain, equilibrated and BPX
    problems (ground truth is unaffected — load64 stays host f64)."""
    from feonet_navier_stokes_tpu.problems import ProblemConfig, build_problem

    for name, kw in (("stokes_square", {}),
                     ("stokes_square", {"equilibrate": True}),
                     ("steady_ns", {"bpx_levels": 2})):
        p_host = build_problem(ProblemConfig(name=name, bc="lower", nx=4, **kw))
        p_dev = build_problem(ProblemConfig(name=name, bc="lower", nx=4,
                                            device_loads=True, **kw))
        b_h = p_host.sample_batch(jax.random.PRNGKey(3), 6)
        b_d = p_dev.sample_batch(jax.random.PRNGKey(3), 6)
        assert _rel(b_d["load"], np.asarray(b_h["load"], np.float64)) < 1e-5, \
            (name, kw)
