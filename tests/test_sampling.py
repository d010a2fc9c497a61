"""Sampling layer: forcing distributions, GRF covariance, IC identities,
grid featurization/interpolation."""

import jax
import jax.numpy as jnp
import numpy as np

from feonet_navier_stokes_tpu.sampling import (
    sample_sincos_coeffs,
    sincos_on_grid,
    sincos_at_points,
    input_grid_points,
    grf_cholesky,
    rbf_kernel,
    sample_grf,
    GridInterpolator,
    sample_ic_coeffs,
    lower_ic_at_points,
    channel_ic_at_points,
    sample_stream_ic_modes,
    stream_ic_at_points,
)


def test_sincos_coeff_distribution():
    c = sample_sincos_coeffs(jax.random.PRNGKey(0), 4000)
    c = np.asarray(c)
    # m0, m1 ~ U(0,1); n ~ pi*U(0,1) (reference assemble_fenics.py:121-122)
    assert c.shape == (4000, 6)
    assert c[:, :2].min() >= 0 and c[:, :2].max() <= 1
    assert c[:, 2:].min() >= 0 and c[:, 2:].max() <= np.pi
    np.testing.assert_allclose(c[:, :2].mean(), 0.5, atol=0.03)
    np.testing.assert_allclose(c[:, 2:].mean(), np.pi / 2, atol=0.06)


def test_sincos_grid_matches_pointwise():
    c = sample_sincos_coeffs(jax.random.PRNGKey(1), 3)
    grid = sincos_on_grid(c, 8)  # (3, 8, 8, 2)
    assert grid.shape == (3, 8, 8, 2)
    g = np.linspace(-1, 1, 8)
    c_np = np.asarray(c)
    # axis 0 of the grid is x (cartesian_prod ordering)
    for i, j in [(0, 0), (3, 5), (7, 7)]:
        x, y = g[i], g[j]
        m0, m1, n0, n1, n2, n3 = c_np[1]
        np.testing.assert_allclose(
            np.asarray(grid[1, i, j]),
            [m0 * np.sin(n0 * x + n1 * y), m1 * np.cos(n2 * x + n3 * y)],
            rtol=1e-5,
        )


def test_sincos_validate_form():
    c = jnp.array([[0.3, 0.7, 1.0, 2.0, 0.5, 1.5]])
    xy = jnp.array([[0.2, -0.4]])
    f_train = sincos_at_points(c, xy)[0, 0]
    f_val = sincos_at_points(c, xy, validate_form=True)[0, 0]
    s = np.sin(1.0 * 0.2 + 2.0 * -0.4)
    cc = np.cos(0.5 * 0.2 + 1.5 * -0.4)
    np.testing.assert_allclose(np.asarray(f_train), [0.3 * s, 0.7 * cc], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(f_val), [0.3 + s, 0.7 + cc], rtol=1e-6)


def test_grf_cholesky_and_covariance():
    pts = np.random.default_rng(0).uniform(-1, 1, (40, 2))
    L = grf_cholesky(pts)
    K = rbf_kernel(jnp.asarray(pts, jnp.float64)) + 1e-8 * jnp.eye(40)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), atol=1e-10)
    ux, uy = sample_grf(jax.random.PRNGKey(2), L, 20000)
    emp = np.cov(np.asarray(ux), rowvar=False)
    np.testing.assert_allclose(emp, np.asarray(K), atol=0.06)
    # x/y fields independent
    cross = np.mean(np.asarray(ux[:, 0]) * np.asarray(uy[:, 0]))
    assert abs(cross) < 0.05


def test_grid_interpolator_linear_exact():
    rng = np.random.default_rng(3)
    pts = np.concatenate(
        [rng.uniform(-1, 1, (200, 2)),
         np.array([[-1, -1], [-1, 1], [1, -1], [1, 1]])], axis=0
    )
    interp = GridInterpolator.build(pts, resol=16)
    vals = jnp.asarray(2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5)
    out = interp(vals[None])  # (1, 16, 16)
    g = np.linspace(-1, 1, 16)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    expected = 2.0 * xx - 3.0 * yy + 0.5
    np.testing.assert_allclose(np.asarray(out[0]), expected, atol=1e-10)


def test_ic_coeff_distributions():
    c = np.asarray(sample_ic_coeffs(jax.random.PRNGKey(4), 2000, "lower"))
    assert c.shape == (2000, 4)
    # [m0, n0, m1, n1]: m ~ 2+U(0,1), n ~ 2 pi U(0,1)
    assert 2.0 <= c[:, 0].min() and c[:, 0].max() <= 3.0
    assert 2.0 <= c[:, 2].min() and c[:, 2].max() <= 3.0
    assert c[:, 1].max() <= 2 * np.pi and c[:, 3].max() <= 2 * np.pi
    c2 = np.asarray(sample_ic_coeffs(jax.random.PRNGKey(5), 100, "channel_flow"))
    assert c2.shape == (100, 2) and c2.min() >= 0 and c2.max() <= 1


def test_lower_and_channel_ic_values():
    xy = jnp.array([[0.3, 0.6]])
    c = jnp.array([[2.5, 1.2, 2.1, 3.0]])
    u = np.asarray(lower_ic_at_points(c, xy))[0, 0]
    np.testing.assert_allclose(
        u,
        [-5.0 + 2.5 * np.sin(1.2 * 0.3) * np.sin(0.6),
         2.1 * np.cos(3.0 * 0.3) * np.sin(0.6)],
        rtol=1e-6,
    )
    c2 = jnp.array([[0.4, 0.9]])
    u2 = np.asarray(channel_ic_at_points(c2, xy))[0, 0]
    np.testing.assert_allclose(
        u2,
        [0.1 * 0.4 * 0.4 * 0.6, 0.01 * 0.9 * np.sin(np.pi * 0.3) * 0.4 * 0.6],
        rtol=1e-6,
    )


def test_stream_ic_divergence_free_and_noslip():
    ks, ls, amps = sample_stream_ic_modes(jax.random.PRNGKey(6), 2)
    # evaluate on the host float64 path (the projection/ground-truth contract)
    ks, ls = np.asarray(ks), np.asarray(ls)
    amps = np.asarray(amps, dtype=np.float64)
    # no-slip: u = 0 on the boundary of [0,1]^2
    bdry = np.array([[0.0, 0.3], [1.0, 0.7], [0.5, 0.0], [0.2, 1.0]])
    u_b = np.asarray(stream_ic_at_points(ks, ls, amps, bdry))
    np.testing.assert_allclose(u_b, 0.0, atol=1e-10)
    # divergence-free: finite-difference div at interior points
    h = 1e-5
    px = np.array([[0.37 + h, 0.53], [0.37 - h, 0.53]])
    py = np.array([[0.37, 0.53 + h], [0.37, 0.53 - h]])
    ux = np.asarray(stream_ic_at_points(ks, ls, amps, px))[0]
    uy = np.asarray(stream_ic_at_points(ks, ls, amps, py))[0]
    div = (ux[0, 0] - ux[1, 0]) / (2 * h) + (uy[0, 1] - uy[1, 1]) / (2 * h)
    assert abs(div) < 1e-5


def test_grid_interpolator_cubic_matches_griddata():
    """method='cubic' must reproduce scipy griddata(method='cubic') — the
    reference's GRF featurization (FEONet-square-with-hole/
    create_data.py:92-93) — exactly, via the precomputed linear map."""
    from scipy.interpolate import griddata

    rng = np.random.default_rng(7)
    pts = np.concatenate(
        [rng.uniform(-1, 1, (150, 2)),
         np.array([[-1, -1], [-1, 1], [1, -1], [1, 1]])], axis=0
    )
    interp = GridInterpolator.build(pts, resol=12, method="cubic")
    vals = rng.standard_normal((3, pts.shape[0]))
    out = np.asarray(interp(jnp.asarray(vals)))
    g = np.linspace(-1, 1, 12)
    xx, yy = np.meshgrid(g, g, indexing="ij")
    for b in range(3):
        want = griddata(pts, vals[b], (xx, yy), method="cubic", fill_value=0.0)
        # CT gradient estimation is an iterative solve (tol 1e-6): the probed
        # linear map agrees to solver tolerance, not machine precision
        np.testing.assert_allclose(out[b], want, rtol=1e-5, atol=1e-6)
    # cubic reproduces linear functions exactly too
    lin = 2.0 * pts[:, 0] - 3.0 * pts[:, 1] + 0.5
    out_lin = np.asarray(interp(jnp.asarray(lin)[None]))[0]
    np.testing.assert_allclose(out_lin, 2.0 * xx - 3.0 * yy + 0.5, atol=1e-6)
