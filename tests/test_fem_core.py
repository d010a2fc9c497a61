import jax.numpy as jnp
import numpy as np
import pytest

from feonet_navier_stokes_tpu.fem.basis import p1_basis, p2_basis
from feonet_navier_stokes_tpu.fem.quadrature import triangle_quadrature


@pytest.mark.parametrize("degree", [1, 2, 3, 4, 5, 7, 9])
def test_quadrature_exactness(degree):
    """Exact integration of x^a y^b, a+b <= degree, on the reference triangle.

    ∫ x^a y^b over the unit triangle = a! b! / (a+b+2)!"""
    import math

    pts, wts = triangle_quadrature(degree)
    for a in range(degree + 1):
        for b in range(degree + 1 - a):
            got = np.sum(wts * pts[:, 0] ** a * pts[:, 1] ** b)
            want = math.factorial(a) * math.factorial(b) / math.factorial(a + b + 2)
            np.testing.assert_allclose(got, want, rtol=1e-12, err_msg=f"x^{a} y^{b}")


def test_quadrature_area():
    _, wts = triangle_quadrature(4)
    np.testing.assert_allclose(wts.sum(), 0.5, rtol=1e-13)


def test_p2_partition_of_unity():
    pts, _ = triangle_quadrature(5)
    vals, grads = p2_basis(pts)
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-12)


def test_p1_partition_of_unity():
    pts, _ = triangle_quadrature(5)
    vals, grads = p1_basis(pts)
    np.testing.assert_allclose(vals.sum(axis=1), 1.0, atol=1e-13)
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-13)


def test_p2_kronecker_at_nodes():
    nodes = np.array(
        [[0, 0], [1, 0], [0, 1], [0.5, 0.5], [0, 0.5], [0.5, 0]], dtype=float
    )
    vals, _ = p2_basis(nodes)
    np.testing.assert_allclose(vals, np.eye(6), atol=1e-13)


def test_p2_gradient_finite_difference():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.05, 0.3, size=(10, 2))
    _, grads = p2_basis(pts)
    h = 1e-6
    for d in range(2):
        dp = pts.copy()
        dp[:, d] += h
        dm = pts.copy()
        dm[:, d] -= h
        fd = (p2_basis(dp)[0] - p2_basis(dm)[0]) / (2 * h)
        np.testing.assert_allclose(grads[:, :, d], fd, atol=1e-8)
