"""Golden-operator fixtures: an INDEPENDENT naive assembler (VERDICT item 6).

The production assembler is a vectorized einsum over Gauss quadrature
tabulations (fem/assemble.py). This file re-derives every operator with a
completely different method — exact polynomial integration in barycentric
coordinates via the factorial formula

    ∫_T λ1^a λ2^b λ3^c dx = 2|T| · a! b! c! / (a+b+c+2)!

with per-element Python loops and symbolic-ish monomial bookkeeping. The two
pipelines share no code or quadrature rule, so entry-wise agreement at 1e-12
is a real independence check (the role FEniCS golden files play in SURVEY §4;
FEniCS itself is pinned through the committed preconditioner artifacts in
tests/test_fenics_import.py).
"""

import math

import numpy as np
import pytest

from feonet_navier_stokes_tpu.geometry import structured_rectangle, build_taylor_hood
from feonet_navier_stokes_tpu.fem import (
    assemble_scalar_block,
    assemble_stokes,
    assemble_velocity_mass,
    assemble_convection,
)

# ---------------------------------------------------------------------------
# exact integration of barycentric monomials
# ---------------------------------------------------------------------------


def tri_integral(powers: tuple[int, int, int], area: float) -> float:
    a, b, c = powers
    return (
        2.0 * area * math.factorial(a) * math.factorial(b) * math.factorial(c)
        / math.factorial(a + b + c + 2)
    )


class Poly:
    """Polynomial in (λ1, λ2, λ3): dict {(a,b,c): coeff}."""

    def __init__(self, terms=None):
        self.terms = dict(terms or {})

    def __mul__(self, other):
        out = {}
        for p1, c1 in self.terms.items():
            for p2, c2 in other.terms.items():
                k = (p1[0] + p2[0], p1[1] + p2[1], p1[2] + p2[2])
                out[k] = out.get(k, 0.0) + c1 * c2
        return Poly(out)

    def scale(self, s):
        return Poly({k: s * v for k, v in self.terms.items()})

    def __add__(self, other):
        out = dict(self.terms)
        for k, v in other.terms.items():
            out[k] = out.get(k, 0.0) + v
        return Poly(out)

    def integrate(self, area):
        return sum(c * tri_integral(p, area) for p, c in self.terms.items())


def lam(i):  # λ_i as a Poly
    p = [0, 0, 0]
    p[i] = 1
    return Poly({tuple(p): 1.0})


def p2_polys():
    """P2 basis as barycentric polynomials in OUR local order
    (v0, v1, v2, m12, m02, m01 — geometry/taylor_hood.py cell dof layout)."""
    l0, l1, l2 = lam(0), lam(1), lam(2)
    vert = [li * li.scale(2.0) + li.scale(-1.0) for li in (l0, l1, l2)]
    edge = [
        (l1 * l2).scale(4.0),  # m12
        (l0 * l2).scale(4.0),  # m02
        (l0 * l1).scale(4.0),  # m01
    ]
    return vert + edge


def p2_grad_polys(grad_lam):
    """∇φ for P2: list of (Poly_x, Poly_y) with grad_lam (3, 2) constant."""
    out = []
    for i in range(3):  # vertices: (4 λ_i - 1) ∇λ_i
        fac = lam(i).scale(4.0) + Poly({(0, 0, 0): -1.0})
        out.append((fac.scale(grad_lam[i, 0]), fac.scale(grad_lam[i, 1])))
    for (i, j) in ((1, 2), (0, 2), (0, 1)):  # edges: 4(λ_i ∇λ_j + λ_j ∇λ_i)
        gx = lam(i).scale(4.0 * grad_lam[j, 0]) + lam(j).scale(4.0 * grad_lam[i, 0])
        gy = lam(i).scale(4.0 * grad_lam[j, 1]) + lam(j).scale(4.0 * grad_lam[i, 1])
        out.append((gx, gy))
    return out


def naive_blocks(space):
    """Per-element Python-loop assembly of every scalar block."""
    n2, n1 = space.n2, space.n1
    K = np.zeros((n2, n2))
    M = np.zeros((n2, n2))
    D1 = np.zeros((n2, n1))
    D2 = np.zeros((n2, n1))
    C1 = np.zeros((n2, n2))
    C2 = np.zeros((n2, n2))
    verts = space.mesh.cell_vertices()
    for c in range(space.mesh.num_cells):
        v = verts[c]
        # ∇λ from the affine map: λ_i(x) linear, λ_i(v_j) = δ_ij
        T = np.array([[v[1, 0] - v[0, 0], v[2, 0] - v[0, 0]],
                      [v[1, 1] - v[0, 1], v[2, 1] - v[0, 1]]])
        det = np.linalg.det(T)
        area = abs(det) / 2.0
        Tinv = np.linalg.inv(T)
        # λ1,λ2 are the reference coords; ∇(ξ,η) rows of T^{-1}
        grad_lam = np.zeros((3, 2))
        grad_lam[1] = Tinv[0]
        grad_lam[2] = Tinv[1]
        grad_lam[0] = -grad_lam[1] - grad_lam[2]

        phi = p2_polys()
        gphi = p2_grad_polys(grad_lam)
        lam_p1 = [lam(0), lam(1), lam(2)]
        d2 = space.cell_dofs_p2[c]
        d1 = space.cell_dofs_p1[c]
        for a in range(6):
            for b in range(6):
                K[d2[a], d2[b]] += (
                    gphi[a][0] * gphi[b][0] + gphi[a][1] * gphi[b][1]
                ).integrate(area)
                M[d2[a], d2[b]] += (phi[a] * phi[b]).integrate(area)
                C1[d2[a], d2[b]] += (phi[a] * gphi[b][0]).integrate(area)
                C2[d2[a], d2[b]] += (phi[a] * gphi[b][1]).integrate(area)
            for k in range(3):
                D1[d2[a], d1[k]] += (gphi[a][0] * lam_p1[k]).integrate(area)
                D2[d2[a], d1[k]] += (gphi[a][1] * lam_p1[k]).integrate(area)
    return K, M, D1, D2, C1, C2


@pytest.fixture(scope="module")
def golden(space_4x4):
    return naive_blocks(space_4x4)


def test_scalar_blocks_match_exact_integration(space_4x4, golden):
    K, M, D1, D2, C1, C2 = golden
    pairs = [
        ("stiffness", K), ("mass", M), ("div_x", D1), ("div_y", D2),
        ("conv_x", C1), ("conv_y", C2),
    ]
    for kind, want in pairs:
        got = np.asarray(assemble_scalar_block(space_4x4, kind))
        np.testing.assert_allclose(got, want, atol=1e-13, err_msg=kind)


def test_sym_gradient_blocks_match_exact_integration(space_4x4):
    """kxx/kyy/kyx (the hole problem's symmetric-gradient viscous form)."""
    verts = space_4x4.mesh.cell_vertices()
    n2 = space_4x4.n2
    want = {k: np.zeros((n2, n2)) for k in ("kxx", "kyy", "kyx")}
    for c in range(space_4x4.mesh.num_cells):
        v = verts[c]
        T = np.array([[v[1, 0] - v[0, 0], v[2, 0] - v[0, 0]],
                      [v[1, 1] - v[0, 1], v[2, 1] - v[0, 1]]])
        area = abs(np.linalg.det(T)) / 2.0
        Tinv = np.linalg.inv(T)
        grad_lam = np.zeros((3, 2))
        grad_lam[1] = Tinv[0]
        grad_lam[2] = Tinv[1]
        grad_lam[0] = -grad_lam[1] - grad_lam[2]
        gphi = p2_grad_polys(grad_lam)
        d2 = space_4x4.cell_dofs_p2[c]
        for a in range(6):
            for b in range(6):
                want["kxx"][d2[a], d2[b]] += (gphi[a][0] * gphi[b][0]).integrate(area)
                want["kyy"][d2[a], d2[b]] += (gphi[a][1] * gphi[b][1]).integrate(area)
                want["kyx"][d2[a], d2[b]] += (gphi[a][1] * gphi[b][0]).integrate(area)
    for kind, w in want.items():
        np.testing.assert_allclose(
            np.asarray(assemble_scalar_block(space_4x4, kind)), w,
            atol=1e-13, err_msg=kind,
        )


def test_mixed_operators_match_exact_integration(space_4x4, golden):
    K, M, D1, D2, C1, C2 = golden
    n2, n1, ng = space_4x4.n2, space_4x4.n1, space_4x4.ng
    mu = 0.1
    want = np.zeros((ng, ng))
    want[:n2, :n2] = mu * K
    want[n2:2*n2, n2:2*n2] = mu * K
    want[:n2, 2*n2:] = -D1
    want[n2:2*n2, 2*n2:] = -D2
    want[2*n2:, :n2] = -D1.T
    want[2*n2:, n2:2*n2] = -D2.T
    np.testing.assert_allclose(
        np.asarray(assemble_stokes(space_4x4, mu)), want, atol=1e-13
    )
    wantS = np.zeros((ng, ng))
    wantS[:n2, :n2] = M
    wantS[n2:2*n2, n2:2*n2] = M
    np.testing.assert_allclose(
        np.asarray(assemble_velocity_mass(space_4x4)), wantS, atol=1e-13
    )
    B1, B2 = assemble_convection(space_4x4)
    wantB1 = np.zeros((ng, ng))
    wantB1[:n2, :n2] = C1
    wantB1[n2:2*n2, n2:2*n2] = C1
    np.testing.assert_allclose(np.asarray(B1), wantB1, atol=1e-13)
