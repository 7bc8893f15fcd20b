"""Quadrature exactness — the analog of the reference's quadRules test
(core/FE/tests/quadRules.cpp:9-20: integrate const/linear/quadratic/cubic
functions and verify exactness)."""

import numpy as np
import pytest

from feddlib_tpu.fe.reference import (
    determine_degree, eval_grad_phi, eval_phi, quadrature)


def _exact_monomial_tri(px, py):
    # ∫_T x^px y^py over unit triangle = px! py! / (px+py+2)!
    from math import factorial

    return factorial(px) * factorial(py) / factorial(px + py + 2)


def _exact_monomial_tet(px, py, pz):
    from math import factorial

    return (factorial(px) * factorial(py) * factorial(pz)
            / factorial(px + py + pz + 3))


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 6, 7, 8])
def test_tri_exactness(deg):
    pts, wts = quadrature(2, deg)
    for px in range(deg + 1):
        for py in range(deg + 1 - px):
            val = np.sum(wts * pts[:, 0] ** px * pts[:, 1] ** py)
            assert np.isclose(val, _exact_monomial_tri(px, py), atol=1e-12), \
                (deg, px, py)


@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5, 6, 7])
def test_tet_exactness(deg):
    pts, wts = quadrature(3, deg)
    for px in range(deg + 1):
        for py in range(deg + 1 - px):
            for pz in range(deg + 1 - px - py):
                val = np.sum(wts * pts[:, 0] ** px * pts[:, 1] ** py
                             * pts[:, 2] ** pz)
                assert np.isclose(val, _exact_monomial_tet(px, py, pz),
                                  atol=1e-12), (deg, px, py, pz)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("fe", ["P1", "P2"])
def test_partition_of_unity(dim, fe):
    pts, _ = quadrature(dim, 4)
    phi = eval_phi(dim, fe, pts)
    np.testing.assert_allclose(phi.sum(axis=1), 1.0, atol=1e-13)
    dphi = eval_grad_phi(dim, fe, pts)
    np.testing.assert_allclose(dphi.sum(axis=1), 0.0, atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("fe", ["P1", "P2"])
def test_nodal_basis(dim, fe):
    """phi_a(node_b) = delta_ab at the element's node coordinates."""
    if dim == 2:
        verts = np.array([[0, 0], [1, 0], [0, 1]], dtype=float)
        mids = np.array([[0.5, 0], [0.5, 0.5], [0, 0.5]])
    else:
        verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                         dtype=float)
        mids = 0.5 * np.array([
            verts[0] + verts[1], verts[1] + verts[2], verts[0] + verts[2],
            verts[0] + verts[3], verts[1] + verts[3], verts[2] + verts[3]])
    nodes = verts if fe == "P1" else np.concatenate([verts, mids])
    phi = eval_phi(dim, fe, nodes)
    np.testing.assert_allclose(phi, np.eye(len(nodes)), atol=1e-13)


def test_gradient_consistency():
    """Finite-difference check of eval_grad_phi."""
    rng = np.random.default_rng(0)
    for dim in (2, 3):
        for fe in ("P1", "P2"):
            pts = rng.random((5, dim)) * 0.3
            g = eval_grad_phi(dim, fe, pts)
            eps = 1e-6
            for d in range(dim):
                dp = pts.copy()
                dp[:, d] += eps
                dm = pts.copy()
                dm[:, d] -= eps
                fd = (eval_phi(dim, fe, dp) - eval_phi(dim, fe, dm)) / (2 * eps)
                np.testing.assert_allclose(g[:, :, d], fd, atol=1e-8)


def test_determine_degree():
    assert determine_degree(2, "P1", "grad") == 1
    assert determine_degree(2, "P2", "grad") == 2
    assert determine_degree(2, "P2", "phi") == 4
    assert determine_degree(3, "P2", "conv") == 5
