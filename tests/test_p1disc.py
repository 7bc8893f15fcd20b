"""Q2/P1-disc mixed pairing (the reference's hex Stokes element,
FE::assemblyDivAndDivT P1-disc branch, FE_def.hpp:1967-1969;
MeshStructured P1-disc variants)."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain


def test_p1disc_divergence_exactness():
    """For u = (x, y): div u = 2 ⇒ B u rows are (−2·vol_e, 0, 0) per
    element (modal basis; affine cells)."""
    dom = Domain.structured_hex(2, 4, fe_type="Q2")
    dim = 2
    B, BT = ops.assemble_divergence_p1disc(dom)
    u = dom.mesh.points[:, :dim].ravel()  # u=(x,y) NodeWise
    Bu = np.asarray(B.matvec(jnp.asarray(u)))
    E = dom.n_elements
    vol = (1.0 / 4) ** 2
    Bu = Bu.reshape(E, dim + 1)
    np.testing.assert_allclose(Bu[:, 0], -2.0 * vol, atol=1e-12)
    np.testing.assert_allclose(Bu[:, 1:], 0.0, atol=1e-12)
    # divergence-free field u = (y, x): B u = 0 exactly
    u2 = dom.mesh.points[:, [1, 0]].ravel()
    np.testing.assert_allclose(np.asarray(B.matvec(jnp.asarray(u2))), 0.0,
                               atol=1e-12)
    # BT is the exact transpose
    np.testing.assert_allclose(B.to_scipy().toarray(),
                               BT.to_scipy().toarray().T, atol=1e-14)


def test_p1disc_mass_spd_block_diagonal():
    dom = Domain.structured_hex(2, 3, fe_type="Q2")
    M = ops.assemble_mass_p1disc(dom).to_scipy()
    # block-diagonal: no coupling across elements
    coo = M.tocoo()
    assert (coo.row // 3 == coo.col // 3).all()
    w = np.linalg.eigvalsh(M.toarray())
    assert w.min() > 0


def test_stokes_q2_p1disc_cavity():
    """Lid-driven cavity with the Q2/P1-disc element: inf-sup stable
    (no stabilization needed), divergence-free in the P1-disc sense."""
    dom_u = Domain.structured_hex(2, 4, fe_type="Q2")
    dim = 2
    n_u = dom_u.n_dofs(dim)
    n_p = dom_u.n_elements * (dim + 1)
    A = ops.assemble_hex_laplace_vec(dom_u, 1.0)
    B, BT = ops.assemble_divergence_p1disc(dom_u)
    S = sps.bmat([[A.to_scipy(), BT.to_scipy()],
                  [B.to_scipy(), None]]).tolil()
    pts = dom_u.mesh.points
    bnd = dom_u.mesh.point_flags > 0
    mask = np.zeros(n_u + n_p, dtype=bool)
    mask[0:n_u:2] = bnd
    mask[1:n_u:2] = bnd
    mask[n_u] = True  # pin one pressure dof
    g = np.zeros(n_u + n_p)
    lid = bnd & np.isclose(pts[:, 1], 1.0)
    g[0:n_u:2] = np.where(lid, 1.0, 0.0)
    for i in np.nonzero(mask)[0]:
        S.rows[i] = [i]
        S.data[i] = [1.0]
    x = spla.spsolve(S.tocsr(), np.where(mask, g, 0.0))
    u, p = x[:n_u], x[n_u:]
    assert np.isfinite(x).all()
    assert np.abs(u).max() <= 1.0 + 1e-8  # max principle-ish
    # discrete divergence-free: B u = 0 on rows without pinned dof
    Bu = np.asarray(B.matvec(jnp.asarray(u)))
    free = np.ones(n_p, dtype=bool)
    free[0] = False
    assert np.abs(Bu[free]).max() < 1e-9
    # interior flow actually develops
    assert np.abs(u[~np.repeat(bnd, 2)]).max() > 0.05
