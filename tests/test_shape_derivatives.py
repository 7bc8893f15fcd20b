"""GI shape-derivative blocks via autodiff (replaces the reference's
hand-derived DK1/DK2/DN/DW/DP/DM assembly, FE_def.hpp:3410-4246)."""

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.fe.shape_derivatives import (
    _fluid_elem_residual, assemble_shape_derivative_blocks)


def test_shape_derivative_matches_finite_differences():
    dom_p = Domain.structured(2, 3)
    dom_u = dom_p.p2_domain()
    dom_u.mesh.save_reference_configuration()
    rng = np.random.default_rng(0)
    n_u, n_p = dom_u.n_dofs(2), dom_p.n_nodes
    u = rng.standard_normal(n_u) * 0.1
    p = rng.standard_normal(n_p) * 0.1
    g = rng.standard_normal(n_u) * 0.01
    gp = rng.standard_normal(n_u) * 0.01
    uo = rng.standard_normal(n_u) * 0.1
    mu, rho, dt, mc = 0.7, 1.3, 0.05, 20.0

    Dug, Dpg = assemble_shape_derivative_blocks(
        dom_u, dom_p, u, p, g, gp, uo, mu, rho, dt, mc)

    res_fn = _fluid_elem_residual(2, "P2", "P1", mu, rho, dt, mc)
    conn_u, conn_p = dom_u.elem_nodes(), dom_p.elem_nodes()
    refv = jnp.asarray(dom_u.mesh.ref_points[dom_u.mesh.elements[:, :3]])

    def global_residual(gvec):
        ge = gvec.reshape(-1, 2)[conn_u]
        ue = jnp.asarray(u.reshape(-1, 2)[conn_u])
        gpe = jnp.asarray(gp.reshape(-1, 2)[conn_u])
        uoe = jnp.asarray(uo.reshape(-1, 2)[conn_u])
        pe = jnp.asarray(p[conn_p])
        Ru, Rp = jax.vmap(res_fn)(ue, pe, jnp.asarray(ge), gpe, refv, uoe)
        Fu = asm.assemble_vector(dom_u.elem_dofs(2),
                                 Ru.reshape(Ru.shape[0], -1), n_u)
        Fp = asm.assemble_vector(conn_p, Rp, n_p)
        return np.asarray(Fu), np.asarray(Fp)

    dg = rng.standard_normal(n_u)
    eps = 1e-6
    Fu1, Fp1 = global_residual(jnp.asarray(g + eps * dg))
    Fu0, Fp0 = global_residual(jnp.asarray(g - eps * dg))
    fd_u = (Fu1 - Fu0) / (2 * eps)
    fd_p = (Fp1 - Fp0) / (2 * eps)
    ad_u = np.asarray(Dug.matvec(jnp.asarray(dg)))
    ad_p = np.asarray(Dpg.matvec(jnp.asarray(dg)))
    assert np.abs(fd_u - ad_u).max() / np.abs(fd_u).max() < 1e-7
    assert np.abs(fd_p - ad_p).max() / np.abs(fd_p).max() < 1e-7
