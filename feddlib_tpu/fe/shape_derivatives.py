"""Shape derivatives of the ALE Navier–Stokes residual via autodiff —
the geometry-implicit (GI) FSI coupling blocks.

The reference hand-derives and hand-assembles ∂(fluid residual)/∂(mesh
displacement) — DK1/DK2/DN/DW/DP/DM and the divergence shape derivative
(FE::assemblyFSI..., FE_def.hpp:3410-4246, ~800 lines of generated code).
Here the fluid element residual is written ONCE as a function of the
element's geometry dofs and differentiated exactly with jax.jacfwd:

    R_e(u_e, p_e, g_e) — momentum + continuity on the element with
        coords = ref_coords + g_e (vertex part moves the affine map) and
        ALE convection  ρ((u − (g_e − g_prev_e)/dt)·∇)u
    ∂R_e/∂g_e — [n_loc_res, nb_u·dim] per element, vmapped, scattered into
        the sparse (fluid-rows × geometry-cols) blocks.

This captures ALL geometry couplings — Jacobian/detB variation, transported
gradients, mesh-velocity — to machine precision, with sparsity identical to
the reference's element-local blocks."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import reference as ref
from feddlib_tpu.fe.assembly import small_det, small_inv, scatter_pattern
from feddlib_tpu.la.csr import CsrMatrix

f64 = jnp.float64


def _fluid_elem_residual(dim, fe_u, fe_p, mu, rho, dt, mass_coef):
    """Element residual factory.  Returns
    R(u_e [nb_u,dim], p_e [nb_p], g_e [nb_u,dim], gprev_e, ref_verts,
      u_old_e) → (R_u [nb_u,dim], R_p [nb_p])."""
    deg = max(ref.determine_degree(dim, fe_u, "conv"), 2)
    qp, qw = ref.quadrature(dim, deg)
    phi_u = jnp.asarray(ref.eval_phi(dim, fe_u, qp), f64)      # [nq, nb_u]
    dphi_u = jnp.asarray(ref.eval_grad_phi(dim, fe_u, qp), f64)
    phi_p = jnp.asarray(ref.eval_phi(dim, fe_p, qp), f64)
    qw = jnp.asarray(qw, f64)
    nv = dim + 1

    def residual(u_e, p_e, g_e, gprev_e, ref_verts, u_old_e):
        verts = ref_verts + g_e[:nv]          # moved vertex coords
        B = jnp.swapaxes(verts[1:] - verts[:1], 0, 1)
        detB = small_det(B)
        adet = jnp.abs(detB)
        Binv = small_inv(B, detB)
        gu = jnp.einsum("dk,qbd->qbk", Binv, dphi_u)  # phys grads [nq,nb,dim]
        w_e = (g_e - gprev_e) / dt                     # mesh velocity (nodes)
        u_q = jnp.einsum("qb,bi->qi", phi_u, u_e)
        w_q = jnp.einsum("qb,bi->qi", phi_u, w_e)
        uold_q = jnp.einsum("qb,bi->qi", phi_u, u_old_e)
        grad_u = jnp.einsum("bi,qbk->qik", u_e, gu)    # [nq, i, k] = ∂k u_i
        p_q = jnp.einsum("qb,b->q", phi_p, p_e)
        div_u = jnp.trace(grad_u, axis1=1, axis2=2)

        conv = jnp.einsum("qk,qik->qi", u_q - w_q, grad_u) * rho
        # ALE additional convection −ρ(∇·w) u·φ (the reference's P block,
        # FE::assemblyAdditionalConvection FE_def.hpp:3044, scaled −density
        # in FSI_def.hpp:500-504)
        div_w = jnp.einsum("bi,qbi->q", w_e, gu)
        # momentum: μ ∇u:∇φ + ρ((u−w)·∇u)·φ − ρ(∇·w)u·φ − p div φ
        #           + mass_coef ρ(u−uold)·φ
        Ru = (mu * jnp.einsum("q,qik,qak->ai", qw, grad_u, gu)
              + jnp.einsum("q,qi,qa->ai", qw, conv, phi_u)
              - rho * jnp.einsum("q,q,qi,qa->ai", qw, div_w, u_q, phi_u)
              - jnp.einsum("q,q,qai->ai", qw, p_q, gu)
              + mass_coef * rho * jnp.einsum("q,qi,qa->ai", qw,
                                             u_q - uold_q, phi_u))
        Rp = -jnp.einsum("q,q,qa->a", qw, div_u, phi_p)
        return Ru * adet, Rp * adet

    return residual


@partial(jax.jit, static_argnames=("dim", "fe_u", "fe_p", "mu", "rho", "dt",
                                   "mass_coef"))
def elem_shape_derivative(u_elem, p_elem, g_elem, gprev_elem, ref_verts,
                          uold_elem, dim, fe_u, fe_p, mu, rho, dt,
                          mass_coef):
    """Batched ∂(R_u, R_p)/∂g_e.  Returns (Du [E, nb_u·dim, nb_u·dim],
    Dp [E, nb_p, nb_u·dim]) — fluid-row × geometry-col element blocks."""
    res = _fluid_elem_residual(dim, fe_u, fe_p, mu, rho, dt, mass_coef)

    def per_elem(u_e, p_e, g_e, gp_e, rv, uo_e):
        def f(gflat):
            Ru, Rp = res(u_e, p_e, gflat.reshape(g_e.shape), gp_e, rv, uo_e)
            return jnp.concatenate([Ru.reshape(-1), Rp])

        J = jax.jacfwd(f)(g_e.reshape(-1))
        nbu = u_e.shape[0] * u_e.shape[1]
        return J[:nbu], J[nbu:]

    return jax.vmap(per_elem)(u_elem, p_elem, g_elem, gprev_elem, ref_verts,
                              uold_elem)


def assemble_shape_derivative_blocks(dom_u, dom_p, u, p, g, g_prev, u_old,
                                     mu, rho, dt, mass_coef=0.0
                                     ) -> Tuple[CsrMatrix, CsrMatrix]:
    """Assemble the sparse GI blocks D_ug = ∂F_u/∂g and D_pg = ∂F_p/∂g.
    Vectors u, g, g_prev, u_old are NodeWise fields on dom_u; p on dom_p.
    ref_verts are the REFERENCE (undeformed) fluid coordinates; the current
    geometry enters through g."""
    dim = dom_u.dim
    nb_u = dom_u.n_basis()
    conn_u = dom_u.elem_nodes()
    conn_p = dom_p.elem_nodes()
    nv = dim + 1
    ref_pts = dom_u.mesh.ref_points if dom_u.mesh.ref_points is not None \
        else dom_u.mesh.points
    ref_verts = jnp.asarray(ref_pts[dom_u.mesh.elements[:, :nv]], f64)

    def field(vec):
        return jnp.asarray(vec).reshape(dom_u.n_nodes, dim)[conn_u]

    u_e, g_e, gp_e, uo_e = field(u), field(g), field(g_prev), field(u_old)
    p_e = jnp.asarray(p)[conn_p]

    CHUNK = 16384
    E = conn_u.shape[0]
    Du_l, Dp_l = [], []
    for s in range(0, E, CHUNK):
        Du, Dp = elem_shape_derivative(
            u_e[s:s + CHUNK], p_e[s:s + CHUNK], g_e[s:s + CHUNK],
            gp_e[s:s + CHUNK], ref_verts[s:s + CHUNK], uo_e[s:s + CHUNK],
            dim, dom_u.fe_type, dom_p.fe_type, float(mu), float(rho),
            float(dt), float(mass_coef))
        Du_l.append(Du.reshape(-1))
        Dp_l.append(Dp.reshape(-1))

    udofs = dom_u.elem_dofs(dim)
    pdofs = conn_p
    n_u, n_p = dom_u.n_dofs(dim), dom_p.n_dofs(1)
    pat_u = dom_u.pattern(("shape_u", dim), lambda: scatter_pattern(
        udofs, udofs, n_u, n_u))
    pat_p = dom_p.pattern(("shape_p", id(dom_u)), lambda: scatter_pattern(
        pdofs, udofs, n_p, n_u))
    Dug = CsrMatrix(pat_u)
    Dug.assemble(jnp.concatenate(Du_l) if len(Du_l) > 1 else Du_l[0])
    Dpg = CsrMatrix(pat_p)
    Dpg.assemble(jnp.concatenate(Dp_l) if len(Dp_l) > 1 else Dp_l[0])
    return Dug, Dpg
