"""Batched finite-element assembly — the TPU-native FE factory.

Replaces the reference's element-loop assembly engine (core/FE/FE_decl.hpp:41,
FE_def.hpp: assemblyLaplace :604, assemblyMass :454, advection :1685/:1839,
divergence :1932, BD stabilization :2151, linear elasticity :2739, surface
integrals :4511, RHS :4694).  The reference iterates elements serially:
buildTransformation → Binv → transformed gradients → quadrature → scatter by
global row.  Here every step is batched over ALL elements at once:

- element geometry (B, Binv, detB) via vectorised linear algebra
  (the reference caches exactly this per element: Elements::initializeFEData,
  core/FE/Elements.cpp:289-335);
- element matrices via einsum over [elements, quad-points, basis, dims] —
  XLA maps these to MXU batched matmuls;
- global scatter via the deterministic COO→CSR segment-sum plan
  (feddlib_tpu.la.csr.SparsityPattern).

All functions are jit-compiled with basis/quadrature tables baked in as
constants (quadrature loops unroll at trace time; shapes static).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import reference as ref
from feddlib_tpu.la.csr import CsrMatrix, SparsityPattern

f64 = jnp.float64


# ---------------------------------------------------------------------------
# element geometry
# ---------------------------------------------------------------------------

def small_det(B: jnp.ndarray) -> jnp.ndarray:
    """Batched det of [..., d, d] for d ∈ {2, 3} in closed form (TPU f64 has
    no LU path; cofactors are faster anyway — reference
    SmallMatrix::computeDet, core/General/SmallMatrix.hpp)."""
    d = B.shape[-1]
    if d == 2:
        return B[..., 0, 0] * B[..., 1, 1] - B[..., 0, 1] * B[..., 1, 0]
    if d == 3:
        return (
            B[..., 0, 0] * (B[..., 1, 1] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 1])
            - B[..., 0, 1] * (B[..., 1, 0] * B[..., 2, 2] - B[..., 1, 2] * B[..., 2, 0])
            + B[..., 0, 2] * (B[..., 1, 0] * B[..., 2, 1] - B[..., 1, 1] * B[..., 2, 0])
        )
    raise ValueError(f"small_det supports d in (2,3), got {d}")


def small_inv(B: jnp.ndarray, det: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched cofactor inverse of [..., d, d], d ∈ {2, 3} (reference
    SmallMatrix::computeInverse, core/General/SmallMatrix.hpp:228)."""
    d = B.shape[-1]
    if det is None:
        det = small_det(B)
    inv_det = 1.0 / det
    if d == 2:
        a, b = B[..., 0, 0], B[..., 0, 1]
        c, e = B[..., 1, 0], B[..., 1, 1]
        rows = jnp.stack([
            jnp.stack([e, -b], -1),
            jnp.stack([-c, a], -1),
        ], -2)
        return rows * inv_det[..., None, None]
    if d == 3:
        m = B
        c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
        c01 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
        c02 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
        c10 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
        c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
        c12 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
        c20 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
        c21 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
        c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
        rows = jnp.stack([
            jnp.stack([c00, c01, c02], -1),
            jnp.stack([c10, c11, c12], -1),
            jnp.stack([c20, c21, c22], -1),
        ], -2)
        return rows * inv_det[..., None, None]
    raise ValueError(f"small_inv supports d in (2,3), got {d}")


@partial(jax.jit, static_argnames=("dim",))
def element_transforms(vert_coords: jnp.ndarray, dim: int):
    """Affine maps for all elements.  vert_coords [E, dim+1, dim] (vertex
    coordinates) → (Binv [E, dim, dim], absdetB [E]).

    x = B ξ + p0 with B columns p_i − p0; ∇x φ = B^{-T} ∇ξ φ.
    Reference: FE::buildTransformation (FE_def.hpp:5342) + applyBTinv (:83).
    """
    p0 = vert_coords[:, :1, :]
    B = jnp.swapaxes(vert_coords[:, 1:, :] - p0, 1, 2)  # [E, dim, dim]
    detB = small_det(B)
    Binv = small_inv(B, detB)
    return Binv, jnp.abs(detB)


def _phys_grads(Binv, dphi_ref):
    # [E,dim,dim] x [nq,nb,dim] -> [E,nq,nb,dim];  (Binv^T g)_k = g_d Binv[d,k]
    return jnp.einsum("edk,qbd->eqbk", Binv, dphi_ref)


# ---------------------------------------------------------------------------
# element kernel library (each returns element matrices [E, nb_r, nb_c] or
# vectors [E, nb])
# ---------------------------------------------------------------------------


def _tables(dim, fe_type, degree):
    qp, qw = ref.quadrature(dim, degree)
    phi = ref.eval_phi(dim, fe_type, qp)
    dphi = ref.eval_grad_phi(dim, fe_type, qp)
    return (jnp.asarray(qp, f64), jnp.asarray(qw, f64),
            jnp.asarray(phi, f64), jnp.asarray(dphi, f64))


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_laplace(vert_coords, dim, fe_type):
    """Scalar stiffness ∫ ∇φa·∇φb (reference FE::assemblyLaplace,
    FE_def.hpp:604)."""
    _, qw, _, dphi = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "grad"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)  # [E,nq,nb,dim]
    K = jnp.einsum("q,eqak,eqbk->eab", qw, g, g)
    return K * adet[:, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_mass(vert_coords, dim, fe_type):
    """Scalar mass ∫ φa φb (reference FE::assemblyMass, FE_def.hpp:454)."""
    _, qw, phi, _ = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "phi"))
    _, adet = element_transforms(vert_coords, dim)
    M = jnp.einsum("q,qa,qb->ab", qw, phi, phi)
    return M[None] * adet[:, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_advection(vert_coords, u_elem, dim, fe_type):
    """Convection N(u): ∫ (u·∇φb) φa with u the FE field on the same space
    (reference FE::assemblyAdvectionVecField, FE_def.hpp:1685).
    u_elem [E, nb, dim] nodal velocity values per element."""
    _, qw, phi, dphi = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "conv"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)  # [E,nq,nb,dim]
    u_q = jnp.einsum("qb,ebd->eqd", phi, u_elem)  # u at quad points
    N = jnp.einsum("q,eqd,eqbd,qa->eab", qw, u_q, g, phi)
    return N * adet[:, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_ale_divergence(vert_coords, w_elem, dim, fe_type):
    """ALE additional convection ∫ (∇·w) φa φb with w the discrete mesh
    velocity on the same space (reference FE::assemblyAdditionalConvection,
    FE_def.hpp:3044 — the scalar value is expanded to the identity over
    velocity components, and the caller scales by −density as FSI does,
    FSI_def.hpp:500,661,712).  w_elem [E, nb, dim] nodal mesh-velocity
    values; returns [E, nb, nb]."""
    _, qw, phi, dphi = _tables(dim, fe_type,
                               ref.determine_degree(dim, fe_type, "conv"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)  # [E,nq,nb,dim]
    div_w = jnp.einsum("ebd,eqbd->eq", w_elem, g)  # Σ_b w_b·∇φb (trace)
    D = jnp.einsum("q,eq,qa,qb->eab", qw, div_w, phi, phi)
    return D * adet[:, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_advection_in_u(vert_coords, u_elem, dim, fe_type):
    """Newton linearisation W(u): ∫ (φb ∂u/∂x) φa — the (∇u)·δu term, a
    dim×dim block per (a,b) (reference FE::assemblyAdvectionInUVecField,
    FE_def.hpp:1839).  Returns [E, nb, nb, dim, dim] with W[a,b,i,j] =
    ∫ φa φb ∂u_i/∂x_j."""
    _, qw, phi, dphi = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "conv"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)
    grad_u = jnp.einsum("ebi,eqbj->eqij", u_elem, g)  # [E,nq,dim,dim]
    W = jnp.einsum("q,qa,qb,eqij->eabij", qw, phi, phi, grad_u)
    return W * adet[:, None, None, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_stress_sym(vert_coords, dim, fe_type, viscosity=1.0):
    """Symmetric-gradient (stress) form 2μ ∫ ε(u):ε(v) as a vector-valued
    element matrix [E, nb, nb, dim, dim] where entry (a,b,i,j) couples test
    component i with trial component j (reference FE::assemblyStress,
    FE_def.hpp:2407):  ∫ μ (∂_j φa? ...) — computed from
    ε(u):ε(v) = 1/4 Σ_ij (∂i u_j + ∂j u_i)(∂i v_j + ∂j v_i)."""
    _, qw, _, dphi = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "grad"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)  # [E,nq,nb,dim]
    # For u = φb e_j, v = φa e_i:
    # 2 ε(u):ε(v) = ∂i φb ∂j φa + δij ∇φa·∇φb
    gg = jnp.einsum("q,eqak,eqbk->eab", qw, g, g)  # ∇φa·∇φb summed w/ weights
    cross = jnp.einsum("q,eqaj,eqbi->eabij", qw, g, g)  # ∂j φa ∂i φb
    eye = jnp.eye(dim, dtype=f64)
    S = viscosity * (cross + jnp.einsum("eab,ij->eabij", gg, eye))
    return S * adet[:, None, None, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_laplace_vec(vert_coords, dim, fe_type, viscosity=1.0):
    """Vector Laplace μ ∫ ∇u:∇v → diagonal dim-blocks of the scalar
    stiffness (reference FE::assemblyLaplaceVecField, FE_def.hpp:670)."""
    K = elem_laplace(vert_coords, dim, fe_type) * viscosity
    eye = jnp.eye(dim, dtype=f64)
    return jnp.einsum("eab,ij->eabij", K, eye)


@partial(jax.jit, static_argnames=("dim", "fe_u", "fe_p"))
def elem_divergence(vert_coords, dim, fe_u, fe_p):
    """Mixed divergence blocks: B[a,(b,j)] = −∫ ψa ∂_j φb  (pressure test ψ,
    velocity trial φ; reference FE::assemblyDivAndDivT, FE_def.hpp:1932).
    Returns [E, nb_p, nb_u, dim]."""
    deg = max(ref.determine_degree(dim, fe_u, "grad"),
              ref.determine_degree(dim, fe_p, "phi"))
    qp, qw = ref.quadrature(dim, deg)
    psi = jnp.asarray(ref.eval_phi(dim, fe_p, qp), f64)
    dphi = jnp.asarray(ref.eval_grad_phi(dim, fe_u, qp), f64)
    qw = jnp.asarray(qw, f64)
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)  # [E,nq,nb_u,dim]
    B = -jnp.einsum("q,qa,eqbj->eabj", qw, psi, g)
    return B * adet[:, None, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_bd_stabilization(vert_coords, dim, fe_type):
    """Bochev–Dohrmann P1–P1 pressure stabilization: C = −(1/μ?) ∫ (ψa − Π ψa)
    (ψb − Π ψb) with Π the element-mean projector (reference
    FE::assemblyBDStabilization, FE_def.hpp:2151).  Returns [E, nb, nb]."""
    _, qw, phi, _ = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "phi"))
    _, adet = element_transforms(vert_coords, dim)
    vol_ref = jnp.sum(qw)
    mean = jnp.einsum("q,qa->a", qw, phi) / vol_ref  # element mean of basis
    M = jnp.einsum("q,qa,qb->ab", qw, phi, phi)
    C = M - vol_ref * jnp.outer(mean, mean)
    return -C[None] * adet[:, None, None]


@partial(jax.jit, static_argnames=("dim", "fe_type"))
def elem_lin_elasticity(vert_coords, dim, fe_type, mu=1.0, lam=1.0):
    """Linear elasticity 2μ ε(u):ε(v) + λ div u div v
    (reference FE::assemblyLinElasXDim, FE_def.hpp:2739).
    Returns [E, nb, nb, dim, dim]."""
    S = elem_stress_sym(vert_coords, dim, fe_type, viscosity=mu)
    _, qw, _, dphi = _tables(dim, fe_type, ref.determine_degree(dim, fe_type, "grad"))
    Binv, adet = element_transforms(vert_coords, dim)
    g = _phys_grads(Binv, dphi)
    # div term: ∫ (∂i φa)(∂j φb) for (test comp i, trial comp j)
    div = jnp.einsum("q,eqai,eqbj->eabij", qw, g, g)
    return S + lam * div * adet[:, None, None, None, None]


def elem_rhs(vert_coords, dim, fe_type, f: Callable, degree: Optional[int] = None,
             n_comp: int = 1):
    """Volume source ∫ f φa (reference FE::assemblyRHS, FE_def.hpp:4694).
    `f(x)` maps [dim] → scalar or [n_comp]; evaluated at physical quad points
    (traced — must be jax-compatible).  Returns [E, nb] or [E, nb, n_comp]."""
    if degree is None:
        degree = {"P1": 2, "P2": 4}[fe_type]
    qp, qw = ref.quadrature(dim, degree)
    phi_v = jnp.asarray(ref.eval_phi(dim, fe_type, qp), f64)
    qp = jnp.asarray(qp, f64)
    qw = jnp.asarray(qw, f64)
    vert_coords = jnp.asarray(vert_coords, f64)
    _, adet = element_transforms(vert_coords, dim)
    p0 = vert_coords[:, 0, :]
    B = jnp.swapaxes(vert_coords[:, 1:, :] - vert_coords[:, :1, :], 1, 2)
    xq = p0[:, None, :] + jnp.einsum("edk,qk->eqd", B, qp)  # [E,nq,dim]
    fq = jax.vmap(jax.vmap(f))(xq)  # [E,nq] or [E,nq,n_comp]
    if fq.ndim == 2:
        out = jnp.einsum("q,eq,qa->ea", qw, fq, phi_v)
    else:
        out = jnp.einsum("q,eqc,qa->eac", qw, fq, phi_v)
    return out * (adet[..., None, None] if fq.ndim == 3 else adet[:, None])


def elem_surface_rhs(surf_coords, dim, fe_type, g: Callable,
                     degree: int = 3):
    """Neumann surface load ∫_Γ g φa over boundary entities
    (reference FE::assemblySurfaceIntegral, FE_def.hpp:4511).
    surf_coords [S, n_surf_nodes, dim] (vertices first); surface reference
    element is the (dim−1)-simplex.  Returns [S, nb_surf] (scalar g) or
    [S, nb_surf, n_comp]."""
    sdim = dim - 1
    qp, qw = ref.quadrature(sdim, degree) if sdim == 2 else _line_quad(degree)
    phi_v = jnp.asarray(ref.eval_phi(sdim, fe_type, qp) if sdim == 2
                        else _line_phi(fe_type, qp), f64)
    qp = jnp.asarray(qp, f64)
    qw = jnp.asarray(qw, f64)
    surf_coords = jnp.asarray(surf_coords, f64)
    p0 = surf_coords[:, 0, :]
    T = jnp.swapaxes(surf_coords[:, 1:sdim + 1, :] - surf_coords[:, :1, :], 1, 2)
    # surface Jacobian norm: sqrt(det(TᵀT)) (reference SmallMatrix
    # computeScaling, core/General/SmallMatrix.hpp)
    G = jnp.einsum("edk,edl->ekl", T, T)
    detG = G[..., 0, 0] if sdim == 1 else small_det(G)
    jac = jnp.sqrt(jnp.abs(detG))
    xq = p0[:, None, :] + jnp.einsum("edk,qk->eqd", T, qp)
    gq = jax.vmap(jax.vmap(g))(xq)
    if gq.ndim == 2:
        out = jnp.einsum("q,eq,qa->ea", qw, gq, phi_v)
        return out * jac[:, None]
    out = jnp.einsum("q,eqc,qa->eac", qw, gq, phi_v)
    return out * jac[:, None, None]


def _line_quad(degree):
    n = degree // 2 + 1
    x, w = np.polynomial.legendre.leggauss(n)
    return (0.5 * (x[:, None] + 1)), 0.5 * w


def _line_phi(fe_type, qp):
    x = np.atleast_2d(qp)[:, 0]
    if fe_type == "P1":
        return np.stack([1 - x, x], axis=1)
    if fe_type == "P2":
        return np.stack([(1 - x) * (1 - 2 * x), x * (2 * x - 1),
                         4 * x * (1 - x)], axis=1)
    raise ValueError(fe_type)


# ---------------------------------------------------------------------------
# scatter plans: element matrices → global CSR
# ---------------------------------------------------------------------------


def vector_dof_ids(elem_nodes: np.ndarray, dofs_per_node: int) -> np.ndarray:
    """NodeWise dof ordering: dof = node*dpn + c → [E, nb*dpn]."""
    e = (elem_nodes[:, :, None] * dofs_per_node
         + np.arange(dofs_per_node)[None, None, :])
    return e.reshape(elem_nodes.shape[0], -1)


def scatter_pattern(row_dofs: np.ndarray, col_dofs: np.ndarray,
                    n_rows: int, n_cols: int) -> SparsityPattern:
    """Sparsity pattern for element-matrix scatter.  row_dofs [E, nr],
    col_dofs [E, nc]; COO order is (element, test, trial) row-major, matching
    `elem_mat.reshape(-1)`."""
    E, nr = row_dofs.shape
    nc = col_dofs.shape[1]
    rows = np.broadcast_to(row_dofs[:, :, None], (E, nr, nc)).ravel()
    cols = np.broadcast_to(col_dofs[:, None, :], (E, nr, nc)).ravel()
    return SparsityPattern.from_coo(rows, cols, n_rows, n_cols)


def assemble_matrix(pattern: SparsityPattern, elem_mats: jnp.ndarray) -> CsrMatrix:
    m = CsrMatrix(pattern)
    m.assemble(elem_mats.reshape(-1))
    return m


def vectorize_elem_mat(elem_mat_blocks: jnp.ndarray) -> jnp.ndarray:
    """[E, nb_r, nb_c, dim_r, dim_c] → [E, nb_r*dim_r, nb_c*dim_c] with
    NodeWise interleaving (node-major, component-minor)."""
    E, nr, nc, dr, dc = elem_mat_blocks.shape
    return (elem_mat_blocks.transpose(0, 1, 3, 2, 4)
            .reshape(E, nr * dr, nc * dc))


def assemble_vector(dof_ids: np.ndarray, elem_vecs: jnp.ndarray,
                    n_dofs: int) -> jnp.ndarray:
    """Scatter-add element vectors [E, nloc(, comp)] into a global vector."""
    if elem_vecs.ndim == 3:
        E, nb, c = elem_vecs.shape
        ids = np.asarray(dof_ids)[:, :, None] * c + np.arange(c)[None, None, :]
        return jax.ops.segment_sum(elem_vecs.reshape(-1),
                                   jnp.asarray(ids.reshape(-1)),
                                   num_segments=n_dofs)
    return jax.ops.segment_sum(elem_vecs.reshape(-1),
                               jnp.asarray(np.asarray(dof_ids).reshape(-1)),
                               num_segments=n_dofs)
