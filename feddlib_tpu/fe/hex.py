"""Q1 hexahedral (and Q1 quadrilateral) elements — isoparametric assembly.

The reference's structured path supports Q1/Q2/Q2-20 hex discretisations
(MeshStructured_decl.hpp:71-101; Q-bases in FE::getPhi/getDPhi).  Unlike
simplices, hex mappings are NON-affine: the Jacobian varies per quadrature
point, so the batched kernels here compute J(ξ_q) per element per point —
still one einsum pipeline over [elements, points, basis, dims].

Element node ordering (tensor product, matches mesh_hex generation):
  2D quad: (0,0),(1,0),(1,1),(0,1)
  3D hex:  (0,0,0),(1,0,0),(1,1,0),(0,1,0),(0,0,1),(1,0,1),(1,1,1),(0,1,1)
Reference coordinates in [0,1]^dim; Gauss-Legendre tensor quadrature.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe.assembly import small_det, small_inv
from feddlib_tpu.mesh.mesh import Mesh

f64 = jnp.float64

_QUAD_NODES = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
_HEX_NODES = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=float)


def q1_phi(dim: int, pts: np.ndarray) -> np.ndarray:
    """Q1 tensor-product basis at reference points [nq, dim] → [nq, 2^dim]."""
    pts = np.atleast_2d(pts)
    nodes = _QUAD_NODES if dim == 2 else _HEX_NODES
    out = np.ones((len(pts), len(nodes)))
    for d in range(dim):
        x = pts[:, d][:, None]
        nd = nodes[:, d][None, :]
        out *= np.where(nd > 0.5, x, 1.0 - x)
    return out


def q1_grad_phi(dim: int, pts: np.ndarray) -> np.ndarray:
    """[nq, 2^dim, dim] reference gradients."""
    pts = np.atleast_2d(pts)
    nodes = _QUAD_NODES if dim == 2 else _HEX_NODES
    nq, nb = len(pts), len(nodes)
    out = np.zeros((nq, nb, dim))
    for k in range(dim):
        g = np.ones((nq, nb))
        for d in range(dim):
            x = pts[:, d][:, None]
            nd = nodes[:, d][None, :]
            if d == k:
                g *= np.where(nd > 0.5, 1.0, -1.0)
            else:
                g *= np.where(nd > 0.5, x, 1.0 - x)
        out[:, :, k] = g
    return out


@lru_cache(maxsize=None)
def hex_quadrature(dim: int, n: int = 2):
    """Tensor Gauss-Legendre rule on [0,1]^dim (n points per axis)."""
    x, w = np.polynomial.legendre.leggauss(n)
    x = 0.5 * (x + 1)
    w = 0.5 * w
    grids = np.meshgrid(*([x] * dim), indexing="ij")
    wgrids = np.meshgrid(*([w] * dim), indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=1)
    wts = np.prod(np.stack([g.ravel() for g in wgrids], axis=1), axis=1)
    return pts, wts


@partial(jax.jit, static_argnames=("dim", "nq_axis"))
def hex_elem_laplace(node_coords, dim, nq_axis=2):
    """Isoparametric Q1 stiffness: node_coords [E, 2^dim, dim] →
    [E, 2^dim, 2^dim]."""
    qp, qw = hex_quadrature(dim, nq_axis)
    dphi = jnp.asarray(q1_grad_phi(dim, qp), f64)  # [nq, nb, dim]
    qw = jnp.asarray(qw, f64)
    # per-point Jacobian J[e,q,i,k] = Σ_b coords[e,b,i] dphi[q,b,k]
    J = jnp.einsum("ebi,qbk->eqik", node_coords, dphi)
    detJ = small_det(J)
    Jinv = small_inv(J, detJ)
    # physical gradients g[e,q,b,i] = Jinv[e,q,k,i] dphi[q,b,k]
    g = jnp.einsum("eqki,qbk->eqbi", Jinv, dphi)
    K = jnp.einsum("q,eq,eqai,eqbi->eab", qw, jnp.abs(detJ), g, g)
    return K


@partial(jax.jit, static_argnames=("dim", "nq_axis"))
def hex_elem_mass(node_coords, dim, nq_axis=2):
    qp, qw = hex_quadrature(dim, nq_axis)
    phi = jnp.asarray(q1_phi(dim, qp), f64)
    dphi = jnp.asarray(q1_grad_phi(dim, qp), f64)
    qw = jnp.asarray(qw, f64)
    J = jnp.einsum("ebi,qbk->eqik", node_coords, dphi)
    detJ = jnp.abs(small_det(J))
    return jnp.einsum("q,eq,qa,qb->eab", qw, detJ, phi, phi)


def build_hex_mesh(dim: int, n_cells, lower=None, upper=None) -> Mesh:
    """Structured Q1 quadrilateral/hexahedral mesh (fe_type 'Q1')."""
    if isinstance(n_cells, int):
        n_cells = (n_cells,) * dim
    lower = np.array(lower if lower is not None else [0.0] * dim)
    upper = np.array(upper if upper is not None else [1.0] * dim)
    axes = [np.linspace(lower[d], upper[d], n_cells[d] + 1)
            for d in range(dim)]
    grids = np.meshgrid(*axes, indexing="ij")
    points = np.stack([g.ravel() for g in grids], axis=1)
    def nid(idx):
        # row-major over axes with 'ij' indexing
        out = idx[0]
        for d in range(1, dim):
            out = out * (n_cells[d] + 1) + idx[d]
        return out

    cells = np.meshgrid(*[np.arange(n) for n in n_cells], indexing="ij")
    cells = np.stack([c.ravel() for c in cells], axis=1)  # [E, dim]
    ref_nodes = (_QUAD_NODES if dim == 2 else _HEX_NODES).astype(int)
    conn = np.stack([
        np.array([nid(c + off) for off in ref_nodes]) for c in cells
    ])
    flags = np.zeros(len(points), dtype=np.int32)
    on_b = np.zeros(len(points), dtype=bool)
    for d in range(dim):
        on_b |= np.isclose(points[:, d], lower[d]) | np.isclose(
            points[:, d], upper[d])
    flags[on_b] = 1
    mesh = Mesh.__new__(Mesh)
    mesh.dim = dim
    mesh.fe_type = "Q1"
    mesh.points = points
    mesh.point_flags = flags
    mesh.elements = conn.astype(np.int64)
    mesh.element_flags = np.zeros(len(conn), dtype=np.int32)
    mesh.surfaces = None
    mesh.surface_flags = None
    mesh.lines = None
    mesh.line_flags = None
    mesh.p2_edges = None
    mesh.ref_points = None
    return mesh
