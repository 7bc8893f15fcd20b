"""Geometry (mesh motion) problem — harmonic extension of the interface
displacement into the fluid mesh (reference: problems/specific/Geometry
_decl.hpp; assemble at Geometry_def.hpp:75-93 — 'Laplace' harmonic extension
with optional interface-distance scaling or pseudo-elasticity
FE::assemblyLaplaceXDimE / assemblyElasticityJacobianAndStressAceFEM)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix
from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.problems.base import Problem


class Geometry(Problem):
    def __init__(self, domain: Domain, parameter_list=None,
                 distances: Optional[np.ndarray] = None):
        super().__init__(parameter_list)
        self.add_variable(domain, domain.dim, "g")
        self.model = self.parameter_list.get("Model", "Laplace")
        self.distances = distances  # node distances to the FSI interface

    def assemble(self) -> None:
        dom, dofs, _ = self.variables[0]
        if self.model == "Elasticity":
            mu, lam = ops.lame_parameters(
                float(self.parameter_list.get("E", 1.0)),
                float(self.parameter_list.get("Poisson Ratio", 0.3)))
            K = ops.assemble_lin_elasticity(dom, mu, lam)
        elif self.distances is not None:
            K = self._assemble_scaled_laplace(dom)
        else:
            K = ops.assemble_laplace_vec(dom)
        self.system = BlockMatrix([dom.n_dofs(dofs)])
        self.system.add_block(0, 0, K)
        self.init_vectors()

    def pipeline_blocks(self):
        """Harmonic-extension operator kinds for the device pipeline
        (reference FE::assemblyLaplaceXDimE, FE_def.hpp:2225)."""
        dom = self.variables[0][0]
        if self.model == "Elasticity":
            mu, lam = ops.lame_parameters(
                float(self.parameter_list.get("E", 1.0)),
                float(self.parameter_list.get("Poisson Ratio", 0.3)))
            return [(0, 0, "lin_elasticity", {"mu": mu, "lam": lam})]
        if self.distances is not None:
            nv = dom.mesh.vertices_per_element
            d_elem = self.distances[dom.mesh.elements[:, :nv]].mean(axis=1)
            scale = 1.0 / np.maximum(d_elem, 1e-3)
            return [(0, 0, "laplace_vec_scaled", {"elem_data": scale})]
        return [(0, 0, "laplace_vec", {})]

    def _assemble_scaled_laplace(self, dom: Domain) -> CsrMatrix:
        """Harmonic extension with stiffness ∝ 1/dist(x, Γ): elements near
        the interface move almost rigidly, deformation is absorbed far away
        (reference: FE::assemblyLaplaceXDimE with distance scaling,
        FE_def.hpp:2225)."""
        dim = dom.dim
        nv = dom.mesh.vertices_per_element
        d_elem = self.distances[dom.mesh.elements[:, :nv]].mean(axis=1)
        scale = 1.0 / np.maximum(d_elem, 1e-3)
        vc = dom.vert_coords()
        K = asm.elem_laplace(vc, dim, dom.fe_type)
        K = K * jnp.asarray(scale)[:, None, None]
        eye = jnp.eye(dim, dtype=jnp.float64)
        Kv = asm.vectorize_elem_mat(jnp.einsum("eab,ij->eabij", K, eye))
        n = dom.n_dofs(dim)
        pat = dom.pattern(("square", dim), lambda: asm.scatter_pattern(
            dom.elem_dofs(dim), dom.elem_dofs(dim), n, n))
        m = CsrMatrix(pat)
        m.assemble(Kv.reshape(-1))
        return m

    def solve_motion(self, interface_nodes: np.ndarray,
                     interface_disp: np.ndarray,
                     boundary_flags=(1,)) -> np.ndarray:
        """Solve for the mesh displacement given interface node
        displacements ([n_iface, dim]); outer mesh boundary held fixed.
        Returns the full displacement field [n_nodes, dim]."""
        dom, dim, _ = self.variables[0]
        dim = dom.dim
        n = dom.n_dofs(dim)
        A = self.system.get_block(0, 0)
        # Dirichlet mask: outer boundary (flags) + interface nodes
        mask = np.zeros(n, dtype=bool)
        vals = np.zeros(n)
        for flag in boundary_flags:
            nodes = np.nonzero(dom.mesh.point_flags == flag)[0]
            for c in range(dim):
                mask[nodes * dim + c] = True
        for c in range(dim):
            mask[interface_nodes * dim + c] = True
            vals[interface_nodes * dim + c] = interface_disp[:, c]
        from feddlib_tpu.solvers.krylov import gmres

        pat = A.pattern
        rows = pat.rows_of_slots()
        in_d = mask[rows]
        is_diag = pat.indices == rows
        zero_slots = np.nonzero(in_d & ~is_diag)[0]
        diag_slots = np.nonzero(in_d & is_diag)[0]
        data = A.data.at[jnp.asarray(zero_slots)].set(0.0)
        data = data.at[jnp.asarray(diag_slots)].set(1.0)
        Ab = CsrMatrix(pat, data, A.dtype)
        rhs = jnp.where(jnp.asarray(mask), jnp.asarray(vals), 0.0)
        res = gmres(Ab.matvec, rhs,
                    tol=float(self.parameter_list.get(
                        "Convergence Tolerance", 1e-8)),
                    maxiter=int(self.parameter_list.get(
                        "Maximum Iterations", 2000)))
        return np.asarray(res.x).reshape(dom.n_nodes, dim)
