"""Navier–Stokes problem (reference: problems/specific/NavierStokes_decl.hpp).

Mirrors the reference's structure (NavierStokes_def.hpp):
- `assemble` → assembleConstantMatrices (:129): A (viscous), B, Bᵀ, stab C;
- `reassemble("FixedPoint")` adds N(u) (:282-308); `("Newton")` adds W(u);
- `calculate_residual` (:723): F_u = [A+N(u)]u + Bᵀp − f,  F_p = Bu (+Cp),
  with Dirichlet correction residual = u − g on constrained dofs.
The convection N(u) uses the current solution in repeated (element-local)
form — the u_rep_ of the reference (NavierStokes_decl.hpp:102) — which here
is just a device gather (ops.u_elem_values)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.problems.base import NonLinearProblem


class NavierStokes(NonLinearProblem):
    def __init__(self, domain_u: Domain, domain_p: Domain,
                 parameter_list=None):
        super().__init__(parameter_list)
        dim = domain_u.dim
        self.add_variable(domain_u, dim, "u")
        self.add_variable(domain_p, 1, "p")
        self.viscosity = float(self.parameter_list.get("Viscosity", 1.0))
        self.density = float(self.parameter_list.get("Density", 1.0))
        self.A = None
        self.B = None
        self.BT = None
        self.C = None
        self.source = None
        self._last_mode = "FixedPoint"

    def assemble(self) -> None:
        dom_u = self.variables[0][0]
        dom_p = self.variables[1][0]
        self.A = ops.assemble_laplace_vec(dom_u, self.viscosity)
        self.B, self.BT = ops.assemble_divergence(dom_u, dom_p)
        if dom_u.fe_type == dom_p.fe_type:
            self.C = ops.assemble_bd_stabilization(dom_p)
        self.init_vectors()
        self.reassemble("FixedPoint")

    def _build_system(self, Auu) -> None:
        sizes = self.block_sizes()
        self.system = BlockMatrix(sizes)
        self.system.add_block(0, 0, Auu)
        self.system.add_block(0, 1, self.BT)
        self.system.add_block(1, 0, self.B)
        if self.C is not None:
            self.system.add_block(1, 1, self.C)
        self._prec_stale = True

    def reassemble(self, mode: str = "Newton") -> None:
        self._last_mode = mode
        dom_u = self.variables[0][0]
        u = self.solution[0] if self.solution is not None else None
        if u is None:
            self._build_system(self.A)
            return
        N = ops.assemble_advection(dom_u, u * self.density)
        Auu = self.A.add(N)
        if mode == "Newton":
            W = ops.assemble_advection_in_u(dom_u, u * self.density)
            Auu = Auu.add(W)
        self._build_system(Auu)

    def pipeline_blocks(self):
        """Current block composition for the device-resident distributed
        pipeline — tracks the FixedPoint/Newton reassembly state so the
        pipeline-assembled Jacobian matches the serial one."""
        dom_u, dom_p = self.variables[0][0], self.variables[1][0]
        blocks = [(0, 0, "laplace_vec", {"viscosity": self.viscosity}),
                  (0, 0, "advection", {"coeff": self.density})]
        if self._last_mode == "Newton":
            blocks.append((0, 0, "advection_in_u", {"coeff": self.density}))
        blocks += [(0, 1, "divergence_T", {}), (1, 0, "divergence", {})]
        if dom_u.fe_type == dom_p.fe_type:
            blocks.append((1, 1, "bd_stab", {}))
        return blocks

    def assemble_source(self, f: Callable) -> None:
        dom_u = self.variables[0][0]
        self.source = ops.assemble_rhs(dom_u, f, dom_u.dim)
        self.init_vectors()
        self.rhs[0] = self.source

    def surface_forces(self, flags) -> jnp.ndarray:
        """Variational force evaluation on flagged boundaries: F_i = Σ over
        constrained dofs of the momentum residual WITHOUT BC row masking —
        the standard consistent drag/lift formula (reference computes
        drag/lift via getValuesOfInterest / viscous+pressure integrals,
        FSI_def.hpp:1343; the residual form is equivalent and exact for the
        discrete system).  Returns [dim] total force."""
        dom_u = self.variables[0][0]
        dim = dom_u.dim
        u, p = self.solution[0], self.solution[1]
        N = ops.assemble_advection(dom_u, u * self.density)
        Fu = self.A.matvec(u) + N.matvec(u) + self.BT.matvec(p)
        if self.source is not None:
            Fu = Fu - self.source
        mask = np.isin(dom_u.mesh.point_flags, np.asarray(flags))
        nodes = np.nonzero(mask)[0]
        Fn = np.asarray(Fu).reshape(-1, dim)
        # residual at constrained dofs = reaction ON the fluid; the force on
        # the body is its negative
        return -Fn[nodes].sum(axis=0)

    def drag_lift_coefficients(self, flags, u_mean: float,
                               length: float) -> tuple:
        """(c_d, c_l) with the DFG normalisation 2F/(ρ U² L)."""
        F = self.surface_forces(flags)
        scale = 2.0 / (self.density * u_mean ** 2 * length)
        return float(F[0] * scale), float(F[1] * scale)

    def calculate_residual(self, t: float = 0.0) -> BlockVector:
        """F(u, p) with the fixed-point operator [A + N(u)] (the Newton W
        term belongs to the Jacobian only)."""
        dom_u = self.variables[0][0]
        u, p = self.solution[0], self.solution[1]
        N = ops.assemble_advection(dom_u, u * self.density)
        Fu = self.A.matvec(u) + N.matvec(u) + self.BT.matvec(p)
        if self.source is not None:
            Fu = Fu - self.source
        Fp = self.B.matvec(u)
        if self.C is not None:
            Fp = Fp + self.C.matvec(p)
        r = BlockVector([Fu, Fp])
        # Dirichlet correction: residual = u − g (reference 'reverse' form)
        return self.bc_builder.set_vector_minus_bc(r, self.solution, t)
