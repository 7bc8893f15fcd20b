"""TPM — two-phase (Biot) poroelasticity (reference:
problems/specific/TPM_decl.hpp / NonLinTPM; the reference drives
AceGen-generated Biot elements (FE::assemblyAceGenTPM, FE_def.hpp:131,
SKR_Biot* :338-343).  Here the same quasi-static Biot system is assembled
from the standard mixed kernels:

  momentum:  ∫ σ(u):ε(v) + α (Bᵀ p)·v           = f     (σ linear or hyper)
  mass:      −α/dt B (u−uⁿ) + κ L p + S/dt M (p−pⁿ) = g

with B the (negative) mixed divergence block from Stokes assembly
(FE::assemblyDivAndDivT), L the pressure Laplacian (permeability κ), M the
pressure mass (storativity S).  Implicit Euler in time; u P2 / p P1 by
default (inf-sup stable for the coupling).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.problems.base import Problem


class TPM(Problem):
    def __init__(self, domain_u: Domain, domain_p: Domain,
                 parameter_list=None):
        super().__init__(parameter_list)
        dim = domain_u.dim
        self.add_variable(domain_u, dim, "u")
        self.add_variable(domain_p, 1, "p")
        pl = self.parameter_list
        self.alpha = float(pl.get("Biot Alpha", 1.0))
        self.kappa = float(pl.get("Permeability", 1.0))
        self.storativity = float(pl.get("Storativity", 0.0))
        self.dt = float(pl.get("dt", 0.01))
        mu, lam = ops.lame_parameters(float(pl.get("E", 1.0)),
                                      float(pl.get("Poisson Ratio", 0.3)))
        self.mu, self.lam = mu, lam

    def assemble(self) -> None:
        dom_u, dom_p = self.variables[0][0], self.variables[1][0]
        dt = self.dt
        Ku = ops.assemble_lin_elasticity(dom_u, self.mu, self.lam)
        B, BT = ops.assemble_divergence(dom_u, dom_p)
        Lp = ops.assemble_laplace(dom_p)
        Mp = ops.assemble_mass(dom_p)
        self.B, self.BT, self.Mp, self.Lp = B, BT, Mp, Lp
        Lp = Lp.scale(self.kappa)
        sizes = self.block_sizes()
        S = BlockMatrix(sizes)
        S.add_block(0, 0, Ku)
        S.add_block(0, 1, BT.scale(self.alpha))
        S.add_block(1, 0, B.scale(-self.alpha / dt))
        S.add_block(1, 1, Lp.add(Mp, alpha=1.0, beta=self.storativity / dt))
        self.system = S
        self.init_vectors()

    def pipeline_blocks(self):
        """Linear quasi-static Biot blocks for the device-resident
        distributed pipeline ('Use Device Pipeline'; reference TPM AceGen
        elements, FE_def.hpp:131,338)."""
        return [(0, 0, "lin_elasticity", {"mu": self.mu, "lam": self.lam}),
                (0, 1, "divergence_T", {"coeff": self.alpha}),
                (1, 0, "divergence", {"coeff": -self.alpha / self.dt}),
                (1, 1, "laplace", {"coeff": self.kappa}),
                (1, 1, "mass", {"coeff": self.storativity / self.dt})]

    def assemble_source(self, f: Callable) -> None:
        dom_u = self.variables[0][0]
        self.init_vectors()
        self.rhs[0] = ops.assemble_rhs(dom_u, f, dom_u.dim)

    def step_rhs(self, u_old: jnp.ndarray, p_old: jnp.ndarray,
                 f_ext: Optional[BlockVector] = None) -> BlockVector:
        """Implicit-Euler history terms (the per-step 'history variables' of
        the reference's AceGen elements, FE_decl.hpp:28-38 DataElement)."""
        dt = self.dt
        rp = (-self.alpha / dt) * self.B.matvec(u_old) \
            + (self.storativity / dt) * self.Mp.matvec(p_old)
        ru = jnp.zeros(self.block_sizes()[0])
        out = BlockVector([ru, rp])
        if f_ext is not None:
            out = out.axpy(1.0, f_ext)
        return out

    def advance(self, t_end: float, observer: Optional[Callable] = None,
                f_ext: Optional[BlockVector] = None) -> None:
        """Quasi-static consolidation loop (reference unsteadyTPM test)."""
        self.init_vectors()
        t = 0.0
        while t < t_end - 1e-12:
            t_new = t + self.dt
            rhs = self.step_rhs(self.solution[0], self.solution[1], f_ext)
            rhs = self.bc_builder.apply_to_rhs(rhs, t_new)
            self.rhs = rhs
            self.solve()
            if observer:
                observer(t_new, self.solution)
            t = t_new


class NonLinTPM(TPM):
    """Nonlinear (finite-strain) Biot poroelasticity — the NonLinTPM
    analog (reference problems/specific/NonLinTPM_decl.hpp; AceGen element
    with per-step history, NonLinTPM_def.hpp:221).  The solid is
    hyperelastic (feddlib_tpu.fe.hyperelastic autodiff tangents); the Biot
    coupling and flow equation stay as in TPM with the small-strain
    divergence operator (consistent at moderate strains, as the reference's
    TPM element).  Each step runs Newton on

        R_u = F_int(d) + α Bᵀ p − f
        R_p = −α/dt B (d − dⁿ) + κ L p + S/dt M (p − pⁿ) − g
    """

    def __init__(self, domain_u: Domain, domain_p: Domain,
                 parameter_list=None):
        super().__init__(domain_u, domain_p, parameter_list)
        pl = self.parameter_list
        self.material = pl.get("Material Model", "Neo-Hooke")
        self.params = (self.mu, self.lam)

    # NonLinearSolver protocol (overridden per step inside advance)
    def calculate_residual(self, t: float = 0.0):
        raise RuntimeError("use NonLinTPM.advance()")

    def reassemble(self, mode: str = "Newton"):
        raise RuntimeError("use NonLinTPM.advance()")

    def residual_norm(self, r) -> float:
        return float(r.norm2())

    def _solid_residual_tangent(self):
        from feddlib_tpu.fe import assembly as asm
        from feddlib_tpu.fe.hyperelastic import elem_hyper_residual_tangent

        dom = self.variables[0][0]
        dim = dom.dim
        d = self.solution[0].reshape(dom.n_nodes, dim)[dom.elem_nodes()]
        R, K = elem_hyper_residual_tangent(
            dom.vert_coords(), d, dim, dom.fe_type, self.material,
            self.params)
        n = dom.n_dofs(dim)
        F = asm.assemble_vector(dom.elem_dofs(dim), R.reshape(R.shape[0], -1),
                                n)
        pat = dom.pattern(("square", dim), lambda: asm.scatter_pattern(
            dom.elem_dofs(dim), dom.elem_dofs(dim), n, n))
        from feddlib_tpu.la.csr import CsrMatrix

        Kt = CsrMatrix(pat)
        Kt.assemble(K.reshape(-1))
        return F, Kt

    def advance(self, t_end: float, observer: Optional[Callable] = None,
                f_ext: Optional[BlockVector] = None) -> None:
        from feddlib_tpu.solvers.nonlinear import NonLinearSolver

        self.init_vectors()
        dt = self.dt
        solver = NonLinearSolver("Newton")
        t = 0.0
        prob = self
        while t < t_end - 1e-12:
            t_new = t + dt
            u_old, p_old = self.solution[0], self.solution[1]
            hist = self.step_rhs(u_old, p_old, None)

            def residual(tt=0.0):
                F_int, _ = prob._solid_residual_tangent()
                u, p = prob.solution[0], prob.solution[1]
                Ru = F_int + prob.alpha * prob.BT.matvec(p)
                Rp = ((-prob.alpha / dt) * prob.B.matvec(u)
                      + prob.kappa * prob.Lp.matvec(p)
                      + (prob.storativity / dt) * prob.Mp.matvec(p)
                      - hist[1])
                if f_ext is not None:
                    Ru = Ru - f_ext[0]
                    Rp = Rp - f_ext[1]
                r = BlockVector([Ru, Rp])
                return prob.bc_builder.set_vector_minus_bc(
                    r, prob.solution, tt)

            def reassemble(mode="Newton"):
                _, Kt = prob._solid_residual_tangent()
                sizes = prob.block_sizes()
                S = BlockMatrix(sizes)
                S.add_block(0, 0, Kt)
                S.add_block(0, 1, prob.BT.scale(prob.alpha))
                S.add_block(1, 0, prob.B.scale(-prob.alpha / dt))
                S.add_block(1, 1, prob.Lp.scale(prob.kappa).add(
                    prob.Mp, alpha=1.0, beta=prob.storativity / dt))
                prob.system = S
                prob._prec_stale = True

            base_res, base_rea = self.calculate_residual, self.reassemble
            self.calculate_residual = residual
            self.reassemble = reassemble
            try:
                solver.solve(self, t_new)
            finally:
                self.calculate_residual = base_res
                self.reassemble = base_rea
            if observer:
                observer(t_new, self.solution)
            t = t_new
