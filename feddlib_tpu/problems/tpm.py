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
        Lp = ops.assemble_laplace(dom_p).scale(self.kappa)
        Mp = ops.assemble_mass(dom_p)
        self.B, self.BT, self.Mp = B, BT, Mp
        sizes = self.block_sizes()
        S = BlockMatrix(sizes)
        S.add_block(0, 0, Ku)
        S.add_block(0, 1, BT.scale(self.alpha))
        S.add_block(1, 0, B.scale(-self.alpha / dt))
        S.add_block(1, 1, Lp.add(Mp, alpha=1.0, beta=self.storativity / dt))
        self.system = S
        self.init_vectors()

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
