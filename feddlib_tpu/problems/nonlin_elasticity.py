"""Nonlinear (hyper)elasticity problem (reference:
problems/specific/NonLinElasticity_decl.hpp — AceGen Jacobian+stress in one
pass at NonLinElasticity_def.hpp:84-103; here both come from JAX autodiff,
feddlib_tpu.fe.hyperelastic)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.fe.hyperelastic import elem_hyper_residual_tangent
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.problems.base import NonLinearProblem

_HYPER_CHUNK = 16384


class NonLinElasticity(NonLinearProblem):
    def __init__(self, domain: Domain, parameter_list=None):
        super().__init__(parameter_list)
        self.add_variable(domain, domain.dim, "d")
        pl = self.parameter_list
        self.material = pl.get("Material Model", "Neo-Hooke")
        E = float(pl.get("E", 1.0))
        nu = float(pl.get("Poisson Ratio", 0.3))
        mu, lam = ops.lame_parameters(E, nu)
        if self.material == "Mooney-Rivlin":
            c1 = float(pl.get("C1", mu / 4.0))
            c2 = float(pl.get("C2", mu / 4.0))
            kappa = float(pl.get("Kappa", lam + 2 * mu / 3.0))
            self.params = (c1, c2, kappa)
        else:
            self.params = (mu, lam)
        self.source = None

    def _d_elem(self):
        dom, dim, _ = self.variables[0]
        dim = dom.dim
        d = self.solution[0].reshape(dom.n_nodes, dim)
        return d[dom.elem_nodes()]

    def _residual_tangent(self):
        dom = self.variables[0][0]
        dim = dom.dim
        vc = dom.vert_coords()
        de = self._d_elem()
        E = vc.shape[0]
        Rs, Ks = [], []
        for s in range(0, E, _HYPER_CHUNK):
            R, K = elem_hyper_residual_tangent(
                vc[s:s + _HYPER_CHUNK], de[s:s + _HYPER_CHUNK],
                dim, dom.fe_type, self.material, self.params)
            Rs.append(R.reshape(-1))
            Ks.append(K.reshape(-1))
        Rf = Rs[0] if len(Rs) == 1 else jnp.concatenate(Rs)
        Kf = Ks[0] if len(Ks) == 1 else jnp.concatenate(Ks)
        return Rf, Kf

    def pipeline_blocks(self):
        """Hyperelastic consistent-tangent kind for the device pipeline
        (reference AceGen tangents, FE_def.hpp:6969,7259,7559)."""
        return [(0, 0, "hyperelastic",
                 {"material": self.material, "mat_params": self.params})]

    def assemble(self) -> None:
        self.init_vectors()
        self.reassemble("Newton")

    def reassemble(self, mode: str = "Newton") -> None:
        dom = self.variables[0][0]
        dim = dom.dim
        n = dom.n_dofs(dim)
        pat = dom.pattern(("square", dim), lambda: asm.scatter_pattern(
            dom.elem_dofs(dim), dom.elem_dofs(dim), n, n))
        _, Kf = self._residual_tangent()
        K = CsrMatrix(pat)
        K.assemble(Kf)
        self.system = BlockMatrix([n])
        self.system.add_block(0, 0, K)
        self._prec_stale = True

    def internal_forces(self) -> jnp.ndarray:
        dom = self.variables[0][0]
        dim = dom.dim
        Rf, _ = self._residual_tangent()
        return asm.assemble_vector(dom.elem_dofs(dim), Rf, dom.n_dofs(dim))

    def assemble_source(self, f: Callable) -> None:
        dom = self.variables[0][0]
        self.source = ops.assemble_rhs(dom, f, dom.dim)
        self.init_vectors()
        self.rhs[0] = self.source

    def calculate_residual(self, t: float = 0.0) -> BlockVector:
        F = self.internal_forces()
        if self.source is not None:
            F = F - self.source
        r = BlockVector([F])
        return self.bc_builder.set_vector_minus_bc(r, self.solution, t)


class Elasticity(NonLinearProblem):
    """Facade switching linear/nonlinear elasticity by parameter (reference:
    problems/specific/Elasticity_decl.hpp)."""

    def __new__(cls, domain, parameter_list=None):
        from feddlib_tpu.problems.linelas import LinElas

        kind = (parameter_list or {}) and parameter_list.get(
            "Material Model", "linear")
        if kind in ("linear", None, ""):
            return LinElas(domain, parameter_list)
        return NonLinElasticity(domain, parameter_list)
