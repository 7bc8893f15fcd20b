"""Laplace problem (reference: problems/specific/Laplace_decl.hpp,
assemble at Laplace_def.hpp:36-60; scalar or vector field)."""

from __future__ import annotations

from typing import Callable, Optional

from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.problems.base import Problem


class Laplace(Problem):
    def __init__(self, domain: Domain, dofs_per_node: int = 1,
                 parameter_list=None):
        super().__init__(parameter_list)
        self.add_variable(domain, dofs_per_node, "u")

    def assemble(self) -> None:
        dom, dofs, _ = self.variables[0]
        K = (ops.assemble_laplace(dom) if dofs == 1
             else ops.assemble_laplace_vec(dom))
        n = dom.n_dofs(dofs)
        self.system = BlockMatrix([n])
        self.system.add_block(0, 0, K)
        self.init_vectors()

    def pipeline_blocks(self):
        """Block kernels for the device-resident distributed pipeline
        ('Use Device Pipeline', parallel/pipeline.py)."""
        dofs = self.variables[0][1]
        return [(0, 0, "laplace" if dofs == 1 else "laplace_vec", {})]

    def assemble_source(self, f: Callable) -> None:
        dom, dofs, _ = self.variables[0]
        self.rhs = BlockVector([ops.assemble_rhs(dom, f, dofs)])

    def assemble_surface_source(self, g: Callable, flag: int) -> None:
        dom, dofs, _ = self.variables[0]
        add = ops.assemble_surface_rhs(dom, g, flag, dofs)
        self.init_vectors()
        self.rhs[0] = self.rhs[0] + add

    def mass_matrix(self):
        dom, dofs, _ = self.variables[0]
        return ops.assemble_mass(dom, dofs)
