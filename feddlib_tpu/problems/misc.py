"""Small problem variants: LaplaceBlocks (block-preconditioner demo) and
LinElasFirstOrder (first-order-in-time reformulation).

Reference: problems/specific/LaplaceBlocks_decl.hpp (two independent
diagonal Laplace blocks) and LinElasFirstOrder_decl.hpp (d, v blocks with
[ [0, -I], [K/ρ?, 0] ]-style first-order form M v̇ + K d = f, ḋ = v)."""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.la.csr import CsrMatrix, SparsityPattern
from feddlib_tpu.problems.base import Problem

import numpy as np


class LaplaceBlocks(Problem):
    """Two decoupled Laplace blocks in one block system."""

    def __init__(self, domain: Domain, parameter_list=None):
        super().__init__(parameter_list)
        self.add_variable(domain, 1, "u0")
        self.add_variable(domain, 1, "u1")

    def assemble(self) -> None:
        dom = self.variables[0][0]
        K = ops.assemble_laplace(dom)
        sizes = self.block_sizes()
        self.system = BlockMatrix(sizes)
        self.system.add_block(0, 0, K)
        self.system.add_block(1, 1, K)
        self.init_vectors()

    def assemble_source(self, f: Callable) -> None:
        dom = self.variables[0][0]
        b = ops.assemble_rhs(dom, f)
        self.init_vectors()
        self.rhs = BlockVector([b, b])


def _identity_csr(n: int) -> CsrMatrix:
    idx = np.arange(n)
    pat = SparsityPattern.from_coo(idx, idx, n, n)
    m = CsrMatrix(pat)
    m.assemble(jnp.ones(n))
    return m


class LinElasFirstOrder(Problem):
    """First-order form of elastodynamics: blocks (d, v) with
        [ K      0 ] [d]   (+ mass terms from the time integrator)
        [ 0      M ] [v]
    coupling  ḋ − v = 0  handled through TimeProblem block masks (reference
    LinElasFirstOrder_def.hpp).  Here we assemble the steady part: system
    [[K, 0], [0, M]] plus the off-diagonal coupling [−M v] used by the
    θ-scheme driver via `coupling_blocks`."""

    def __init__(self, domain: Domain, parameter_list=None):
        super().__init__(parameter_list)
        dim = domain.dim
        self.add_variable(domain, dim, "d")
        self.add_variable(domain, dim, "v")
        pl = self.parameter_list
        self.mu, self.lam = ops.lame_parameters(
            float(pl.get("E", 1.0)), float(pl.get("Poisson Ratio", 0.3)))

    def assemble(self) -> None:
        dom = self.variables[0][0]
        dim = dom.dim
        K = ops.assemble_lin_elasticity(dom, self.mu, self.lam)
        M = ops.assemble_mass(dom, dim)
        sizes = self.block_sizes()
        self.system = BlockMatrix(sizes)
        # rows: [ 0·d − M·v = −M vⁿ…]  [K·d + …] — the time driver adds the
        # ∂t masses; steady part couples d-row to v and v-row to d:
        self.system.add_block(0, 1, M.scale(-1.0))
        self.system.add_block(1, 0, K)
        self.M, self.K = M, K
        self.init_vectors()
