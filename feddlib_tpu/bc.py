"""Boundary-condition registry and applier — the BCBuilder equivalent.

Reference: core/General/BCBuilder_decl.hpp:26.  `addBC(func, flag, block,
domain, type, dofs)` registers conditions; application semantics
(BCBuilder_def.hpp):
- Dirichlet: zero the matrix row, unit diagonal (setLocalRowOne/Zero,
  BCBuilder_decl.hpp:91-93), write g(x, t) into the RHS (setRHS :93);
- Dirichlet_X/_Y/_Z/_X_Y/...: per-component variants (BCBuilder_def.hpp:118-173);
- Neumann: surface-integral load added to the RHS (handled via
  feddlib_tpu.fe.ops.assemble_surface_rhs);
- Newton residual correction: residual := u − g on Dirichlet dofs
  ("reverse": g − u)  (setBCMinusVector / setVectorMinusBC,
  BCBuilder_decl.hpp:71-73).

Host side precomputes, per (block, matrix pattern): the Dirichlet dof mask,
the nnz slots to zero and the diagonal slots to set — application is then a
pure device scatter, cheap to re-run each Newton/time step.

BC function contract: func(x, t) → scalar (scalar field) or [dofs] vector;
must be jax-traceable (it is vmapped over flagged nodes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix, BlockVector
from feddlib_tpu.la.csr import CsrMatrix

_COMPONENTS = {"X": 0, "Y": 1, "Z": 2}


def _parse_type(bc_type: str, dim: int) -> Optional[List[int]]:
    """Dirichlet component list, or None for non-Dirichlet types."""
    if bc_type == "Dirichlet":
        return list(range(dim))
    if bc_type.startswith("Dirichlet_"):
        comps = [_COMPONENTS[c] for c in bc_type.split("_")[1:]]
        return comps
    return None


@dataclass
class _BC:
    func: Callable
    flag: int
    block: int
    domain: Domain
    bc_type: str
    dofs_per_node: int
    components: Optional[List[int]]


class BCBuilder:
    def __init__(self):
        self.bcs: List[_BC] = []
        self._cache: Dict = {}

    def add_bc(self, func: Callable, flag: int, block: int, domain: Domain,
               bc_type: str, dofs_per_node: int) -> None:
        comps = _parse_type(bc_type, dofs_per_node)
        if comps is None and bc_type != "Neumann":
            raise ValueError(f"unknown BC type {bc_type!r}")
        self.bcs.append(_BC(func, flag, block, domain, bc_type,
                            dofs_per_node, comps))
        self._cache.clear()

    # -- masks --------------------------------------------------------------
    def dirichlet_mask(self, block: int, n_dofs: int) -> np.ndarray:
        """Boolean [n_dofs] mask of constrained dofs in a block."""
        key = ("mask", block, n_dofs)
        if key not in self._cache:
            mask = np.zeros(n_dofs, dtype=bool)
            for bc in self.bcs:
                if bc.block != block or bc.components is None:
                    continue
                nodes = np.nonzero(bc.domain.mesh.point_flags == bc.flag)[0]
                for c in bc.components:
                    mask[nodes * bc.dofs_per_node + c] = True
            self._cache[key] = mask
        return self._cache[key]

    def dirichlet_values(self, block: int, n_dofs: int, t: float = 0.0) -> jnp.ndarray:
        """[n_dofs] vector with g(x, t) at constrained dofs, 0 elsewhere.
        Later-registered BCs win on overlapping flags (corner nodes)."""
        vals = jnp.zeros(n_dofs, jnp.float64)
        for bc in self.bcs:
            if bc.block != block or bc.components is None:
                continue
            nodes = np.nonzero(bc.domain.mesh.point_flags == bc.flag)[0]
            if len(nodes) == 0:
                continue
            coords = jnp.asarray(bc.domain.mesh.points[nodes], jnp.float64)
            g = jax.vmap(lambda x: jnp.atleast_1d(
                jnp.asarray(bc.func(x, t), jnp.float64)))(coords)
            for c in bc.components:
                gc = g[:, c] if g.shape[1] > 1 else g[:, 0]
                idx = jnp.asarray(nodes * bc.dofs_per_node + c)
                vals = vals.at[idx].set(gc)
        return vals

    # -- matrix application -------------------------------------------------
    def _row_slots(self, block: int, m: CsrMatrix):
        key = ("slots", block, id(m.pattern))
        if key not in self._cache:
            pat = m.pattern
            mask = self.dirichlet_mask(block, pat.n_rows)
            rows = pat.rows_of_slots()
            in_d = mask[rows]
            is_diag = pat.indices == rows
            zero_slots = np.nonzero(in_d & ~is_diag)[0]
            diag_slots = np.nonzero(in_d & is_diag)[0]
            self._cache[key] = (jnp.asarray(zero_slots), jnp.asarray(diag_slots))
        return self._cache[key]

    def apply_to_matrix(self, m: CsrMatrix, block: int,
                        diag_value: float = 1.0) -> CsrMatrix:
        """Zero Dirichlet rows, unit diagonal (setLocalRowOne/Zero)."""
        zero_slots, diag_slots = self._row_slots(block, m)
        data = m.data.at[zero_slots].set(0.0).at[diag_slots].set(diag_value)
        return CsrMatrix(m.pattern, data, m.dtype)

    def apply_to_offdiag_matrix(self, m: CsrMatrix, row_block: int) -> CsrMatrix:
        """Zero Dirichlet rows of an off-diagonal block (no diagonal)."""
        key = ("offslots", row_block, id(m.pattern))
        if key not in self._cache:
            pat = m.pattern
            mask = self.dirichlet_mask(row_block, pat.n_rows)
            rows = pat.rows_of_slots()
            self._cache[key] = jnp.asarray(np.nonzero(mask[rows])[0])
        slots = self._cache[key]
        return CsrMatrix(m.pattern, m.data.at[slots].set(0.0), m.dtype)

    def apply_symmetric(self, m: CsrMatrix, rhs: jnp.ndarray, block: int,
                        t: float = 0.0):
        """Symmetric Dirichlet elimination: zero rows AND columns, unit
        diagonal, lift boundary data into the RHS — keeps SPD operators SPD
        so CG remains applicable (the reference sidesteps this by always
        using GMRES; BASELINE config #1 asks for CG).

        Returns (matrix, rhs)."""
        pat = m.pattern
        mask = self.dirichlet_mask(block, pat.n_rows)
        vals = self.dirichlet_values(block, pat.n_rows, t)
        g_masked = jnp.where(jnp.asarray(mask), vals, 0.0)
        new_rhs = rhs - m.matvec(g_masked)
        new_rhs = jnp.where(jnp.asarray(mask), vals, new_rhs)
        key = ("symslots", block, id(pat))
        if key not in self._cache:
            rows = pat.rows_of_slots()
            in_r = mask[rows]
            in_c = mask[pat.indices]
            is_diag = pat.indices == rows
            zero_slots = np.nonzero((in_r | in_c) & ~(is_diag & in_r))[0]
            diag_slots = np.nonzero(in_r & is_diag)[0]
            self._cache[key] = (jnp.asarray(zero_slots), jnp.asarray(diag_slots))
        zero_slots, diag_slots = self._cache[key]
        data = m.data.at[zero_slots].set(0.0).at[diag_slots].set(1.0)
        return CsrMatrix(pat, data, m.dtype), new_rhs

    def apply_to_system(self, system: BlockMatrix) -> BlockMatrix:
        """Apply Dirichlet row-masking to a whole block system
        (Problem::setBoundariesSystem semantics).  If a block row carries
        Dirichlet dofs but has no diagonal block (e.g. a pinned pressure dof
        in a Taylor-Hood system without stabilization), a sparse identity-at-
        Dirichlet diagonal block is synthesized so the system stays
        nonsingular."""
        out = BlockMatrix(system.row_sizes, system.col_sizes)
        for (i, j), m in system.blocks.items():
            if i == j:
                out.add_block(i, j, self.apply_to_matrix(m, i))
            else:
                out.add_block(i, j, self.apply_to_offdiag_matrix(m, i))
        for i in range(system.n_block_rows):
            if (i, i) in out.blocks:
                continue
            n = system.row_sizes[i]
            mask = self.dirichlet_mask(i, n)
            if not mask.any():
                continue
            d = np.nonzero(mask)[0]
            from feddlib_tpu.la.csr import SparsityPattern

            pat = SparsityPattern.from_coo(d, d, n, system.col_sizes[i])
            diag = CsrMatrix(pat)
            diag.assemble(jnp.ones(len(d)))
            out.add_block(i, i, diag)
        return out

    # -- RHS / residual application -----------------------------------------
    def apply_to_rhs(self, rhs: BlockVector, t: float = 0.0) -> BlockVector:
        """rhs[d] = g(x, t) on Dirichlet dofs (BCBuilder::setRHS)."""
        out = rhs.copy()
        for b in range(len(rhs)):
            n = rhs[b].shape[0]
            mask = self.dirichlet_mask(b, n)
            if not mask.any():
                continue
            vals = self.dirichlet_values(b, n, t)
            out[b] = jnp.where(jnp.asarray(mask), vals, rhs[b])
        return out

    def set_vector_minus_bc(self, residual: BlockVector, sol: BlockVector,
                            t: float = 0.0) -> BlockVector:
        """residual := u − g on Dirichlet dofs (setVectorMinusBC,
        BCBuilder_decl.hpp:71-73) — Newton residual correction."""
        out = residual.copy()
        for b in range(len(residual)):
            n = residual[b].shape[0]
            mask = self.dirichlet_mask(b, n)
            if not mask.any():
                continue
            vals = self.dirichlet_values(b, n, t)
            out[b] = jnp.where(jnp.asarray(mask), sol[b] - vals, residual[b])
        return out

    def set_bc_minus_vector(self, residual: BlockVector, sol: BlockVector,
                            t: float = 0.0) -> BlockVector:
        out = residual.copy()
        for b in range(len(residual)):
            n = residual[b].shape[0]
            mask = self.dirichlet_mask(b, n)
            if not mask.any():
                continue
            vals = self.dirichlet_values(b, n, t)
            out[b] = jnp.where(jnp.asarray(mask), vals - sol[b], residual[b])
        return out

    def zero_dirichlet(self, vec: BlockVector) -> BlockVector:
        """Zero constrained entries (homogeneous form, for Newton updates)."""
        out = vec.copy()
        for b in range(len(vec)):
            mask = self.dirichlet_mask(b, vec[b].shape[0])
            if mask.any():
                out[b] = jnp.where(jnp.asarray(mask), 0.0, vec[b])
        return out
