"""FaCSI preconditioner for monolithic FSI (reference:
problems/Solver/PrecOpFaCSI_decl.hpp:27 — the Deparis et al. FaCSI operator:
structure solve → interface condensation with the C1/C1ᵀ/C2 coupling →
fluid solve with strongly imposed interface motion; composed from per-field
FROSch sub-preconditioners via MinPrecProblem,
Preconditioner_def.hpp:789).

Acting on the merged residual r = (r_u, r_p, r_d, r_λ) of the 4-field GE
system (see feddlib_tpu.problems.fsi):

1. solid:   z_d = S̃_d⁻¹ r_d                     (Schwarz on A_dd)
2. condense: the constraint row gives Dirichlet data for the fluid
   interface velocity:  u|_Γ = r_λ|rows − C2 z_d  (C2 = −1/dt I)
3. fluid:   solve the fluid saddle block with interface velocity rows
   replaced by identity and that data in the RHS:  z_u, z_p = F̃⁻¹ r̂_f
4. recover: z_λ = (r_u − [A Bᵀ] z)|_Γ            (interface traction)
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.la.block import BlockMatrix
from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.la.map import IndexMap
from feddlib_tpu.precond.schwarz import SchwarzPreconditioner


class FaCSIPreconditioner:
    def __init__(self, fsi, sys_bc: BlockMatrix, n_subdomains: int = 4,
                 overlap: int = 1):
        self.fsi = fsi
        sizes = fsi.block_sizes()
        self.sizes = sizes
        self.off = np.concatenate([[0], np.cumsum(sizes)])
        dt = fsi.dt

        # --- solid sub-preconditioner (field 2)
        Add = sys_bc.get_block(2, 2)
        dom_d = fsi.variables[2][0]
        from feddlib_tpu.mesh.partition import MeshPartition

        base_d = dom_d.parent_p1 or dom_d
        part_d = MeshPartition(base_d.mesh, n_subdomains)
        from feddlib_tpu.solvers.linear import _p2_unique_map

        nmap_d = (_p2_unique_map(part_d, dom_d)
                  if dom_d.fe_type == "P2" else part_d.unique_map)
        dof_d = nmap_d.build_vec_field_map(fsi.dim)
        self.solid_prec = SchwarzPreconditioner(Add, dof_d, overlap=overlap)

        # --- fluid block with interface velocity rows → identity
        fl = BlockMatrix(sizes[:2])
        uf = fsi._uf_cols  # interface u-dofs (fluid numbering)
        Auu = _rows_to_identity(sys_bc.get_block(0, 0), uf)
        BT = _rows_to_zero(sys_bc.get_block(0, 1), uf)
        fl.add_block(0, 0, Auu)
        fl.add_block(0, 1, BT)
        fl.add_block(1, 0, sys_bc.get_block(1, 0))
        if sys_bc.get_block(1, 1) is not None:
            fl.add_block(1, 1, sys_bc.get_block(1, 1))
        Ff = fl.merge()
        dom_u = fsi.variables[0][0]
        base_u = dom_u.parent_p1 or dom_u
        part_u = MeshPartition(base_u.mesh, n_subdomains)
        nmap_u = (_p2_unique_map(part_u, dom_u)
                  if dom_u.fe_type == "P2" else part_u.unique_map)
        dof_u = nmap_u.build_vec_field_map(fsi.dim)
        # merged fluid dof map: u dofs ++ p dofs (block offset sizes[0])
        nmap_p = part_u.unique_map  # pressure = P1 parent nodes
        parts = []
        for p in range(n_subdomains):
            parts.append(np.sort(np.concatenate([
                dof_u.partition_indices[p],
                nmap_p.partition_indices[p] + sizes[0]])))
        fmap = IndexMap(sizes[0] + sizes[1], parts)
        self.fluid_prec = SchwarzPreconditioner(Ff, fmap, overlap=overlap)

        # coupling pieces
        self.Auu_full = sys_bc.get_block(0, 0)
        self.BT_full = sys_bc.get_block(0, 1)
        self.uf = jnp.asarray(uf)
        self.iface_rows = jnp.asarray(fsi._iface_rows)
        self.ds = jnp.asarray(fsi._ds_cols)
        self.dt = dt

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        o = self.off
        ru = r[o[0]:o[1]]
        rp = r[o[1]:o[2]]
        rd = r[o[2]:o[3]]
        rl = r[o[3]:o[4]]
        # 1) solid
        zd = self.solid_prec.apply(rd)
        # 2) interface fluid velocity data: u|Γ = r_λ + (1/dt) d|Γ
        uGamma = rl[self.iface_rows] + zd[self.ds] / self.dt
        ru_hat = ru.at[self.uf].set(uGamma)
        # 3) fluid solve
        zf = self.fluid_prec.apply(jnp.concatenate([ru_hat, rp]))
        zu, zp = zf[: o[1]], zf[o[1]:]
        # 4) traction recovery
        res_u = ru - self.Auu_full.matvec(zu) - self.BT_full.matvec(zp)
        zl = jnp.zeros_like(rl).at[self.iface_rows].set(res_u[self.uf])
        return jnp.concatenate([zu, zp, zd, zl])

    __call__ = apply


def _rows_to_identity(m: CsrMatrix, rows: np.ndarray) -> CsrMatrix:
    pat = m.pattern
    rmask = np.zeros(pat.n_rows, dtype=bool)
    rmask[rows] = True
    r = pat.rows_of_slots()
    in_r = rmask[r]
    is_diag = pat.indices == r
    zero = np.nonzero(in_r & ~is_diag)[0]
    diag = np.nonzero(in_r & is_diag)[0]
    data = m.data.at[jnp.asarray(zero)].set(0.0).at[jnp.asarray(diag)].set(1.0)
    return CsrMatrix(pat, data, m.dtype)


def _rows_to_zero(m: CsrMatrix, rows: np.ndarray) -> CsrMatrix:
    pat = m.pattern
    rmask = np.zeros(pat.n_rows, dtype=bool)
    rmask[rows] = True
    slots = np.nonzero(rmask[pat.rows_of_slots()])[0]
    return CsrMatrix(pat, m.data.at[jnp.asarray(slots)].set(0.0), m.dtype)
