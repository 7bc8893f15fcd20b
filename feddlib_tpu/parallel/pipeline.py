"""Device-resident distributed assembly→solve pipeline — no global matrix.

The scalable analog of the reference's end-to-end flow (SURVEY.md §3.1):
each rank assembles ITS elements into globally-indexed rows and an Export
reduces off-rank contributions to owners (FE_def.hpp:637-665 + Tpetra
Export); the global matrix never exists anywhere.  Here:

- the HOST builds integer-only symbolic plans once per (mesh partition,
  block structure): per-device owned-row CSR patterns (the union of every
  device's contributions into those rows), send/recv exchange plans for
  off-device element contributions, the per-device ELL layout with
  column-map-local columns, and the SpMV halo plan;
- the DEVICE program (one `shard_map` jit, reused across reassemblies)
  computes batched element kernels for every block of the system,
  segment-sums them into (local slots ++ send buffer), exchanges the send
  buffers over ICI, and emits each device's owned-row ELL values directly —
  a `DistributedCsr` is created with `from_parts`, values device-resident
  from birth.

Solution-dependent blocks (N(u), W(u)) gather their field through a
dedicated repeated-node halo plan, so Newton reassembly is a pure device
re-run of the same compiled program with the new solution shards.

Supports multi-variable block systems (Stokes/Navier-Stokes: the FROSch
MONOLITHIC system layout) with all variables discretised on one partitioned
mesh (P1 base or its P2 child — mixed P2/P1 allowed).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.fe import reference as ref
from feddlib_tpu.la.map import IndexMap
from feddlib_tpu.mesh.partition import MeshPartition
from feddlib_tpu.parallel.spmd import (
    AXIS, DeviceAxis, DistributedCsr, HaloPlan, _pad_stack)

f64 = jnp.float64


# ---------------------------------------------------------------------------
# merged dof map over one mesh partition (multi-block)
# ---------------------------------------------------------------------------


def p2_unique_map(part: MeshPartition, p2_mesh) -> IndexMap:
    """Unique node map of the P2 child mesh from the P1 partition: midpoint
    nodes are owned by the owner of their lower-numbered edge endpoint
    (deterministic arbitration, the buildUniqueMap analog for P2-of-P1,
    MeshUnstructured_def.hpp:129)."""
    n_p1 = part.mesh.n_points
    owner_p1 = part.unique_map.owner_of()
    mid_owner = owner_p1[p2_mesh.p2_edges.min(axis=1)]
    parts = []
    for p in range(part.n_parts):
        own_p1 = part.unique_map.partition_indices[p]
        own_mid = n_p1 + np.nonzero(mid_owner == p)[0]
        parts.append(np.sort(np.concatenate([own_p1, own_mid])))
    return IndexMap(p2_mesh.n_points, parts)


def _var_node_map(part: MeshPartition, dom) -> IndexMap:
    """Node map of `dom` relative to a partition: the partition's own
    unique map, or its P2 child's."""
    if dom.mesh is part.mesh:
        return part.unique_map
    if dom.parent_p1 is not None and dom.parent_p1.mesh is part.mesh:
        return p2_unique_map(part, dom.mesh)
    raise ValueError("variable does not live on this partitioned mesh "
                     "or its P2 child")


def merged_dof_map(part: MeshPartition, variables) -> Tuple[IndexMap, np.ndarray]:
    """Unique dof map of the merged block system: per block, the node map
    (P1 partition or its P2 child) × dofs_per_node (NodeWise), shifted by
    the block offset (the data FEDDLib feeds FROSch's monolithic path:
    per-block repeated maps + DofsPerNode, Preconditioner_def.hpp:295-383).
    Returns (map, offsets[n_blocks+1])."""
    sizes = [dom.n_dofs(dofs) for dom, dofs in variables]
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    n_parts = part.n_parts
    parts = [[] for _ in range(n_parts)]
    for b, (dom, dofs) in enumerate(variables):
        dmap = _var_node_map(part, dom).build_vec_field_map(dofs)
        for p in range(n_parts):
            parts[p].append(dmap.partition_indices[p] + offsets[b])
    merged = [np.sort(np.concatenate(lst)) for lst in parts]
    return IndexMap(int(offsets[-1]), merged), offsets


# ---------------------------------------------------------------------------
# block kernel registry
# ---------------------------------------------------------------------------


@dataclass
class _BlockDef:
    i: int
    j: int
    kind: str
    params: dict
    row_dofs: np.ndarray  # [E, nr] merged-global row dof ids
    col_dofs: np.ndarray  # [E, nc] merged-global col dof ids
    #: element fields the kernel consumes, in argument order: each entry
    #: is (variable index, source) with source "x" (solution slice) or
    #: "ext:<name>" (assemble(ext_fields=...)).  Single-field kinds
    #: (advection, hyperelastic, ...) have one entry.
    fields: List[Tuple[int, str]] = field(default_factory=list)
    mesh: int = 0         # element-mesh index (0 = main partition)
    geom: str = "current"  # "current" | "ref" (reference-configuration vc)

    @property
    def needs_field(self):  # back-compat single-field view
        return self.fields[0][0] if self.fields else None

    @property
    def field_src(self):
        return self.fields[0][1] if self.fields else "x"


@dataclass
class _CooBlockDef:
    """Constant COO entries (interface coupling identities C1/C1ᵀ/C2/C3ᵀ —
    FE_def.hpp:3294,3366: nodal identities between matched interface dofs;
    no element integral).  Contributed once by the row owner, folded into
    the owner-local patterns + a constant value vector."""

    keys: np.ndarray   # [n_entries] merged-global row*n_total + col
    vals: np.ndarray   # [n_entries]



def _exchange_rounds(send_keys, key_owner, dst_of, n_dev, pad_dst):
    """Edge-color the contribution-exchange neighbor graph into ppermute
    rounds (the SpMV-halo scheme applied to assembly sends).

    send_keys[q]: sorted unique keys device q must ship; key_owner(keys) →
    owning device per key; dst_of(p, keys) → destination local slots on p.
    Returns (meta [(perm, W)], sidx [rounds][n_dev, W], rdst [...])."""
    pair_pos = {}
    for q in range(n_dev):
        sk = send_keys[q]
        if not len(sk):
            continue
        ko = key_owner(sk)
        for p in np.unique(ko):
            if p == q:
                continue
            sel = np.flatnonzero(ko == p)
            pair_pos[(int(q), int(p))] = (sel, dst_of(int(p), sk[sel]))
    edges = sorted({tuple(sorted(e)) for e in pair_pos})
    color_of = {}
    used = [set() for _ in range(n_dev)]
    for e in edges:
        c = 0
        while c in used[e[0]] or c in used[e[1]]:
            c += 1
        color_of[e] = c
        used[e[0]].add(c)
        used[e[1]].add(c)
    n_rounds = 1 + max(color_of.values()) if color_of else 0
    meta, sidx_l, rdst_l = [], [], []
    for r in range(n_rounds):
        perm = []
        members = {}
        W = 1
        for e, c in color_of.items():
            if c != r:
                continue
            a, b = e
            perm += [(a, b), (b, a)]
            members[a] = b
            members[b] = a
            W = max(W,
                    len(pair_pos.get((a, b), ((), ()))[0]),
                    len(pair_pos.get((b, a), ((), ()))[0]))
        sidx = np.zeros((n_dev, W), np.int64)
        rdst = np.full((n_dev, W), pad_dst, np.int64)
        for q, p in members.items():
            snd = pair_pos.get((q, p))
            if snd is not None:
                sidx[q, : len(snd[0])] = snd[0]
            rcv = pair_pos.get((p, q))
            if rcv is not None:
                rdst[q, : len(rcv[1])] = rcv[1]
        meta.append((perm, W))
        sidx_l.append(jnp.asarray(sidx.astype(np.int32)))
        rdst_l.append(jnp.asarray(rdst.astype(np.int32)))
    return meta, sidx_l, rdst_l


def _block_eval(kind: str, dim: int, fe_r: str, fe_c: str, params: dict):
    """Returns fn(vc[, u_elem]) → [E, nr, nc] element matrices, flattened
    COO order (element, test, trial) row-major — matching the serial
    fe/ops.py constructions bit-for-bit in exact arithmetic."""
    if kind == "laplace":
        coeff = float(params.get("coeff", 1.0))
        if coeff == 1.0:
            return lambda vc: asm.elem_laplace(vc, dim, fe_r)
        return lambda vc: asm.elem_laplace(vc, dim, fe_r) * coeff
    if kind == "laplace_vec":
        visc = float(params.get("viscosity", 1.0))
        return lambda vc: asm.vectorize_elem_mat(
            asm.elem_laplace_vec(vc, dim, fe_r, visc))
    if kind == "laplace_vec_scaled":
        # per-element scalar weights (Geometry 'Distance Scaled Laplace',
        # Geometry_def.hpp:75-93) — weights ride as elem_data
        def f(vc, wd):
            K = asm.elem_laplace(vc, dim, fe_r) * wd[:, None, None]
            eye = jnp.eye(dim, dtype=f64)
            return asm.vectorize_elem_mat(
                jnp.einsum("eab,ij->eabij", K, eye))

        return f
    if kind == "ale_divergence":
        # ∫ (∇·w) φa φb expanded over components, scaled (FSI ALE term,
        # FE_def.hpp:3044; FSI_def.hpp:500) — w is an external field
        coeff = float(params.get("coeff", 1.0))
        eye = jnp.eye(dim, dtype=f64)

        def f(vc, we):
            D = asm.elem_ale_divergence(vc, we, dim, fe_r) * coeff
            return asm.vectorize_elem_mat(
                jnp.einsum("eab,ij->eabij", D, eye))

        return f
    if kind == "hyperelastic":
        # consistent tangent of the hyperelastic internal forces
        # (FE_def.hpp:6969,7259,7559 — AceGen tangents; here jax.hessian)
        material = params.get("material", "Neo-Hooke")
        mat_params = tuple(params.get("mat_params", (1.0, 1.0)))
        from feddlib_tpu.fe.hyperelastic import elem_hyper_residual_tangent

        def f(vc, de):
            _, K = elem_hyper_residual_tangent(vc, de, dim, fe_r,
                                               material, mat_params)
            return K

        return f
    if kind == "stress":
        visc = float(params.get("viscosity", 1.0))
        return lambda vc: asm.vectorize_elem_mat(
            asm.elem_stress_sym(vc, dim, fe_r, visc))
    if kind == "lin_elasticity":
        mu = float(params.get("mu", 1.0))
        lam = float(params.get("lam", 1.0))
        return lambda vc: asm.vectorize_elem_mat(
            asm.elem_lin_elasticity(vc, dim, fe_r, mu, lam))
    if kind == "mass":
        rho = float(params.get("coeff", 1.0))
        dpn = int(params.get("dofs_per_node", 1))
        eye = jnp.eye(dpn, dtype=f64)

        def f(vc):
            M = asm.elem_mass(vc, dim, fe_r) * rho
            if dpn > 1:
                return asm.vectorize_elem_mat(
                    jnp.einsum("eab,ij->eabij", M, eye))
            return M

        return f
    if kind == "divergence":  # rows = pressure (fe_r), cols = velocity
        coeff = float(params.get("coeff", 1.0))

        def f(vc):
            B = asm.elem_divergence(vc, dim, fe_c, fe_r)  # [E, nbp, nbu, d]
            return B.reshape(B.shape[0], B.shape[1], -1) * coeff

        return f
    if kind == "divergence_T":  # rows = velocity, cols = pressure (fe_c)
        coeff = float(params.get("coeff", 1.0))

        def f(vc):
            B = asm.elem_divergence(vc, dim, fe_r, fe_c)
            return B.transpose(0, 2, 3, 1).reshape(
                B.shape[0], B.shape[2] * B.shape[3], B.shape[1]) * coeff

        return f
    if kind == "bd_stab":
        return lambda vc: asm.elem_bd_stabilization(vc, dim, fe_r)
    if kind == "advection":  # N(u) expanded to vector dofs
        eye = jnp.eye(dim, dtype=f64)
        coeff = float(params.get("coeff", 1.0))  # density scaling of u

        def f(vc, ue):
            N = asm.elem_advection(vc, ue, dim, fe_r) * coeff
            return asm.vectorize_elem_mat(jnp.einsum("eab,ij->eabij", N, eye))

        return f
    if kind == "advection_in_u":  # W(u) Newton linearisation
        coeff = float(params.get("coeff", 1.0))

        def f(vc, ue):
            return asm.vectorize_elem_mat(
                asm.elem_advection_in_u(vc, ue, dim, fe_r)) * coeff

        return f
    if kind in ("shape_u", "shape_p"):
        # GI shape-derivative blocks ∂(fluid residual)/∂(mesh displacement)
        # differentiated INSIDE the device kernel (jax.jacfwd of the same
        # element residual the serial fe/shape_derivatives path uses) —
        # the reference's DK/DN/DW/DP/DM + divergence shape derivative
        # (FE_def.hpp:3410-4246, FSI_def.hpp:567-577).
        from feddlib_tpu.fe.shape_derivatives import _fluid_elem_residual

        fe_u = params["_fe_u"]
        fe_p = params["_fe_p"]
        mu = float(params.get("viscosity", 1.0))
        rho = float(params.get("density", 1.0))
        dt = float(params["dt"])
        mass_coef = float(params.get("mass_coef", 0.0))
        res = _fluid_elem_residual(dim, fe_u, fe_p, mu, rho, dt, mass_coef)
        want_u = kind == "shape_u"

        def f(vc_ref, u_e, p_e, g_e, gp_e, uo_e):
            p_e = p_e[..., 0]  # [E, nb_p, 1] → [E, nb_p]
            nbu = u_e.shape[1] * u_e.shape[2]

            def per_elem(rv, ue, pe, ge, gpe, uoe):
                def fr(gflat):
                    Ru, Rp = res(ue, pe, gflat.reshape(ge.shape), gpe,
                                 rv, uoe)
                    return jnp.concatenate([Ru.reshape(-1), Rp])

                J = jax.jacfwd(fr)(ge.reshape(-1))
                return J[:nbu] if want_u else J[nbu:]

            return jax.vmap(per_elem)(vc_ref, u_e, p_e, g_e, gp_e, uo_e)

        return f
    raise ValueError(f"unknown block kind {kind!r}")


# ---------------------------------------------------------------------------
# the pipeline
# ---------------------------------------------------------------------------


class DistributedPipeline:
    """Distributed block-system assembly over a MeshPartition.

    Usage:
        pipe = DistributedPipeline(part, [(dom_u, dim), (dom_p, 1)])
        pipe.add_block(0, 0, "stress", viscosity=1.0)
        pipe.add_block(0, 1, "divergence_T")
        pipe.add_block(1, 0, "divergence")
        pipe.finalize(axis)
        dmat = pipe.assemble()            # DistributedCsr, device-resident
        b    = pipe.assemble_rhs({0: f})  # [n_dev, N_o]
        dmat, b = pipe.apply_dirichlet(dmat, b, mask, g)
    """

    def __init__(self, part: MeshPartition, variables, n_free: int = 0,
                 aux_parts=None):
        """n_free > 0 appends that many element-less devices — the
        reference's dedicated coarse-solver ranks ('Mpi Ranks Coarse',
        Preconditioner_def.hpp:384-423): they own no matrix rows and serve
        the coarse level only.

        Multi-mesh systems (FSI fluid+solid — the reference's 'Mesh Rank
        Ranges', MeshPartitioner_def.hpp:61-120): `aux_parts` is a list of
        dicts {"part": MeshPartition, "range": (lo, hi)} placing that
        partition's local parts onto global devices [lo, hi).  Variable
        entries are then (Domain, dofs[, mesh_idx]) with mesh_idx 0 = the
        main partition, k >= 1 = aux_parts[k-1]; mesh-less variables
        (interface Lagrange multipliers λ) are {"extra": n_dofs,
        "owner": device}."""
        self.part = part
        self.aux_parts = list(aux_parts or [])
        for a in self.aux_parts:
            lo, hi = a["range"]
            if hi - lo != a["part"].n_parts:
                raise ValueError("aux rank range size != its part count")
        self.n_free = n_free
        base = max([part.n_parts]
                   + [a["range"][1] for a in self.aux_parts])
        self.n_dev = base + n_free
        # normalize variables: (dom, dofs) tuples; extras -> (None, n)
        self.variables = []
        self.var_mesh: List[Optional[int]] = []
        self.var_owner: List[int] = []
        for v in variables:
            if isinstance(v, dict):
                owner = int(v.get("owner", 0))
                if not (0 <= owner < base):
                    raise ValueError(
                        f"extra-variable owner {owner} outside the "
                        f"matrix-owning devices [0, {base}) (free coarse "
                        f"devices own no rows)")
                self.variables.append((None, int(v["extra"])))
                self.var_mesh.append(None)
                self.var_owner.append(owner)
            else:
                dom, dofs = v[0], int(v[1])
                m = int(v[2]) if len(v) > 2 else 0
                self.variables.append((dom, dofs))
                self.var_mesh.append(m)
                self.var_owner.append(-1)
        self.dof_map, self.offsets = self._build_dof_map()
        if n_free:
            self.dof_map = self.dof_map.with_free_parts(n_free)
        self.blocks: List[_BlockDef] = []
        self.coo_blocks: List[_CooBlockDef] = []
        self.row_weight_defs: Dict[int, np.ndarray] = {}
        self._final = False
        self._asm_fn = None
        self.dim = part.mesh.dim

    # -- mesh bookkeeping ----------------------------------------------------
    def _mesh_part(self, m: int) -> Tuple[MeshPartition, int, int]:
        """(partition, lo, hi) of mesh index m on the global device axis."""
        if m == 0:
            return self.part, 0, self.part.n_parts
        a = self.aux_parts[m - 1]
        return a["part"], a["range"][0], a["range"][1]

    def _n_meshes(self) -> int:
        return 1 + len(self.aux_parts)

    def _build_dof_map(self) -> Tuple[IndexMap, np.ndarray]:
        sizes = [dom.n_dofs(dofs) if dom is not None else dofs
                 for dom, dofs in self.variables]
        offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
        parts: List[list] = [[] for _ in range(self.n_dev - self.n_free)]
        for b, (dom, dofs) in enumerate(self.variables):
            off = offsets[b]
            if dom is None:
                parts[self.var_owner[b]].append(off + np.arange(dofs))
                continue
            mp, lo, hi = self._mesh_part(self.var_mesh[b])
            dmap = _var_node_map(mp, dom).build_vec_field_map(dofs)
            for q in range(lo, hi):
                parts[q].append(dmap.partition_indices[q - lo] + off)
        merged = [np.sort(np.concatenate(lst)) if lst
                  else np.zeros(0, np.int64) for lst in parts]
        return IndexMap(int(offsets[-1]), merged), offsets

    def _var_gmap(self, b: int) -> IndexMap:
        """Variable b's unique node-dof map over the GLOBAL device axis
        (0-based within the block)."""
        dom, dofs = self.variables[b]
        if dom is None:
            parts = [np.arange(dofs) if q == self.var_owner[b]
                     else np.zeros(0, np.int64) for q in range(self.n_dev)]
            return IndexMap(dofs, parts)
        mp, lo, hi = self._mesh_part(self.var_mesh[b])
        dmap = _var_node_map(mp, dom).build_vec_field_map(dofs)
        parts = [dmap.partition_indices[q - lo] if lo <= q < hi
                 else np.zeros(0, np.int64) for q in range(self.n_dev)]
        return IndexMap(dmap.n_global, parts)

    def _eids(self, q: int, m: int = 0) -> np.ndarray:
        mp, lo, hi = self._mesh_part(m)
        if not (lo <= q < hi):
            return np.zeros(0, np.int64)
        return mp.elem_ids[q - lo]

    # -- registration --------------------------------------------------------
    def add_block(self, i: int, j: int, kind: str, **params) -> None:
        if self._final:
            raise RuntimeError("pipeline already finalized")
        dom_i, dofs_i = self.variables[i]
        dom_j, dofs_j = self.variables[j]
        if dom_i is None or dom_j is None:
            raise ValueError("element blocks need mesh variables; use "
                             "add_coo_block for coupling entries")
        if self.var_mesh[i] != self.var_mesh[j]:
            raise ValueError("element block variables must share a mesh")
        rows = dom_i.elem_dofs(dofs_i) + self.offsets[i]
        cols = dom_j.elem_dofs(dofs_j) + self.offsets[j]
        fields: List[Tuple[int, str]] = []
        if kind in ("advection", "advection_in_u", "ale_divergence",
                    "hyperelastic"):
            # the field rides in the COLUMN variable's space; an external
            # source name ("ext:w") reads it from assemble(ext_fields=...)
            fields = [(int(params.pop("field_var", j)),
                       params.pop("field_src", "x"))]
        elif kind in ("shape_u", "shape_p"):
            # GI shape derivatives consume (u, p, g, g_prev, u_old);
            # g = the column variable, u/p from u_var/p_var
            uvar = int(params.pop("u_var", 0))
            pvar = int(params.pop("p_var", 1))
            gvar = int(params.pop("g_var", j))
            fields = [(uvar, "x"), (pvar, "x"), (gvar, "x"),
                      (gvar, params.pop("gp_src", "ext:gp")),
                      (uvar, params.pop("uold_src", "ext:uold"))]
            params["_fe_u"] = self.variables[uvar][0].fe_type
            params["_fe_p"] = self.variables[pvar][0].fe_type
        geom = params.pop("geom",
                          "ref" if kind in ("shape_u", "shape_p")
                          else "current")
        rw = params.pop("row_weights", None)
        if rw is not None:
            # per-row 0/1 weights in the ROW variable's block-local dof
            # space (BC-structured rows: keep interior element rows, drop
            # boundary ones — the GI geometry block's built-in Dirichlet)
            self.row_weight_defs[len(self.blocks)] = np.asarray(
                rw, dtype=np.float64)
        self.blocks.append(_BlockDef(i, j, kind, params, rows, cols, fields,
                                     self.var_mesh[i], geom))

    def add_coo_block(self, i: int, j: int, rows: np.ndarray,
                      cols: np.ndarray, vals: np.ndarray) -> None:
        """Constant coupling entries at (block-local rows of var i,
        block-local cols of var j) — the FSI interface identities C1/C1ᵀ/
        C2/C3ᵀ (FE_def.hpp:3294,3366).  Values are constants of the plan
        (rebuilt only when the pipeline is)."""
        if self._final:
            raise RuntimeError("pipeline already finalized")
        n_total = int(self.offsets[-1])
        gk = ((np.asarray(rows, np.int64) + self.offsets[i]) * n_total
              + np.asarray(cols, np.int64) + self.offsets[j])
        self.coo_blocks.append(_CooBlockDef(gk, np.asarray(vals, np.float64)))

    # -- symbolic phase --------------------------------------------------------
    def finalize(self, axis: Optional[DeviceAxis] = None) -> None:
        if self._final:
            return
        part, n_dev = self.part, self.n_dev
        mesh = part.mesh
        owner = self.dof_map.owner_of()
        n_total = self.dof_map.n_global
        self.axis = axis or DeviceAxis.make(n_dev)
        n_mesh = self._n_meshes()

        # ------- global symbolic COO (integers only; the host-side analog
        # of every rank reading the whole mesh, MeshPartitioner_decl.hpp) ----
        keys_per_block = []
        for blk in self.blocks:
            E, nr = blk.row_dofs.shape
            nc = blk.col_dofs.shape[1]
            r = np.broadcast_to(blk.row_dofs[:, :, None], (E, nr, nc))
            c = np.broadcast_to(blk.col_dofs[:, None, :], (E, nr, nc))
            keys_per_block.append((r.reshape(E, -1).astype(np.int64) * n_total
                                   + c.reshape(E, -1)))
        coo_keys = (np.concatenate([cb.keys for cb in self.coo_blocks])
                    if self.coo_blocks else np.zeros(0, np.int64))
        coo_vals = (np.concatenate([cb.vals for cb in self.coo_blocks])
                    if self.coo_blocks else np.zeros(0))

        # ------- per-device owned-row local CSR patterns --------------------
        # pattern of device p = unique (row, col) over ALL devices'
        # contributions whose row is owned by p (+ constant coupling keys)
        all_keys = np.concatenate([k.reshape(-1) for k in keys_per_block]
                                  + [coo_keys])
        all_rows = all_keys // n_total
        key_owner = owner[all_rows]
        loc_patterns = []  # per device: sorted unique keys (row-major order)
        for p in range(n_dev):
            loc_patterns.append(np.unique(all_keys[key_owner == p]))
        del all_keys, all_rows, key_owner
        self.L = max(max((len(k) for k in loc_patterns), default=0), 1)

        # constant coupling values per device (owner-contributed; no
        # exchange needed): const_vals [n_dev, L]
        cdense = np.zeros((n_dev, self.L))
        if len(coo_keys):
            co = owner[coo_keys // n_total]
            for p in range(n_dev):
                sel = co == p
                slots = np.searchsorted(loc_patterns[p], coo_keys[sel])
                np.add.at(cdense[p], slots, coo_vals[sel])
        self.const_vals = jnp.asarray(cdense)

        # ------- send plans: device q's contributions to remote rows --------
        # send list of q = sorted unique keys of q's remote contributions
        send_keys: List[np.ndarray] = []
        seg_l: List[np.ndarray] = []
        E_max_m = []
        for m in range(n_mesh):
            mp, _, _ = self._mesh_part(m)
            E_max_m.append(int(mp.element_map.local_sizes.max()))
        self.E_max_m = E_max_m
        self.E_max = E_max_m[0]
        for q in range(n_dev):
            mine_l = []
            for blk, k in zip(self.blocks, keys_per_block):
                eids = self._eids(q, blk.mesh)
                if len(eids):
                    mine_l.append(k[eids].reshape(-1))
            mine = (np.concatenate(mine_l) if mine_l
                    else np.zeros(0, np.int64))
            rows_q = mine // n_total
            remote = owner[rows_q] != q
            sk = np.unique(mine[remote])
            send_keys.append(sk)
            # segment target per raw contribution: local slot or L + send slot
            loc_slot = np.searchsorted(loc_patterns[q], mine)
            snd_slot = np.searchsorted(sk, mine)
            seg = np.where(remote, self.L + snd_slot, loc_slot)
            seg_l.append(seg)
        self.S = max(max((len(s) for s in send_keys), default=0), 1)

        # stack seg plans [n_dev, Σ_b E_max(mesh_b)·w_b] — blocks
        # concatenated in ELEMENT-MAJOR order per block.  Pad elements
        # (beyond E_q) scatter into the dump slot L + S.
        dump = self.L + self.S
        plan_len = sum(E_max_m[blk.mesh] * k.shape[1]
                       for blk, k in zip(self.blocks, keys_per_block))
        seg_stacked = np.full((n_dev, max(plan_len, 1)), dump, np.int64)
        for q in range(n_dev):
            pos = 0
            spos = 0
            for blk, keys in zip(self.blocks, keys_per_block):
                w = keys.shape[1]
                Eq = len(self._eids(q, blk.mesh))
                seg_stacked[q, pos: pos + Eq * w] = \
                    seg_l[q][spos: spos + Eq * w]
                pos += E_max_m[blk.mesh] * w
                spos += Eq * w
        self.seg_ids = jnp.asarray(seg_stacked.astype(np.int32))

        # ------- contribution exchange: NEIGHBOR-WISE ppermute rounds -------
        # (round 3 used one all_gather of the [n_dev, S] send buffers —
        # O(n_dev·S) per device per reassembly; like the SpMV halo, the
        # partition neighbor graph is edge-colored and each color moves
        # only that pair's contributions, O(local cut) per Newton step)
        self._xc_meta, self._xc_sidx, self._xc_rdst = _exchange_rounds(
            send_keys, lambda sk: owner[sk // n_total],
            lambda p, sk: np.searchsorted(loc_patterns[p], sk),
            n_dev, self.L)

        # ------- ELL layout + halo plan --------------------------------------
        N_o = self.dof_map.max_local_size
        self.N_o = N_o
        col_gids: List[np.ndarray] = []
        K = 1
        ell_src_l, ell_cols_l = [], []
        csr_meta = []
        for p in range(n_dev):
            owned = self.dof_map.partition_indices[p]
            keys = loc_patterns[p]
            rows = keys // n_total
            cols = keys % n_total
            ghosts = np.setdiff1d(np.unique(cols), owned)
            col_gids.append(np.concatenate([owned, ghosts]))
            from feddlib_tpu.parallel.spmd import _col_local_ids

            # owned-local row index per slot (keys sorted ⇒ rows ascending,
            # but owned rows may have NO slots — map via searchsorted)
            r_loc = np.searchsorted(owned, rows)
            lens = np.bincount(r_loc, minlength=len(owned))
            K = max(K, int(lens.max()) if len(lens) else 1)
            csr_meta.append((r_loc, _col_local_ids(owned, ghosts, cols, N_o),
                             lens))
        self.K = K
        self.row_lens = np.zeros((n_dev, N_o), dtype=np.int64)
        for p in range(n_dev):
            r_loc, c_loc, lens = csr_meta[p]
            self.row_lens[p, : len(lens)] = lens
            ec = np.zeros((K, N_o), dtype=np.int32)
            es = np.full((K, N_o), self.L, dtype=np.int64)  # → zero slot
            starts = np.concatenate([[0], np.cumsum(lens)])
            kk = np.arange(len(r_loc)) - starts[r_loc]
            ec[kk, r_loc] = c_loc
            es[kk, r_loc] = np.arange(len(r_loc))
            ell_cols_l.append(ec)
            ell_src_l.append(es)
        self.ell_cols = jnp.asarray(np.stack(ell_cols_l))
        self.ell_src = jnp.asarray(np.stack(ell_src_l).astype(np.int32))
        self.col_gids = col_gids
        self.plan = HaloPlan(self.dof_map, col_gids)

        # ------- geometry (per mesh) + per-element data + field plans -------
        self.mesh_vc = []
        self.mesh_valid = []
        for m in range(n_mesh):
            mp, _, _ = self._mesh_part(m)
            msh = mp.mesh
            nv = msh.vertices_per_element
            vc = np.zeros((n_dev, E_max_m[m], nv, msh.dim))
            valid = np.zeros((n_dev, E_max_m[m]))
            for q in range(n_dev):
                eids = self._eids(q, m)
                Eq = len(eids)
                vc[q, :Eq] = msh.points[msh.elements[eids][:, :nv]]
                vc[q, Eq:] = msh.points[msh.elements[0][:nv]]
                valid[q, :Eq] = 1.0
            self.mesh_vc.append(jnp.asarray(vc))
            self.mesh_valid.append(jnp.asarray(valid))
        self.vert_coords = self.mesh_vc[0]   # back-compat alias (mesh 0)
        self.valid = self.mesh_valid[0]

        # reference-configuration coordinates for geom="ref" blocks (GI
        # shape derivatives differentiate around the REFERENCE mesh; the
        # partitioned base mesh never moves, so its points are the
        # reference unless it carries an explicit ref_points)
        self._ref_meshes = sorted({blk.mesh for blk in self.blocks
                                   if blk.geom == "ref"})
        self.mesh_vc_ref = {}
        for m in self._ref_meshes:
            mp, _, _ = self._mesh_part(m)
            msh = mp.mesh
            pts = (msh.ref_points
                   if getattr(msh, "ref_points", None) is not None
                   else msh.points)
            self.mesh_vc_ref[m] = self.mesh_vert_coords(m, pts)

        # per-block row weights [n_dev, E_max, nr]
        self.row_wts = {}
        for bi, rw in self.row_weight_defs.items():
            blk = self.blocks[bi]
            wt_e = rw[blk.row_dofs - self.offsets[blk.i]]  # [E, nr]
            out = np.zeros((n_dev, E_max_m[blk.mesh], wt_e.shape[1]))
            for q in range(n_dev):
                eids = self._eids(q, blk.mesh)
                out[q, : len(eids)] = wt_e[eids]
            self.row_wts[bi] = jnp.asarray(out)

        # per-element static data ("elem_data" param) sharded per block
        self.elem_data = {}
        for bi, blk in enumerate(self.blocks):
            wd = blk.params.get("elem_data")
            if wd is None:
                continue
            wd = np.asarray(wd, dtype=np.float64)
            out = np.zeros((n_dev, E_max_m[blk.mesh]))
            for q in range(n_dev):
                eids = self._eids(q, blk.mesh)
                out[q, : len(eids)] = wd[eids]
            self.elem_data[bi] = jnp.asarray(out)

        # field plans (one per distinct field variable among blocks)
        self.field_plans: Dict[int, dict] = {}
        for blk in self.blocks:
            for b, _src in blk.fields:
                self._build_field_plan(b)

        self._final = True

    def _build_field_plan(self, b: int) -> None:
        """Halo plan delivering variable b's repeated-node values to each
        device (the reference's u_rep_, NavierStokes_decl.hpp:102)."""
        if b in self.field_plans:
            return
        n_dev = self.n_dev
        dom, dofs = self.variables[b]
        off = int(self.offsets[b])
        mesh_b = self.var_mesh[b]
        # variable-b unique dof map over the GLOBAL device axis
        bmap = self._var_gmap(b)
        # repeated dofs per device = dofs of nodes of local elements
        rep_dofs, elem_idx_l = [], []
        E_max = self.E_max_m[mesh_b]
        nb = dom.n_basis()
        for q in range(n_dev):
            eids = self._eids(q, mesh_b)
            nodes = np.unique(dom.mesh.elements[eids]) if len(eids) \
                else np.zeros(0, np.int64)
            rd = (nodes[:, None] * dofs + np.arange(dofs)[None, :]).reshape(-1)
            owned = bmap.partition_indices[q]
            ghosts = np.setdiff1d(rd, owned)
            rep_dofs.append(np.concatenate([owned, ghosts]))
        fplan = HaloPlan(bmap, rep_dofs)
        N_ob = fplan.N_o
        # per-device: positions of owned block-b dofs inside the merged
        # owned list, and element-node gather indices into the field column
        # vector [N_ob + G_b]
        pos_l, eidx_l = [], []
        for q in range(n_dev):
            owned_merged = self.dof_map.partition_indices[q]
            owned_b = bmap.partition_indices[q]
            pos = np.searchsorted(owned_merged, owned_b + off)
            pos_pad = np.zeros(N_ob, dtype=np.int64)
            pos_pad[: len(pos)] = pos
            pos_l.append(pos_pad)
            # block-b dof gid → field col-map local via sorted lookups
            from feddlib_tpu.parallel.spmd import _col_local_ids

            cg = rep_dofs[q]
            owned_set, ghost_set = cg[: len(owned_b)], cg[len(owned_b):]
            eids = self._eids(q, mesh_b)
            en = dom.mesh.elements[eids]  # [Eq, nb]
            ed = (en[:, :, None] * dofs
                  + np.arange(dofs)[None, None, :])  # [Eq, nb, dofs]
            full = np.zeros((E_max, nb, dofs), dtype=np.int64)
            if len(eids):
                full[: len(eids)] = _col_local_ids(
                    owned_set, ghost_set, ed.reshape(-1),
                    N_ob).reshape(ed.shape)
            eidx_l.append(full)
        mask = (np.arange(N_ob)[None, :]
                < bmap.local_sizes[:, None]).astype(np.float64)
        self.field_plans[b] = dict(
            plan=fplan,
            pos=jnp.asarray(np.stack(pos_l).astype(np.int32)),
            mask=jnp.asarray(mask),
            elem_idx=jnp.asarray(np.stack(eidx_l).astype(np.int32)),
            dofs=self.variables[b][1])

    # -- numeric phase ---------------------------------------------------------
    def _program(self):
        """Build (once) the jitted shard_map assembly program."""
        if self._asm_fn is not None:
            return self._asm_fn
        L, S, K, N_o = self.L, self.S, self.K, self.N_o
        n_mesh = self._n_meshes()
        evals = []
        for blk in self.blocks:
            dom_i, _ = self.variables[blk.i]
            dom_j, _ = self.variables[blk.j]
            dim_b = dom_i.dim
            evals.append(_block_eval(blk.kind, dim_b, dom_i.fe_type,
                                     dom_j.fe_type, blk.params))
        blocks = self.blocks
        field_ids = sorted(self.field_plans.keys())
        # external field names in deterministic order
        ext_names = sorted({src[4:] for blk in blocks
                            for _b, src in blk.fields
                            if src.startswith("ext:")})
        data_ids = sorted(self.elem_data.keys())
        rw_ids = sorted(self.row_wts.keys())
        ref_meshes = list(self._ref_meshes)
        fplans = [self.field_plans[b] for b in field_ids]
        importers = [fp["plan"].importer() for fp in fplans]

        xc_meta = self._xc_meta

        def prog(seg, xc_sidx, xc_rdst, ell_src, cvals, x, *rest):
            seg = seg[0]
            xc_sidx = jax.tree.map(lambda a: a[0], xc_sidx)
            xc_rdst = jax.tree.map(lambda a: a[0], xc_rdst)
            ell_src = ell_src[0]
            cvals = cvals[0]
            x = x[0]
            pos = 0
            vcs = [rest[pos + 2 * m][0] for m in range(n_mesh)]
            valids = [rest[pos + 2 * m + 1][0] for m in range(n_mesh)]
            pos += 2 * n_mesh
            vcs_ref = {}
            for m in ref_meshes:
                vcs_ref[m] = rest[pos][0]
                pos += 1
            rwts = {}
            for bi in rw_ids:
                rwts[bi] = rest[pos][0]
                pos += 1
            edata = {}
            for bi in data_ids:
                edata[bi] = rest[pos][0]
                pos += 1
            exts = {}
            for nm in ext_names:
                exts[nm] = rest[pos][0]
                pos += 1
            # gather fields (repeated element values) through their halos —
            # once per (variable, source): externals get their own gather
            u_elems = {}
            for fi, b in enumerate(field_ids):
                pos_b, mask_b, eidx, himp = rest[pos: pos + 4]
                pos += 4
                pos_b, mask_b, eidx = pos_b[0], mask_b[0], eidx[0]
                himp = jax.tree.map(lambda a: a[0], himp)
                u_own = x[pos_b] * mask_b
                srcs = {src for blk in blocks for bb, src in blk.fields
                        if bb == b}
                for src in srcs:
                    own = (u_own if src == "x"
                           else exts[src[4:]][: mask_b.shape[0]] * mask_b)
                    u_col = importers[fi](own, himp)
                    u_elems[(b, src)] = u_col[eidx]  # [E_max, nb, dofs]

            vals = []
            for bi, (blk, ev) in enumerate(zip(blocks, evals)):
                vc_b = (vcs_ref[blk.mesh] if blk.geom == "ref"
                        else vcs[blk.mesh])
                valid_b = valids[blk.mesh]
                args = [vc_b]
                for fspec in blk.fields:
                    args.append(u_elems[fspec])
                if bi in edata:
                    args.append(edata[bi])
                v = ev(*args)
                if bi in rwts:
                    v = v * rwts[bi][:, :, None]
                vals.append((v * valid_b[:, None, None]).reshape(-1))
            flat = jnp.concatenate(vals)
            acc = jax.ops.segment_sum(flat, seg, num_segments=L + S + 1)
            local, send = acc[:L], acc[L: L + S]
            # neighbor-wise exchange: one ppermute per edge color, each
            # moving only that pair's contributions (O(local cut))
            add = jnp.zeros(L + 1, local.dtype)
            for (perm, _W), si, rd in zip(xc_meta, xc_sidx, xc_rdst):
                got = lax.ppermute(send[si], AXIS, perm)
                add = add + jax.ops.segment_sum(got, rd,
                                                num_segments=L + 1)
            data = jnp.concatenate([local + add[:L] + cvals,
                                    jnp.zeros(1, local.dtype)])
            return data[ell_src.reshape(-1)].reshape(K, N_o)[None]

        n_rest = (2 * n_mesh + len(ref_meshes) + len(rw_ids)
                  + len(data_ids) + len(ext_names) + 4 * len(field_ids))
        in_specs = tuple([P(AXIS)] * (6 + n_rest))
        self._asm_fn = jax.jit(self.axis.shard_map(prog, in_specs, P(AXIS)))
        self._field_ids = field_ids
        self._ext_names = ext_names
        self._data_ids = data_ids
        self._rw_ids = rw_ids
        return self._asm_fn

    def assemble(self, x: Optional[jnp.ndarray] = None,
                 ext_fields: Optional[Dict[str, jnp.ndarray]] = None,
                 vert_coords: Optional[Dict[int, jnp.ndarray]] = None
                 ) -> DistributedCsr:
        """Run the device assembly program → DistributedCsr.  `x` is the
        merged distributed solution [n_dev, N_o] (for N(u)/W(u) blocks);
        zeros if omitted.  `ext_fields` maps external field names (blocks
        registered with field_src='ext:<name>') to OWNED per-variable
        arrays [n_dev, N_ob]; `vert_coords` optionally overrides a mesh's
        vertex coordinates [n_dev, E_max_m, nv, dim] (moved/ALE meshes)."""
        if not self._final:
            self.finalize()
        f = self._program()
        if x is None:
            x = jnp.zeros((self.n_dev, self.N_o), f64)
        rest = []
        for m in range(self._n_meshes()):
            vc = (vert_coords or {}).get(m, self.mesh_vc[m])
            rest += [vc, self.mesh_valid[m]]
        for m in self._ref_meshes:
            rest.append(self.mesh_vc_ref[m])
        for bi in self._rw_ids:
            rest.append(self.row_wts[bi])
        for bi in self._data_ids:
            rest.append(self.elem_data[bi])
        for nm in self._ext_names:
            if ext_fields is None or nm not in ext_fields:
                raise ValueError(f"missing external field {nm!r}")
            rest.append(ext_fields[nm])
        for b in self._field_ids:
            fp = self.field_plans[b]
            rest += [fp["pos"], fp["mask"], fp["elem_idx"],
                     fp["plan"].import_arrays]
        ell_data = f(self.seg_ids, tuple(self._xc_sidx),
                     tuple(self._xc_rdst), self.ell_src, self.const_vals,
                     x, *rest)
        return DistributedCsr.from_parts(self.dof_map, self.col_gids,
                                         self.ell_cols, ell_data, self.K,
                                         plan=self.plan,
                                         row_lens=self.row_lens)

    def mesh_vert_coords(self, m: int, points: np.ndarray) -> jnp.ndarray:
        """[n_dev, E_max_m, nv, dim] vertex-coordinate array for mesh m
        from an overriding point set (moved/ALE meshes; Mesh::moveMesh,
        Mesh_decl.hpp:116) — feed to assemble(vert_coords={m: ...}).  The
        symbolic plans are coordinate-independent, so no rebuild."""
        mp, _, _ = self._mesh_part(m)
        msh = mp.mesh
        nv = msh.vertices_per_element
        pts = np.asarray(points)
        vc = np.zeros((self.n_dev, self.E_max_m[m], nv, msh.dim))
        for q in range(self.n_dev):
            eids = self._eids(q, m)
            Eq = len(eids)
            if Eq:
                vc[q, :Eq] = pts[msh.elements[eids][:, :nv]]
            vc[q, Eq:] = pts[msh.elements[0][:nv]]
        return jnp.asarray(vc)

    # -- RHS -------------------------------------------------------------------
    def assemble_rhs(self, sources: Dict[int, Callable]) -> jnp.ndarray:
        """Volume sources per block → merged distributed RHS [n_dev, N_o].
        f(x) → scalar (dofs=1) or [dofs].  One-shot (jit per call)."""
        if not self._final:
            self.finalize()
        part, n_dev = self.part, self.n_dev
        owner = self.dof_map.owner_of()
        out = np.zeros((n_dev, self.N_o))
        for b, fsrc in sources.items():
            dom, dofs = self.variables[b]
            off = int(self.offsets[b])
            mb = self.var_mesh[b]
            mp, _, _ = self._mesh_part(mb)
            msh = mp.mesh
            for q in range(n_dev):
                eids = self._eids(q, mb)
                if not len(eids):
                    continue
                nv = msh.vertices_per_element
                vcq = jnp.asarray(
                    msh.points[msh.elements[eids][:, :nv]])
                vec = asm.elem_rhs(vcq, dom.dim, dom.fe_type, fsrc,
                                   n_comp=dofs)
                en = dom.mesh.elements[eids]
                if dofs > 1:
                    ids = (en[:, :, None] * dofs
                           + np.arange(dofs)[None, None, :]).reshape(-1)
                else:
                    ids = en.reshape(-1)
                contrib = np.zeros(self.dof_map.n_global)
                np.add.at(contrib, ids + off, np.asarray(vec).reshape(-1))
                nzg = np.nonzero(contrib)[0]
                # add into owner shards (host-side one-shot; RHS assembly is
                # setup, not the hot loop)
                for g in np.unique(owner[nzg]):
                    sel = nzg[owner[nzg] == g]
                    loc = np.searchsorted(self.dof_map.partition_indices[g],
                                          sel)
                    out[g, loc] += contrib[sel]
        return jnp.asarray(out)

    # -- device-side RHS (volume + Neumann surface loads) ---------------------
    def add_rhs(self, b: int, fn: Callable) -> None:
        """Register a volume source for variable b: fn(x [dim], t) →
        scalar (dofs=1) or [dofs].  Assembled fully ON DEVICE by
        `assemble_rhs_device(t)` — time-dependent loads reassemble with no
        host sync (FE::assemblyRHS, FE_def.hpp:4694)."""
        self._rhs_defs = getattr(self, "_rhs_defs", [])
        self._rhs_defs.append((b, fn, None))
        self._rhs_fn = None

    def add_surface_rhs(self, b: int, fn: Callable, flag: int) -> None:
        """Register a Neumann surface load on variable b's mesh boundary
        entities with `flag`: fn(x, t) → scalar or [dofs]
        (FE::assemblySurfaceIntegral, FE_def.hpp:4511)."""
        self._rhs_defs = getattr(self, "_rhs_defs", [])
        self._rhs_defs.append((b, fn, int(flag)))
        self._rhs_fn = None

    def _rhs_plans(self):
        """Symbolic phase for the device RHS program: per-def sharded
        geometry + a contribution seg/exchange plan (rows only)."""
        if getattr(self, "_rhs_meta", None) is not None:
            return self._rhs_meta
        if not self._final:
            self.finalize()
        n_dev = self.n_dev
        owner = self.dof_map.owner_of()
        defs = getattr(self, "_rhs_defs", [])
        # per def, per device: contribution dof lists + geometry
        geo = []       # per def: (vc [n_dev, Emax, nv, dim], valid, dofs)
        dof_lists = [[] for _ in range(n_dev)]  # per device: per-def dofs
        for b, fn, flag in defs:
            dom, dofs = self.variables[b]
            off = int(self.offsets[b])
            m = self.var_mesh[b]
            mp, lo, hi = self._mesh_part(m)
            msh = mp.mesh
            if flag is None:
                E_max = self.E_max_m[m]
                nv = msh.vertices_per_element
                vc = np.zeros((n_dev, E_max, nv, msh.dim))
                valid = np.zeros((n_dev, E_max))
                rows = np.zeros((n_dev, E_max, dom.n_basis() * dofs),
                                np.int64)
                for q in range(n_dev):
                    eids = self._eids(q, m)
                    Eq = len(eids)
                    vc[q, :Eq] = msh.points[msh.elements[eids][:, :nv]]
                    vc[q, Eq:] = msh.points[msh.elements[0][:nv]]
                    valid[q, :Eq] = 1.0
                    if Eq:
                        ed = dom.elem_dofs(dofs)[eids] + off
                        rows[q, :Eq] = ed
            else:
                if msh.surfaces is None:
                    raise ValueError("mesh has no surface entities")
                sel = np.flatnonzero(msh.surface_flags == flag)
                surfs = msh.surfaces[sel]
                nsv = msh.dim  # vertices of the surface simplex
                nbs = surfs.shape[1] if len(surfs) else nsv
                # assign each surface to the device owning its min node
                nmap = _var_node_map(mp, dom)
                nowner = np.full(dom.mesh.n_points, -1, np.int64)
                for pq in range(mp.n_parts):
                    nowner[nmap.partition_indices[pq]] = lo + pq
                sdev = (nowner[surfs.min(axis=1)] if len(surfs)
                        else np.zeros(0, np.int64))
                S_max = max(int(np.bincount(
                    sdev, minlength=n_dev).max()) if len(surfs) else 0, 1)
                vc = np.zeros((n_dev, S_max, nsv, msh.dim))
                valid = np.zeros((n_dev, S_max))
                rows = np.zeros((n_dev, S_max, nbs * dofs), np.int64)
                for q in range(n_dev):
                    mine = surfs[sdev == q]
                    Sq = len(mine)
                    if Sq:
                        vc[q, :Sq] = msh.points[mine[:, :nsv]]
                        valid[q, :Sq] = 1.0
                        sd = (mine[:, :, None] * dofs
                              + np.arange(dofs)[None, None, :])
                        rows[q, :Sq] = sd.reshape(Sq, -1) + off
                    vc[q, Sq:] = msh.points[
                        (msh.surfaces[0] if len(msh.surfaces)
                         else msh.elements[0][:nsv])[:nsv]]
            geo.append((jnp.asarray(vc), jnp.asarray(valid), dofs))
            for q in range(n_dev):
                dof_lists[q].append(rows[q].reshape(-1))

        # seg plans: local owned position or N_o + send slot
        N_o = self.N_o
        send_keys, segs = [], []
        for q in range(n_dev):
            allk = (np.concatenate(dof_lists[q]) if dof_lists[q]
                    else np.zeros(0, np.int64))
            owned = self.dof_map.partition_indices[q]
            pos = np.searchsorted(owned, allk)
            pos_c = np.minimum(pos, max(len(owned) - 1, 0))
            is_own = (owned[pos_c] == allk) if len(owned) else \
                np.zeros(len(allk), bool)
            sk = np.unique(allk[~is_own])
            send_keys.append(sk)
            seg = np.where(is_own, pos_c,
                           N_o + np.searchsorted(sk, allk))
            segs.append(seg)
        S_r = max(max((len(s) for s in send_keys), default=0), 1)
        seg_stacked = _pad_stack(
            [np.where(s >= N_o, np.minimum(s, N_o + S_r), s) for s in segs],
            N_o + S_r, dtype=np.int64)
        # recv: neighbor-wise ppermute rounds (same scheme as the matrix
        # exchange — the RHS reassembles every time step)
        owned_lists = self.dof_map.partition_indices
        r_meta, r_sidx, r_rdst = _exchange_rounds(
            send_keys, lambda sk: owner[sk],
            lambda p, sk: np.searchsorted(owned_lists[p], sk),
            n_dev, N_o)
        meta = dict(
            geo=geo,
            seg=jnp.asarray(seg_stacked.astype(np.int32)),
            xc_meta=r_meta, xc_sidx=tuple(r_sidx), xc_rdst=tuple(r_rdst),
            S_r=S_r)
        self._rhs_meta = meta
        return meta

    def assemble_rhs_device(self, t: float = 0.0) -> jnp.ndarray:
        """Run the device RHS program at time t → [n_dev, N_o].  The
        program is compiled once; per-step reassembly is a pure device
        re-run with the new (traced) t."""
        meta = self._rhs_plans()
        defs = getattr(self, "_rhs_defs", [])
        if self._rhs_fn is None:
            N_o, S_r = self.N_o, meta["S_r"]
            geo_meta = [(self.variables[b][0].dim,
                         self.variables[b][0].fe_type, dofs, fn, flag)
                        for (b, fn, flag), (_, _, dofs)
                        in zip(defs, meta["geo"])]

            xc_meta = meta["xc_meta"]

            def prog(t, seg, xc_sidx, xc_rdst, *geo_arrs):
                seg = seg[0]
                xc_sidx = jax.tree.map(lambda a: a[0], xc_sidx)
                xc_rdst = jax.tree.map(lambda a: a[0], xc_rdst)
                flats = []
                for (dim_b, fe_b, dofs, fn, flag), i in zip(
                        geo_meta, range(len(geo_meta))):
                    vc, valid = geo_arrs[2 * i][0], geo_arrs[2 * i + 1][0]
                    src = (lambda f: (lambda x: f(x, t)))(fn)
                    if flag is None:
                        vec = asm.elem_rhs(vc, dim_b, fe_b, src,
                                           n_comp=dofs)
                    else:
                        vec = asm.elem_surface_rhs(vc, dim_b, fe_b, src)
                    v = vec * (valid[:, None, None] if vec.ndim == 3
                               else valid[:, None])
                    flats.append(v.reshape(-1))
                flat = jnp.concatenate(flats)
                acc = jax.ops.segment_sum(flat, seg,
                                          num_segments=N_o + S_r + 1)
                local, send = acc[:N_o], acc[N_o:N_o + S_r]
                add = jnp.zeros(N_o + 1, local.dtype)
                for (perm, _W), si, rd in zip(xc_meta, xc_sidx, xc_rdst):
                    got = lax.ppermute(send[si], AXIS, perm)
                    add = add + jax.ops.segment_sum(
                        got, rd, num_segments=N_o + 1)
                return (local + add[:N_o])[None]

            n_geo = 2 * len(defs)
            in_specs = tuple([P()] + [P(AXIS)] * (3 + n_geo))
            self._rhs_fn = jax.jit(
                self.axis.shard_map(prog, in_specs, P(AXIS)))
        geo_arrs = []
        for vc, valid, _ in meta["geo"]:
            geo_arrs += [vc, valid]
        return self._rhs_fn(jnp.asarray(float(t)), meta["seg"],
                            meta["xc_sidx"], meta["xc_rdst"], *geo_arrs)

    # -- boundary conditions -----------------------------------------------------
    def dirichlet_arrays(self, mask_global: np.ndarray,
                         g_global: Optional[np.ndarray] = None):
        """Distribute a merged Dirichlet mask (+ values) to owner shards:
        (mask [n_dev, N_o] f64 0/1, g [n_dev, N_o])."""
        m = np.zeros((self.n_dev, self.N_o))
        g = np.zeros((self.n_dev, self.N_o))
        for p, ix in enumerate(self.dof_map.partition_indices):
            m[p, : len(ix)] = mask_global[ix]
            if g_global is not None:
                g[p, : len(ix)] = np.asarray(g_global)[ix]
        return jnp.asarray(m), jnp.asarray(g)

    def apply_dirichlet(self, dmat: DistributedCsr, rhs: jnp.ndarray,
                        mask_global: np.ndarray,
                        g_global: Optional[np.ndarray] = None):
        """Row elimination on the distributed matrix: Dirichlet rows become
        unit-diagonal; with g_global given the RHS entries become g
        (BCBuilder::setDirichletBC, BCBuilder_def.hpp:620 — zero rows +
        unit diag), with g_global=None the RHS is returned UNCHANGED (the
        caller's RHS already carries the BC values — the solver-layer
        convention).  Returns a NEW DistributedCsr sharing plans, and the
        RHS."""
        m, g = self.dirichlet_arrays(mask_global, g_global)
        is_diag = (dmat.ell_cols
                   == jnp.arange(self.N_o)[None, None, :])  # [ndev,K,N_o]
        has_entry = self.ell_src != self.L
        is_diag = is_diag & has_entry
        dm = m[:, None, :] > 0
        data = jnp.where(dm, jnp.where(is_diag, 1.0, 0.0), dmat.ell_data)
        new = DistributedCsr.from_parts(self.dof_map, self.col_gids,
                                        dmat.ell_cols, data, self.K,
                                        plan=dmat.plan,
                                        row_lens=self.row_lens)
        if g_global is not None:
            rhs = jnp.where(m > 0, g, rhs)
        return new, rhs

    # -- preconditioner feed ----------------------------------------------------
    def block_specs(self, null_space: str = "laplace") -> List[dict]:
        """Per-block GDSW coarse specs (offset, repeated node sets, points,
        DofsPerNode, null space) — what the reference feeds FROSch's
        monolithic path (Preconditioner_def.hpp:295-383)."""
        specs = []
        n_base = self.n_dev - self.n_free
        for b, (dom, dofs) in enumerate(self.variables):
            if dom is None:
                continue  # mesh-less (λ) blocks carry no coarse functions
            mp, lo, hi = self._mesh_part(self.var_mesh[b])
            if dom.mesh is mp.mesh:
                loc_sets = mp.repeated_map.partition_indices
            else:  # P2 child: repeated nodes = nodes touched by my elements
                loc_sets = [np.unique(dom.mesh.elements[mp.elem_ids[p]])
                            for p in range(mp.n_parts)]
            rep_sets = [loc_sets[q - lo] if lo <= q < hi
                        else np.zeros(0, np.int64) for q in range(n_base)]
            nsp = null_space if (dofs > 1 and null_space == "elasticity") \
                else "laplace"
            specs.append(dict(offset=int(self.offsets[b]),
                              node_part_sets=rep_sets,
                              points=dom.mesh.points,
                              dofs_per_node=dofs, null_space=nsp))
        return specs

    def distribute_field(self, b: int, xb) -> jnp.ndarray:
        """Block-b global vector → per-device OWNED field array
        [n_dev, N_ob] (the layout assemble(ext_fields=...) expects)."""
        if b not in self.field_plans:
            raise ValueError(f"variable {b} has no field plan")
        self.n_distributes += 1
        bmap = self._var_gmap(b)
        N_ob = self.field_plans[b]["plan"].N_o
        out = np.zeros((self.n_dev, N_ob))
        xb = np.asarray(xb)
        for q in range(self.n_dev):
            ix = bmap.partition_indices[q]
            out[q, : len(ix)] = xb[ix]
        return jnp.asarray(out)

    # -- host vector helpers -------------------------------------------------
    #: host→device uploads through this pipeline (scalability telemetry:
    #: a device-resident Newton/time loop must stop incrementing after the
    #: first step — tests assert on it)
    n_distributes = 0

    def distribute(self, x_global) -> jnp.ndarray:
        from feddlib_tpu.parallel.spmd import distribute_vector

        self.n_distributes += 1
        return distribute_vector(np.asarray(x_global), self.dof_map, self.N_o)

    def collect(self, x_dist) -> np.ndarray:
        from feddlib_tpu.parallel.spmd import collect_vector

        return collect_vector(x_dist, self.dof_map)
