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

import jax
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


# ---------------------------------------------------------------------------
# distributed FaCSI (shard_map form)
# ---------------------------------------------------------------------------


def _field_subdomains(dmat, lo: int, hi: int, overlap: int,
                      vals_flat: np.ndarray,
                      ident_rows: Optional[np.ndarray] = None,
                      with_refresh: bool = False):
    """Per-device overlapping subdomain factorizations of the merged
    distributed matrix RESTRICTED to the field dof range [lo, hi) — the
    FROSch sub-preconditioner each FaCSI field gets via MinPrecProblem
    (reference Preconditioner_def.hpp:789).  Each device's subdomain =
    its owned field dofs grown `overlap` layers through the FIELD
    subgraph.  `ident_rows` (global ids) become identity rows inside every
    subdomain block (the FaCSI fluid interface-velocity condensation,
    PrecOpFaCSI_def.hpp:36-51).  Returns (inv [n_dev,S,S], ov_col
    [n_dev,S] plan-local restriction ids, own_pos [n_dev,N_o] scatter of
    subdomain solutions to owned dofs (pad→S), HaloPlan)."""
    from feddlib_tpu.parallel.spmd import HaloPlan
    from feddlib_tpu.precond.schwarz import _robust_inverse, grow_overlap

    unique_map = dmat.unique_map
    n_dev, N_o = dmat.n_dev, dmat.plan.N_o
    loc = dmat.locator()
    field = loc[lo:hi, lo:hi].tocsr()
    ident_mask = None
    if ident_rows is not None and len(ident_rows):
        ident_mask = np.zeros(hi - lo, dtype=bool)
        ident_mask[np.asarray(ident_rows) - lo] = True

    ov_sets = []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        seeds = owned[(owned >= lo) & (owned < hi)] - lo
        ov = (grow_overlap(field, seeds, overlap) + lo if len(seeds)
              else np.zeros(0, np.int64))
        ov_sets.append(ov)
    S = max(max((len(o) for o in ov_sets), default=0), 1)

    col_gids = []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        extra = np.setdiff1d(ov_sets[p], owned)
        col_gids.append(np.concatenate([owned, extra]))
    plan = HaloPlan(unique_map, col_gids)

    subs = []  # per device: COO (row, col, slot) of its subdomain block
    for p in range(n_dev):
        ov = ov_sets[p]
        if len(ov):
            sub = field[ov - lo][:, ov - lo].tocoo()
            ident_on = (ident_mask[ov[sub.row] - lo]
                        if ident_mask is not None else None)
            subs.append((sub.row, sub.col,
                         sub.data.astype(np.int64) - 1, ident_on))
        else:
            subs.append(None)

    def factorize(vals_flat):
        inv_l = []
        for p in range(n_dev):
            k = len(ov_sets[p])
            block = np.zeros((S, S))
            block[np.arange(k, S), np.arange(k, S)] = 1.0
            if subs[p] is not None:
                row, col, slot, ident_on = subs[p]
                vals = vals_flat[slot]
                if ident_on is not None:
                    vals = np.where(ident_on,
                                    (row == col).astype(np.float64), vals)
                block[row, col] = vals
            inv_l.append(_robust_inverse(block))
        return jnp.asarray(np.stack(inv_l))

    ov_col_l, own_pos_l = [], []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        n_own = len(owned)
        ov = ov_sets[p]
        k = len(ov)
        # restriction: overlap gids → overlap-plan column-local ids
        lookup = np.zeros(dmat.n_global, dtype=np.int64)
        lookup[owned] = np.arange(n_own)
        extra = col_gids[p][n_own:]
        lookup[extra] = N_o + np.arange(len(extra))
        oc = np.zeros(S, dtype=np.int32)
        oc[:k] = lookup[ov]
        ov_col_l.append(oc)
        # restricted prolongation: owned field dofs ← their subdomain slot
        op_ = np.full(N_o, S, dtype=np.int32)
        mine = (owned >= lo) & (owned < hi)
        op_[np.flatnonzero(mine)] = np.searchsorted(ov, owned[mine])
        own_pos_l.append(op_)
    out = (factorize(vals_flat), jnp.asarray(np.stack(ov_col_l)),
           jnp.asarray(np.stack(own_pos_l)), plan)
    return out + (factorize,) if with_refresh else out


def _scatter_plan(unique_map, gids: np.ndarray, slots: np.ndarray,
                  N_o: int, n_slots: int):
    """Per-device (src [n_dev, W], dst [n_dev, W]) plans: device p pulls
    its OWNED entries of `gids` from local position src (pad → N_o, a zero
    slot on the extended vector) and adds them at `slots` of an
    interface-sized accumulator (pad → n_slots dump)."""
    n_dev = unique_map.n_parts
    src_l, dst_l = [], []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        pos = np.searchsorted(owned, gids)
        pos_c = np.minimum(pos, max(len(owned) - 1, 0))
        is_own = (owned[pos_c] == gids) if len(owned) else \
            np.zeros(len(gids), bool)
        src_l.append(pos_c[is_own])
        dst_l.append(np.asarray(slots)[is_own])
    W = max(max((len(s) for s in src_l), default=0), 1)
    src = np.full((n_dev, W), N_o, dtype=np.int64)
    dst = np.full((n_dev, W), n_slots, dtype=np.int64)
    for p in range(n_dev):
        src[p, : len(src_l[p])] = src_l[p]
        dst[p, : len(dst_l[p])] = dst_l[p]
    return jnp.asarray(src.astype(np.int32)), jnp.asarray(dst.astype(np.int32))


def distributed_facsi(dmat, offsets, uf_cols, ds_cols, iface_rows,
                      dt: float, overlap: int = 1):
    """FaCSI preconditioner for the DISTRIBUTED 4-field FSI GE system —
    (build, arrays) for `DistributedSolver.solve(precond=...)`.

    The reference runs FaCSI as its production FSI preconditioner
    (PrecOpFaCSI_decl.hpp:27; composed from per-field FROSch
    sub-preconditioners, Preconditioner_def.hpp:789).  Here each device
    holds ONE overlapping subdomain per field (its owned field rows grown
    through the field subgraph — devices on the other mesh's rank range
    hold empty identity blocks), and the interface condensation rides two
    `lax.psum`s of interface-sized vectors (the interface is a
    lower-dimensional set, so this is O(n_Γ) — not a global gather):

      1. z_d  = S̃_d⁻¹ r_d                    (solid restricted Schwarz)
      2. uΓ   = r_λ + z_d|Γ / dt              (psum #1)
      3. z_f  = F̃⁻¹ r̂_f  with interface velocity rows ≡ I and r̂|Γ = uΓ
      4. z_λ  = (r_u − [A Bᵀ] z_f)|Γ          (psum #2, via one merged SpMV)

    `offsets` = merged block offsets [5] (u, p, d, λ ends); uf_cols /
    ds_cols / iface_rows are the FSI problem's matched-interface index
    triple (block-local)."""
    from jax import lax

    from feddlib_tpu.parallel.spmd import AXIS

    o = [int(v) for v in offsets[:6]] if len(offsets) >= 6 else \
        [int(v) for v in offsets[:5]]
    has_geom = len(o) == 6  # 5-field GI system (…, λ, g)
    n_lam = o[4] - o[3]
    unique_map = dmat.unique_map
    N_o = dmat.plan.N_o
    vals_flat = dmat.values_host()

    uf_glob = np.asarray(uf_cols, np.int64) + o[0]
    ds_glob = np.asarray(ds_cols, np.int64) + o[2]
    lam_glob = np.asarray(iface_rows, np.int64) + o[3]
    slot = np.arange(n_lam)  # interface slot k ↔ (uf[k], ds[k], λ row[k])

    inv_s, ovcol_s, spos, plan_s, fact_s = _field_subdomains(
        dmat, o[2], o[3], overlap, vals_flat, with_refresh=True)
    inv_f, ovcol_f, fpos, plan_f, fact_f = _field_subdomains(
        dmat, o[0], o[2], overlap, vals_flat, ident_rows=uf_glob,
        with_refresh=True)
    if has_geom:  # geometry sub-solve (the reference's GI FaCSI stage)
        inv_g, ovcol_g, gpos, plan_g, fact_g = _field_subdomains(
            dmat, o[4], o[5], overlap, vals_flat, with_refresh=True)

    src_lam, dst_lam = _scatter_plan(unique_map, lam_glob, slot, N_o, n_lam)
    src_ds, dst_ds = _scatter_plan(unique_map, ds_glob, slot, N_o, n_lam)
    src_uf, dst_uf = _scatter_plan(unique_map, uf_glob, slot, N_o, n_lam)
    # writers: owned uf positions ← uΓ slot; owned λ positions ← zλ slot
    wpos_uf, widx_uf = _scatter_plan(unique_map, uf_glob, slot, N_o, n_lam)
    wpos_lam, widx_lam = _scatter_plan(unique_map, lam_glob, slot, N_o, n_lam)

    imp_s = plan_s.importer()
    imp_f = plan_f.importer()
    ia_s_leaves, ia_s_def = jax.tree.flatten(plan_s.import_arrays)
    ia_f_leaves, ia_f_def = jax.tree.flatten(plan_f.import_arrays)
    n_s, n_f = len(ia_s_leaves), len(ia_f_leaves)

    head = [inv_s, ovcol_s, spos, inv_f, ovcol_f, fpos,
            src_lam, dst_lam, src_ds, dst_ds, src_uf, dst_uf,
            wpos_uf, widx_uf, wpos_lam, widx_lam]
    n_head = len(head)
    arrays = head + ia_s_leaves + ia_f_leaves
    if has_geom:
        imp_g = plan_g.importer()
        ia_g_leaves, ia_g_def = jax.tree.flatten(plan_g.import_arrays)
        arrays = arrays + [inv_g, ovcol_g, gpos] + ia_g_leaves
    inv_dt = 1.0 / dt

    def build(prec_arrays, ctx):
        ed, ec, mask, imp_A, _exp = ctx
        (inv_s, ovcol_s, spos, inv_f, ovcol_f, fpos,
         src_lam, dst_lam, src_ds, dst_ds, src_uf, dst_uf,
         wpos_uf, widx_uf, wpos_lam, widx_lam) = prec_arrays[:n_head]
        ia_s = jax.tree.unflatten(ia_s_def,
                                  prec_arrays[n_head: n_head + n_s])
        ia_f = jax.tree.unflatten(
            ia_f_def, prec_arrays[n_head + n_s: n_head + n_s + n_f])
        if has_geom:
            base = n_head + n_s + n_f
            inv_g, ovcol_g, gpos = prec_arrays[base: base + 3]
            ia_g = jax.tree.unflatten(ia_g_def, prec_arrays[base + 3:])

        def M(r):
            dt_ = r.dtype
            # 0) geometry solve (GI only): z_g = G̃⁻¹ r_g — the reference
            # GI FaCSI's geometry stage (PrecOpFaCSI_decl.hpp:27)
            if has_geom:
                z_ovg = inv_g @ imp_g(r, ia_g)[ovcol_g]
                zg = jnp.concatenate([z_ovg, jnp.zeros(1, dt_)])[gpos]
            # 1) solid restricted Schwarz
            z_ov = inv_s @ imp_s(r, ia_s)[ovcol_s]
            zd = jnp.concatenate([z_ov, jnp.zeros(1, dt_)])[spos]
            # 2) interface velocity data uΓ = r_λ + z_d|Γ/dt  (psum)
            rex = jnp.concatenate([r, jnp.zeros(1, dt_)])
            zdx = jnp.concatenate([zd, jnp.zeros(1, dt_)])
            acc = jnp.zeros(n_lam + 1, dt_)
            acc = acc.at[dst_lam].add(rex[src_lam])
            acc = acc.at[dst_ds].add(zdx[src_ds] * inv_dt)
            uG = lax.psum(acc[:n_lam], AXIS)
            # 3) fluid solve with interface rows ≡ I, r̂|Γ = uΓ
            uGx = jnp.concatenate([uG, jnp.zeros(1, dt_)])
            rhat = rex.at[wpos_uf].set(uGx[widx_uf])[:N_o]
            z_ovf = inv_f @ imp_f(rhat, ia_f)[ovcol_f]
            zf = jnp.concatenate([z_ovf, jnp.zeros(1, dt_)])[fpos]
            if has_geom:
                zf = zf + zg  # disjoint owned ranges
            # 4) traction recovery zλ = (r_u − A z_fg)|Γ (merged SpMV:
            # rows uf are [Auu Bᵀ 0 C1ᵀ (D_ug)]; z is zero on d and λ so
            # C1ᵀ contributes nothing; the GI shape column rides z_g)
            y = jnp.sum(ed * imp_A(zf)[ec], axis=0)
            resu = rex - jnp.concatenate([y, jnp.zeros(1, dt_)])
            acc2 = jnp.zeros(n_lam + 1, dt_).at[dst_uf].add(resu[src_uf])
            zlv = lax.psum(acc2[:n_lam], AXIS)
            zlx = jnp.concatenate([zlv, jnp.zeros(1, dt_)])
            zl = (jnp.zeros(N_o + 1, dt_)
                  .at[wpos_lam].set(zlx[widx_lam])[:N_o])
            return (zd + zf + zl) * mask

        return M

    def refresh(dmat_new):
        """New (build-compatible) arrays for updated matrix VALUES on the
        SAME pattern (Newton/time reassembly): only the subdomain
        factorizations are recomputed; every plan — and the `build`
        closure identity, hence the compiled solver program — is reused
        (the FROSch Reuse: Symbolic Factorization role)."""
        vf = dmat_new.values_host()
        out = ([fact_s(vf), ovcol_s, spos, fact_f(vf), ovcol_f, fpos]
               + head[6:] + ia_s_leaves + ia_f_leaves)
        if has_geom:
            out += [fact_g(vf), ovcol_g, gpos] + ia_g_leaves
        return out

    build.refresh = refresh
    return build, arrays


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
