"""GDSW coarse space + two-level Schwarz — the FROSch GDSWCoarseOperator
equivalent (SURVEY.md §2.8: the largest rebuild item; parametersPrec.xml
"CoarseOperator Type: GDSWCoarseOperator", TwoLevel=true, additive).

GDSW (Generalized Dryja–Smith–Widlund) construction:

1. *Interface classification*: the interface Γ of the nonoverlapping
   decomposition = dofs whose node is held by ≥2 subdomains (from the
   repeated maps, exactly what FEDDLib feeds FROSch —
   Preconditioner_def.hpp:295,380).  Γ is split into connected components by
   the *set of touching subdomains*: nodes with identical subdomain sets
   form one component (vertices/edges/faces arise naturally; FROSch's
   GDSW* partition-of-unity classification).
2. *Null space*: constants for scalar problems; translations (+ rotations)
   for elasticity (null_space="laplace" | "elasticity").
3. *Coarse functions* Φ: restrict each null-space vector to each interface
   component, extend by zero on the rest of Γ, and extend harmonically into
   the subdomain interiors:  Φ_I = −A_II⁻¹ A_IΓ Φ_Γ  (energy-minimal
   extension; per-subdomain sparse solves, host-side at setup).
4. *Galerkin coarse operator* A₀ = Φᵀ A Φ (RAP; host SpGEMM at setup —
   SURVEY.md §7 hard part 3 allows host fallback first).
5. *Apply* (device, additive 2-level):  z = Σ_p R_pᵀ D_p A_p⁻¹ R_p r
   + Φ A₀⁻¹ Φᵀ r.  Φ applies are device SpMV (ELL); the coarse solve is a
   dense inverse matmul (coarse dim = O(#components × null dim), small).
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps
import scipy.sparse.linalg as spla

from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.la.map import IndexMap
from feddlib_tpu.precond.schwarz import SchwarzPreconditioner


def interface_components(node_part_sets: List[np.ndarray], n_nodes: int,
                         return_sets: bool = False):
    """Group interface nodes by their touching-subdomain set.

    node_part_sets: per-part arrays of (repeated) node ids.
    Returns (components: list of node-id arrays, interface_mask [n_nodes])
    — and the touching sets themselves with return_sets=True.

    Fully vectorized (was a Python loop over parts x nodes — the dominant
    cost of GDSW setup at bench sizes): nodes are grouped by their sorted
    touching-part signature via np.unique over a (-1)-padded signature
    matrix, which sorts identically to the tuple ordering (shorter
    signatures pad with -1 and sort first, as tuple prefix order does)."""
    arr_nodes = np.concatenate(
        [np.asarray(nodes, dtype=np.int64) for nodes in node_part_sets]
        or [np.zeros(0, np.int64)])
    arr_parts = np.concatenate(
        [np.full(len(nodes), p, np.int64)
         for p, nodes in enumerate(node_part_sets)]
        or [np.zeros(0, np.int64)])
    o = np.lexsort((arr_parts, arr_nodes))
    an, ap = arr_nodes[o], arr_parts[o]
    cnt = np.bincount(an, minlength=n_nodes)
    mask = cnt >= 2
    iface_nodes = np.flatnonzero(mask)
    if len(iface_nodes) == 0:
        return ([], mask, []) if return_sets else ([], mask)
    starts = np.concatenate([[0], np.cumsum(cnt)])
    m_star = int(cnt[iface_nodes].max())
    sig = np.full((len(iface_nodes), m_star), -1, np.int64)
    for j in range(m_star):
        has = cnt[iface_nodes] > j
        sig[has, j] = ap[starts[iface_nodes[has]] + j]
    uniq, inv = np.unique(sig, axis=0, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    comps = [iface_nodes[order[bounds[i]:bounds[i + 1]]]
             for i in range(len(uniq))]
    if return_sets:
        sets = [frozenset(int(v) for v in row if v >= 0) for row in uniq]
        return comps, mask, sets
    return comps, mask


def rgdsw_vertex_weights(comps: List[np.ndarray],
                         sets: List[frozenset]) -> List[List[tuple]]:
    """RGDSW Option 1 coarse-node selection + partition-of-unity weights
    (FROSch RGDSWCoarseOperator / the IPOUHarmonic GDSW* family).

    Coarse nodes = interface components whose touching-subdomain set is
    MAXIMAL under inclusion (the subdomain 'vertices' — faces touch 2
    parts, edges more, vertices the most).  Every other component
    distributes its nullspace values equally among its coarse ancestors
    {v : S_comp ⊆ S_v}; components with no ancestor become coarse nodes
    themselves.  Returns, per coarse node, a list of (comp_index, weight)
    — a partition of unity over the interface."""
    n = len(comps)
    is_coarse = [True] * n
    for i in range(n):
        for j in range(n):
            if i != j and sets[i] < sets[j]:  # proper subset → not maximal
                is_coarse[i] = False
                break
    # promote orphan components (no maximal superset) first, THEN resolve
    # every component's ancestors against the final coarse set
    for i in range(n):
        if not is_coarse[i] and not any(
                is_coarse[j] and sets[i] <= sets[j] for j in range(n)):
            is_coarse[i] = True
    coarse_ids = [i for i in range(n) if is_coarse[i]]
    members: dict = {v: [] for v in coarse_ids}
    for i in range(n):
        if is_coarse[i]:
            members[i].append((i, 1.0))
            continue
        anc = [j for j in coarse_ids if sets[i] <= sets[j]]
        w = 1.0 / len(anc)
        for v in anc:
            members[v].append((i, w))
    return [members[v] for v in coarse_ids]


def classify_entities(comps: List[np.ndarray], sets: List[frozenset],
                      dim: int) -> List[str]:
    """FROSch entity classes per interface component: 'vertex' (single
    node), 'face' (shared by exactly 2 subdomains, 3D), 'edge' (the rest;
    in 2D two-subdomain components are edges) — the classification behind
    IPOUHarmonic's Custom sublist (parametersPrec.xml:84-92:
    Vertices/ShortEdges/StraightEdges/Edges/Faces)."""
    cls = []
    for c, s in zip(comps, sets):
        if len(c) == 1:
            cls.append("vertex")
        elif len(s) == 2:
            cls.append("face" if dim == 3 else "edge")
        else:
            cls.append("edge" if dim == 3 else "vertex")
    return cls


def ipou_groups(comps: List[np.ndarray], sets: List[frozenset], dim: int,
                opts: Optional[dict] = None) -> List[List[tuple]]:
    """Interface-partition-of-unity coarse groups — the FROSch
    IPOUHarmonicCoarseOperator (parametersPrec.xml:63-120): entity classes
    are individually toggleable, and the POU 'Type' selects between
      'GDSW'      one characteristic function per (included) entity;
      'GDSWStar' / 'RGDSW'  root-based partition of unity: roots are the
        included vertex entities, every other included entity distributes
        its interface values equally among its root ancestors
        {v : S_comp ⊆ S_v} (orphans promoted to roots).
    Returns per-group lists of (component index, weight)."""
    opts = opts or {}
    pou = str(opts.get("pou_type", "GDSWStar"))
    include = {"vertex": bool(opts.get("vertices", True)),
               "edge": bool(opts.get("edges", True)),
               "face": bool(opts.get("faces", True))}
    cls = classify_entities(comps, sets, dim)
    keep = [i for i in range(len(comps)) if include[cls[i]]]
    if pou == "GDSW":
        return [[(i, 1.0)] for i in keep]
    roots = [i for i in keep if cls[i] == "vertex"]
    if not roots:  # no vertex entities (e.g. strip decompositions)
        roots = [i for i in keep
                 if not any(sets[i] < sets[j] for j in keep if j != i)]
    members = {v: [(v, 1.0)] for v in roots}
    for i in keep:
        if i in members:
            continue
        anc = [v for v in roots if sets[i] <= sets[v]]
        if not anc:
            members[i] = [(i, 1.0)]  # orphan → own coarse function
            continue
        w = 1.0 / len(anc)
        for v in anc:
            members[v].append((i, w))
    return [members[v] for v in sorted(members)]


def build_null_space(kind: str, points: np.ndarray, dofs_per_node: int):
    """Null-space basis evaluated at nodes → [n_nodes, dofs_per_node, k].

    kind='laplace': constants per component (k = dofs_per_node).
    kind='elasticity': translations + rotations (k = 3 in 2D, 6 in 3D) —
    FROSch null spaces (SURVEY.md §2.8)."""
    n, d = points.shape[0], dofs_per_node
    if kind == "laplace":
        ns = np.zeros((n, d, d))
        for c in range(d):
            ns[:, c, c] = 1.0
        return ns
    if kind == "elasticity":
        dim = d
        k = 3 if dim == 2 else 6
        ns = np.zeros((n, d, k))
        for c in range(dim):
            ns[:, c, c] = 1.0
        if dim == 2:
            ns[:, 0, 2] = -points[:, 1]
            ns[:, 1, 2] = points[:, 0]
        else:
            # rotations about z, x, y
            ns[:, 0, 3] = -points[:, 1]
            ns[:, 1, 3] = points[:, 0]
            ns[:, 1, 4] = -points[:, 2]
            ns[:, 2, 4] = points[:, 1]
            ns[:, 0, 5] = points[:, 2]
            ns[:, 2, 5] = -points[:, 0]
        return ns
    raise ValueError(f"unknown null space {kind!r}")


def _robust_splu(A_csc):
    """splu with a diagonal-shift fallback for (near-)singular interior
    blocks — the KLU pivot-perturbation role (parametersPrec.xml Solver)."""
    try:
        return spla.splu(A_csc)
    except RuntimeError:
        scale = max(np.abs(A_csc.data).max(), 1.0) if A_csc.nnz else 1.0
        eye = sps.identity(A_csc.shape[0], format="csc")
        for eps in (1e-12, 1e-10, 1e-8):
            try:
                return spla.splu(A_csc + eps * scale * eye)
            except RuntimeError:
                continue
        raise


def rap_device(A: CsrMatrix, phi: sps.csr_matrix,
               chunk: int = 128) -> np.ndarray:
    """Galerkin product A₀ = Φᵀ A Φ computed ON DEVICE (the RAP/SpGEMM of
    SURVEY.md §2.8 / §7 hard part 3, replacing the host scipy fallback).

    Exploits that Φ is tall-skinny (nc = O(#interface components) ≪ n):
    chunks of Φ's columns are densified [n, c] and pushed through the ELL
    SpMM (Y = AΦ_c, MXU-friendly), then Φᵀ Y is one deterministic
    segment-sum over Φ's nonzeros.  f64 throughout (accumulation parity
    with the host path)."""
    import jax

    n, nc = phi.shape
    coo = phi.tocoo()
    prows = jnp.asarray(coo.row.astype(np.int32))
    pcols = jnp.asarray(coo.col.astype(np.int32))
    pvals = jnp.asarray(coo.data)
    A0 = np.zeros((nc, nc))
    for s in range(0, nc, chunk):
        c = min(chunk, nc - s)
        sel = (coo.col >= s) & (coo.col < s + c)
        X = (jnp.zeros((n, c))
             .at[jnp.asarray(coo.row[sel]),
                 jnp.asarray(coo.col[sel] - s)].set(jnp.asarray(coo.data[sel])))
        Y = A.matmat(X)  # [n, c]
        A0[:, s: s + c] = np.asarray(jax.ops.segment_sum(
            pvals[:, None] * Y[prows], pcols, num_segments=nc))
    return A0


class GDSWCoarseOperator:
    """Φ and A₀ for a GDSW coarse level; device-resident apply.

    Single-space systems: pass (node_part_sets, points, dofs_per_node,
    null_space).  Block/monolithic systems (Stokes, NS, FSI — the FROSch
    MONOLITHIC path, fed per-block repeated maps + DofsPerNode,
    Preconditioner_def.hpp:295-383): pass `blocks`, a list of dicts with
    keys {offset, node_part_sets, points, dofs_per_node, null_space};
    Φ is then block-diagonal (per-block interface classification and null
    spaces) while the energy-minimal extension and A₀ use the MERGED
    matrix."""

    def __init__(self, A: Optional[CsrMatrix], unique_map: IndexMap,
                 node_part_sets: Optional[List[np.ndarray]] = None,
                 points: Optional[np.ndarray] = None,
                 dofs_per_node: int = 1, null_space: str = "laplace",
                 dirichlet_mask: Optional[np.ndarray] = None,
                 dtype=jnp.float64, rap: str = "host",
                 blocks: Optional[List[dict]] = None,
                 variant: str = "GDSW", row_source=None,
                 ipou: Optional[dict] = None):
        if variant not in ("GDSW", "RGDSW", "IPOUHarmonic"):
            raise ValueError(f"unknown coarse variant {variant!r}")
        self.variant = variant
        self.ipou = ipou
        n = unique_map.n_global if A is None else A.shape[0]
        if blocks is None:
            if points is None or node_part_sets is None:
                raise ValueError("need node_part_sets+points or blocks")
            if n != points.shape[0] * dofs_per_node:
                raise ValueError("matrix size != n_nodes * dofs_per_node")
            blocks = [dict(offset=0, node_part_sets=node_part_sets,
                           points=points, dofs_per_node=dofs_per_node,
                           null_space=null_space)]
        # All matrix access below is ROW-decomposed: row_source(p) yields
        # (owned_gids, csr [n_own, n]) for part p — serial: rows of the
        # global CSR; distributed: DistributedCsr.local_rows (per-device
        # values, no global matrix ever assembled).
        if row_source is None:
            if A is None:
                raise ValueError("need A or row_source")
            sp_all = A.to_scipy().tocsr()

            def row_source(p):
                owned = unique_map.partition_indices[p]
                return owned, sp_all[owned]

        # per-block interface classification + null-space restrictions;
        # dof-level interface mask over the MERGED index space.  Dirichlet
        # dofs are excluded from the coarse space (their rows are identity —
        # extending through them would pollute Φ)
        iface_dof = np.zeros(n, dtype=bool)
        cols = []
        for blk in blocks:
            off = int(blk["offset"])
            dpn = int(blk["dofs_per_node"])
            pts = blk["points"]
            n_nodes = pts.shape[0]
            comps, iface_node, csets = interface_components(
                blk["node_part_sets"], n_nodes, return_sets=True)
            ns = build_null_space(blk.get("null_space", "laplace"), pts, dpn)
            k = ns.shape[2]
            blk_iface = np.repeat(iface_node, dpn)
            if dirichlet_mask is not None:
                blk_iface = blk_iface & ~dirichlet_mask[off:off + n_nodes * dpn]
            iface_dof[off:off + n_nodes * dpn] = blk_iface

            # coarse groups: GDSW = one group per interface component with
            # unit weights; RGDSW = one group per subdomain VERTEX with
            # partition-of-unity weights over its descendant components;
            # IPOUHarmonic = entity-class-filtered POU (ipou_groups)
            if variant == "RGDSW":
                groups = rgdsw_vertex_weights(comps, csets)
            elif variant == "IPOUHarmonic":
                groups = ipou_groups(comps, csets, pts.shape[1], ipou)
            else:
                groups = [[(i, 1.0)] for i in range(len(comps))]

            # Φ_Γ: per group, the (weighted) null-space restrictions
            # ORTHONORMALIZED by QR with rank filtering — on small groups
            # rotations become linearly dependent on translations, which
            # would make A₀ nearly singular and the coarse correction an
            # amplifier (FROSch's partition-of-unity basis serves the same
            # role)
            for grp in groups:
                dof_l, V_l = [], []
                for ci, w in grp:
                    c = comps[ci]
                    cdofs = (c[:, None] * dpn
                             + np.arange(dpn)[None, :]).ravel()
                    keep = blk_iface[cdofs]
                    if not keep.any():
                        continue
                    dof_l.append(cdofs[keep] + off)
                    V_l.append(w * ns[c].reshape(-1, k)[keep])
                if not dof_l:
                    continue
                kept = np.concatenate(dof_l)
                V = np.concatenate(V_l, axis=0)  # [n_kept_dofs, k]
                if not np.abs(V).max() > 0:
                    continue
                Q, Rm = np.linalg.qr(V)
                diag = np.abs(np.diag(Rm))
                good = diag > 1e-10 * max(diag.max(), 1e-300)
                for j in np.nonzero(good)[0]:
                    cols.append((kept, Q[:, j]))
        nc = len(cols)
        if nc == 0:
            raise ValueError("empty coarse space (no interface components)")

        rows_t, cols_t, vals_t = [], [], []
        for j, (dofs, vals) in enumerate(cols):
            rows_t.append(dofs)
            cols_t.append(np.full(len(dofs), j, dtype=np.int64))
            vals_t.append(vals)
        phi_gamma = sps.csr_matrix(
            (np.concatenate(vals_t),
             (np.concatenate(rows_t), np.concatenate(cols_t))),
            shape=(n, nc))

        # harmonic extension per subdomain: interior = owned, non-interface,
        # non-Dirichlet dofs (energy-minimal extension, reuses the subdomain
        # solves FROSch would — here sparse LU at setup).  Multi-block
        # systems extend BLOCK-DIAGONALLY (each field through its own
        # diagonal block — the FROSch monolithic construction): the merged
        # interior matrix of a saddle-point system is singular, the field
        # diagonal blocks are not.  A structurally empty diagonal block
        # (P2/P1 pressure) gets the zero extension.
        interior_all = ~iface_dof
        if dirichlet_mask is not None:
            interior_all = interior_all & ~dirichlet_mask
        block_ranges = [(int(blk["offset"]),
                         int(blk["offset"]) + blk["points"].shape[0]
                         * int(blk["dofs_per_node"])) for blk in blocks]
        local_rows = [row_source(p) for p in range(unique_map.n_parts)]

        def _extend(job):
            owned, R, lo, hi = job
            in_blk = (owned >= lo) & (owned < hi)
            I = owned[in_blk & interior_all[owned]]
            if len(I) == 0:
                return None
            subI = R[np.searchsorted(owned, I)]
            A_II = subI[:, I].tocsc()
            if A_II.nnz == 0:
                return None  # structurally empty diagonal block
            # boundary of the extension = same-block interface dofs
            # adjacent to I
            Gcols = np.unique(subI.indices)
            Gcols = Gcols[(Gcols >= lo) & (Gcols < hi)]
            G = Gcols[iface_dof[Gcols]]
            if len(G) == 0:
                return None
            rhs = -(subI[:, G] @ phi_gamma[G]).toarray()
            X = _robust_splu(A_II).solve(rhs)
            rr, cc = np.nonzero(np.abs(X) > 1e-14)
            return I[rr], cc.astype(np.int64), X[rr, cc]

        # subdomain extensions factorize on a thread pool (SuperLU releases
        # the GIL; round-1 weak item 8: sequential setup loops)
        from feddlib_tpu.la.sparse_lu import _parallel_map

        jobs = [(owned, R, lo, hi) for owned, R in local_rows
                for lo, hi in block_ranges]
        for out in _parallel_map(_extend, jobs):
            if out is not None:
                rows_t.append(out[0])
                cols_t.append(out[1])
                vals_t.append(out[2])
        phi = sps.csr_matrix(
            (np.concatenate(vals_t),
             (np.concatenate(rows_t), np.concatenate(cols_t))),
            shape=(n, nc))

        if rap == "device":
            A0s = sps.csr_matrix(rap_device(A, phi))
        else:
            # row-decomposed Galerkin product ΦᵀAΦ = Σ_p Φ[rows_p]ᵀ A_p Φ,
            # accumulated SPARSE end-to-end — O(nnz(A₀)) setup memory (the
            # round-4 dense [nc, nc] accumulator was the O(nc²) host wall
            # the reference's gathered coarse matrix never pays)
            phi_csc = phi.tocsc()
            A0s = sps.csr_matrix((nc, nc))
            for p in range(unique_map.n_parts):
                owned, R = local_rows[p]
                if len(owned):
                    A0s = A0s + (phi_csc[owned].T @ (R @ phi_csc)).tocsr()
        # regularize exact zero diagonal (fully-Dirichlet components)
        d0 = np.abs(A0s.diagonal())
        bad = d0 < 1e-14 * max(d0.max() if nc else 1.0, 1.0)
        if bad.any():
            A0s = (A0s + sps.diags(bad.astype(np.float64))).tocsr()
        self.n_coarse = nc
        self.phi = CsrMatrix.from_scipy(phi, dtype=dtype)
        self.phiT = CsrMatrix.from_scipy(phi.T.tocsr(), dtype=dtype)
        # A0 kept SPARSE; the dense form and its inverse are LAZY — the
        # scalable coarse-solver paths (sparse LU wavefront / iterative
        # GMRES, the reference's CoarseSolver sublist) never form them
        # (O(nc³) setup + O(nc²) replicated memory are the pod-scale wall)
        self._A0_sp = A0s.tocsr()
        self._A0_np = None
        self._A0_inv = None
        self._dtype = dtype

    @property
    def A0_np(self) -> np.ndarray:
        if self._A0_np is None:
            self._A0_np = self._A0_sp.toarray()
        return self._A0_np

    @property
    def A0_inv(self):
        # the numpy inverse is cached; the jnp conversion happens per
        # access so a call under jit tracing never caches a tracer
        if self._A0_inv is None:
            self._A0_inv = np.linalg.inv(self.A0_np)
        return jnp.asarray(self._A0_inv, self._dtype)

    def A0_sparse(self, drop_tol: float = 0.0) -> sps.csr_matrix:
        """A₀ as scipy CSR (the native storage)."""
        A = self._A0_sp
        if drop_tol > 0.0:
            A = A.copy()
            scale = max(np.abs(A.data).max() if A.nnz else 1.0, 1e-300)
            A.data[np.abs(A.data) < drop_tol * scale] = 0.0
            A.eliminate_zeros()
        return A

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        rc = self.phiT.matvec(r)
        zc = self.A0_inv @ rc
        return self.phi.matvec(zc)

    def export_basis(self, domain, path: str, dofs_per_node: int = 1,
                     max_functions: int = 50) -> None:
        """Dump the GDSW coarse functions Φ for visualization (reference:
        Preconditioner::exportCoarseBasis, Preconditioner_decl.hpp:133-135)."""
        from feddlib_tpu.io.exporter import ExporterParaView

        phi = self.phi.to_scipy()
        exp = ExporterParaView(domain, path, "coarse_basis")
        nc = min(self.n_coarse, max_functions)
        for j in range(nc):
            exp.add_variable(f"phi_{j}", dofs_per_node)
        exp.save(0.0, {f"phi_{j}": phi[:, j].toarray().ravel()
                       for j in range(nc)})
        exp.close()


def _two_level_apply(ops, r):
    from feddlib_tpu.la.csr import ell_apply
    from feddlib_tpu.precond.schwarz import schwarz_op_apply

    l1_ops, coarse_ops = ops
    z = schwarz_op_apply(l1_ops, r)
    if coarse_ops is not None:
        phi_ops, phiT_ops, A0_inv = coarse_ops
        rc = ell_apply(phiT_ops, r)
        z = z + ell_apply(phi_ops, A0_inv @ rc)
    return z


def _two_level_mult_apply(ops, r):
    from feddlib_tpu.la.csr import ell_apply
    from feddlib_tpu.precond.schwarz import schwarz_op_apply

    l1_ops, coarse_ops, A_ops = ops
    z = schwarz_op_apply(l1_ops, r)
    if coarse_ops is not None:
        phi_ops, phiT_ops, A0_inv = coarse_ops
        r2 = r - ell_apply(A_ops, z)  # coarse acts on the UPDATED residual
        rc = ell_apply(phiT_ops, r2)
        z = z + ell_apply(phi_ops, A0_inv @ rc)
    return z


class TwoLevelSchwarz:
    """Two-level Schwarz: one-level overlapping Schwarz + GDSW/RGDSW
    coarse level (parametersPrec.xml: TwoLevel=true).  'Level Combination'
    Additive (default) applies both levels to the same residual;
    Multiplicative applies the coarse correction to the residual UPDATED by
    the first level (one extra SpMV per apply, typically fewer Krylov
    iterations — FROSch Level Combination)."""

    def __init__(self, A: CsrMatrix, unique_map: IndexMap,
                 node_part_sets: Optional[List[np.ndarray]] = None,
                 points: Optional[np.ndarray] = None,
                 dofs_per_node: int = 1, overlap: int = 1,
                 combine: str = "Restricted", null_space: str = "laplace",
                 dirichlet_mask: Optional[np.ndarray] = None,
                 rap: str = "host", blocks: Optional[List[dict]] = None,
                 variant: str = "GDSW",
                 level_combination: str = "Additive",
                 subdomain_solver: str = "auto",
                 ipou: Optional[dict] = None):
        if level_combination not in ("Additive", "Multiplicative"):
            raise ValueError(f"unknown level combination "
                             f"{level_combination!r}")
        self.level_combination = level_combination
        self.A = A
        self.level1 = SchwarzPreconditioner(A, unique_map, overlap=overlap,
                                            combine=combine,
                                            solver=subdomain_solver)
        try:
            self.coarse = GDSWCoarseOperator(
                A, unique_map, node_part_sets, points, dofs_per_node,
                null_space, dirichlet_mask, rap=rap, blocks=blocks,
                variant=variant, ipou=ipou)
        except ValueError as e:
            # tiny problems can have a fully-Dirichlet interface → no coarse
            # functions; degrade gracefully to one level
            import warnings

            warnings.warn(f"GDSW coarse space unavailable ({e}); "
                          "falling back to one-level Schwarz")
            self.coarse = None

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        z = self.level1.apply(r)
        if self.coarse is not None:
            if self.level_combination == "Multiplicative":
                r = r - self.A.matvec(z)
            z = z + self.coarse.apply(r)
        return z

    def operator(self):
        """(pure_fn, operands) for jit-argument solver programs."""
        l1_fn, l1_ops = self.level1.operator()
        mult = self.level_combination == "Multiplicative"
        if self.coarse is None:
            coarse_ops = None
        else:
            co = self.coarse
            coarse_ops = (co.phi.operator()[1], co.phiT.operator()[1],
                          co.A0_inv)
        from feddlib_tpu.precond.schwarz import schwarz_op_apply

        if l1_fn is schwarz_op_apply:  # module-level fns → jit-cache reuse
            if mult:
                return _two_level_mult_apply, (l1_ops, coarse_ops,
                                               self.A.operator()[1])
            return _two_level_apply, (l1_ops, coarse_ops)
        # sparse-LU level 1: compose through the instance's own apply fn
        from feddlib_tpu.la.csr import ell_apply

        if mult:
            A_ops = self.A.operator()[1]

            def f_mult(ops, r):
                l1_o, c_ops, A_o = ops
                z = l1_fn(l1_o, r)
                if c_ops is not None:
                    phi_ops, phiT_ops, A0_inv = c_ops
                    r2 = r - ell_apply(A_o, z)
                    z = z + ell_apply(phi_ops, A0_inv @ ell_apply(phiT_ops, r2))
                return z

            return f_mult, (l1_ops, coarse_ops, A_ops)

        def f_add(ops, r):
            l1_o, c_ops = ops
            z = l1_fn(l1_o, r)
            if c_ops is not None:
                phi_ops, phiT_ops, A0_inv = c_ops
                z = z + ell_apply(phi_ops, A0_inv @ ell_apply(phiT_ops, r))
            return z

        return f_add, (l1_ops, coarse_ops)


def distributed_two_level(dmat, part=None, points: Optional[np.ndarray] = None,
                          dofs_per_node: int = 1,
                          combine: str = "Restricted",
                          null_space: str = "laplace",
                          dirichlet_mask: Optional[np.ndarray] = None,
                          coarse_ranks: int = 0, variant: str = "GDSW",
                          overlap: int = 1,
                          blocks: Optional[List[dict]] = None,
                          factor: str = "host",
                          ipou: Optional[dict] = None,
                          coarse_procs: int = 0,
                          level_combination: str = "Additive",
                          coarse_solver: str = "dense",
                          coarse_tol: float = 1e-6,
                          coarse_maxiter: int = 200):
    """Two-level GDSW for the shard_map solver (DistributedSolver), built
    from the DistributedCsr ALONE — setup reads only per-device row views
    (DistributedCsr.local_rows); no global matrix is assembled anywhere.

    Level 1 reuses `distributed_schwarz` (overlap-k, on-device subdomain
    solves).  The coarse level is fully SPMD: each device holds the dense
    restriction of Φ to its owned rows [N_o, nc]; a coarse residual is the
    psum over devices of Φ_ownᵀ r (one ICI all-reduce of nc numbers — the
    two-level analog of the reference's gathered coarse solve,
    SURVEY.md §3.5 step 3), solved against A₀⁻¹ and prolonged locally.

    Single-variable problems pass (part, points, dofs_per_node); block
    systems (Stokes/NS — the FROSch MONOLITHIC path) pass `blocks`, the
    per-block specs of GDSWCoarseOperator (offset, node_part_sets, points,
    dofs_per_node, null_space).

    Coarse placement — the reference's Distribution sublist
    (parametersPrec.xml:104-110, Type/NumProcs/GatheringSteps):
    - coarse_ranks = 0, coarse_procs = 0: A₀⁻¹ replicated on every device
      (default; the coarse residual psum IS a hardware tree reduction over
      ICI, so the reference's staged 'GatheringSteps' lever is subsumed by
      the XLA collective schedule).
    - coarse_procs = k > 0: Distribution→NumProcs — A₀⁻¹ row-sharded over
      the FIRST k devices (which also keep their domain rows); coarse
      memory and the coarse matmul are confined to those devices and the
      correction is recovered with one all_gather.
    - coarse_ranks = k > 0: DEDICATED coarse devices — the reference's
      'Mpi Ranks Coarse' (Preconditioner_def.hpp:384-423): the matrix rows
      must live on the first n_dev − k devices (unique map built with
      `IndexMap.with_free_parts(k)`, the analog of buildUniqueMap's
      numFreeProcs); A₀⁻¹ is row-sharded over the LAST k devices only.

    Returns (build_fn, arrays)."""
    import jax.numpy as jnp
    from jax import lax

    from feddlib_tpu.parallel.spmd import AXIS
    from feddlib_tpu.precond.schwarz import distributed_schwarz

    build1, arrays1 = distributed_schwarz(dmat, overlap=overlap,
                                          combine=combine, factor=factor)
    n1 = len(arrays1)
    umap = dmat.unique_map
    n_dev = dmat.n_dev
    if coarse_ranks < 0 or coarse_ranks >= n_dev:
        raise ValueError("coarse_ranks must be in [0, n_dev)")
    if coarse_ranks:
        for p in range(n_dev - coarse_ranks, n_dev):
            if len(umap.partition_indices[p]):
                raise ValueError(
                    "dedicated coarse devices must own no matrix rows "
                    "(build the unique map with with_free_parts)")
    coarse = GDSWCoarseOperator(
        None, umap,
        part.repeated_map.partition_indices if part is not None else None,
        points, dofs_per_node, null_space, dirichlet_mask, variant=variant,
        blocks=blocks, row_source=dmat.local_rows, ipou=ipou)
    if level_combination not in ("Additive", "Multiplicative"):
        raise ValueError(f"unknown level combination {level_combination!r}")
    mult = level_combination == "Multiplicative"
    phi = coarse.phi.to_scipy()
    nc = coarse.n_coarse
    N_o = dmat.plan.N_o
    # COMPACT per-device Φ: only the coarse functions supported on this
    # device's owned rows (C_loc ≈ adjacent coarse fns, independent of nc —
    # the dense [N_o, nc] restriction grows linearly with the coarse
    # dimension and was the memory wall at pod scale)
    sup = []
    for p in range(n_dev):
        owned = umap.partition_indices[p]
        sup.append(np.unique(phi[owned].indices) if len(owned)
                   else np.zeros(0, np.int64))
    C_loc = max(max((len(s) for s in sup), default=1), 1)
    phi_comp = np.zeros((n_dev, N_o, C_loc))
    cids = np.full((n_dev, C_loc), nc, np.int64)  # pad -> zero slot nc
    for p in range(n_dev):
        owned = umap.partition_indices[p]
        s = sup[p]
        cids[p, : len(s)] = s
        if len(owned):
            sub = phi[owned].tocoo()
            phi_comp[p, sub.row, np.searchsorted(s, sub.col)] = sub.data
    arrays = list(arrays1) + [jnp.asarray(phi_comp),
                              jnp.asarray(cids.astype(np.int32))]

    # ---- coarse solver (reference CoarseSolver sublist) -----------------
    # Distribution (NumProcs / dedicated coarse ranks) composes with every
    # solver: for 'sparse'/'iterative' the k coarse devices hold the real
    # A₀ factors/values while the rest hold a padded IDENTITY system (their
    # solve is trivially exact on junk, then masked out), and the coarse
    # correction is recovered with one psum of nc numbers.
    if coarse_ranks and coarse_procs:
        raise ValueError("choose coarse_ranks OR coarse_procs")
    k = coarse_ranks or min(coarse_procs, n_dev)
    first = n_dev - k if coarse_ranks else 0  # trailing vs leading devices
    pick = (np.array([0 if first <= p < first + k else 1
                      for p in range(n_dev)]) if k
            else np.zeros(n_dev, np.int64))
    wts = (np.where(pick == 0, 1.0 / k, 0.0)[:, None] if k else None)
    sel = None
    lu_dims = None
    if coarse_solver == "sparse":
        # exact sparse-LU wavefront solve: setup O(nnz·fill), apply memory
        # O(nnz(LU)) — no dense nc x nc anywhere
        from feddlib_tpu.la.sparse_lu import BatchedSparseLU

        mats = [coarse.A0_sparse().tocsc()]
        if k:
            mats.append(sps.identity(nc, format="csc"))
        lu = BatchedSparseLU(mats)
        lu_arrs = lu.arrays()
        lu_dims = lu.dims
        for a in lu_arrs:
            if k:
                arrays.append(jnp.asarray(np.asarray(a)[pick][:, None]))
            else:
                arrays.append(jnp.broadcast_to(a, (n_dev,) + a.shape))
        if k:
            arrays.append(jnp.asarray(wts))
        S_lu = lu.S
    elif coarse_solver == "iterative":
        # GMRES(m) to tolerance on sparse-ELL A₀ — the reference's Belos
        # CoarseSolver (GMRES, tol 1e-6, ≤200 iters,
        # parametersPrec.xml:216-225); valid for nonsymmetric A₀.  The
        # tolerance-based inner solve makes M weakly nonlinear across
        # outer iterations; at 1e-6 the perturbation is far below the
        # outer 1e-8 convergence behavior (and matches the reference,
        # which runs plain GMRES around the same inner solver).
        A0s = coarse.A0_sparse()
        kmax = max(int(np.diff(A0s.indptr).max()), 1)
        ecols = np.zeros((2 if k else 1, nc, kmax), np.int32)
        evals = np.zeros((2 if k else 1, nc, kmax))
        for i in range(nc):
            lo, hi = A0s.indptr[i], A0s.indptr[i + 1]
            ecols[0, i, : hi - lo] = A0s.indices[lo:hi]
            evals[0, i, : hi - lo] = A0s.data[lo:hi]
        if k:  # identity system on non-coarse devices
            ecols[1, :, 0] = np.arange(nc)
            evals[1, :, 0] = 1.0
        if k:
            arrays += [jnp.asarray(evals[pick]), jnp.asarray(ecols[pick]),
                       jnp.asarray(wts)]
        else:
            arrays += [jnp.asarray(np.broadcast_to(evals[0],
                                                   (n_dev,) + evals[0].shape)),
                       jnp.asarray(np.broadcast_to(ecols[0],
                                                   (n_dev,) + ecols[0].shape))]
    elif k == 0:
        A0_inv = np.asarray(coarse.A0_inv)
        arrays.append(jnp.asarray(np.broadcast_to(A0_inv, (n_dev, nc, nc))))
    else:
        A0_inv = np.asarray(coarse.A0_inv)
        nc_s = -(-nc // k)  # ceil
        slab = np.zeros((n_dev, nc_s, nc))
        for j in range(k):
            rows = A0_inv[j * nc_s: min((j + 1) * nc_s, nc)]
            slab[first + j, : len(rows)] = rows
        arrays.append(jnp.asarray(slab))
        # static gather: coarse row j lives in the all_gather buffer at
        # (first + j // nc_s) * nc_s + j % nc_s
        sel = jnp.asarray(
            (first + np.arange(nc) // nc_s) * nc_s + np.arange(nc) % nc_s,
            jnp.int32)

    def build(prec_arrays, ctx):
        M1 = build1(prec_arrays[:n1], ctx)
        phi_p, cid = prec_arrays[n1], prec_arrays[n1 + 1]
        solver_arrs = prec_arrays[n1 + 2:]
        ed, ec, mk, imp_f, exp_f = ctx

        def A_loc(x):
            return jnp.sum(ed * imp_f(x)[ec], axis=0)

        def solve_A0(rc):
            if coarse_solver == "sparse":
                from feddlib_tpu.la.sparse_lu import BatchedSparseLU

                r_pad = jnp.zeros((1, S_lu), rc.dtype).at[0, :nc].set(rc)
                z = BatchedSparseLU.apply_ops(
                    tuple(solver_arrs[:-1] if k else solver_arrs), r_pad,
                    lu_dims)[0, :nc]
                if k:  # coarse-device results psum-recovered, rest masked
                    return lax.psum(z * solver_arrs[-1][0], AXIS)
                return z
            if coarse_solver == "iterative":
                evs, ecs = solver_arrs[0], solver_arrs[1]

                def A0mv(v):
                    return jnp.sum(evs * v[ecs], axis=1)

                from feddlib_tpu.solvers.krylov import gmres_loop

                z, _, _ = gmres_loop(A0mv, lambda r: r, rc,
                                     jnp.zeros_like(rc), coarse_tol,
                                     min(coarse_maxiter, nc),
                                     coarse_maxiter, axis_name=None)
                if k:
                    return lax.psum(z * solver_arrs[-1][0], AXIS)
                return z
            A0i = solver_arrs[0]
            if sel is None:
                return A0i @ rc  # replicated dense solve
            zc_slab = A0i @ rc   # [nc_s]; nonzero on coarse devices only
            return lax.all_gather(zc_slab, AXIS).reshape(-1)[sel]

        def coarse_corr(r):
            q = phi_p.T @ r                          # [C_loc]
            rc = lax.psum(
                jnp.zeros(nc + 1, q.dtype).at[cid].add(q), AXIS)[:nc]
            zc = solve_A0(rc)
            zg = jnp.concatenate([zc, jnp.zeros(1, zc.dtype)])[cid]
            return phi_p @ zg

        def M(r):
            z1 = M1(r)
            if mult:
                # z = z1 + Φ A0⁻¹ Φᵀ (r − A z1) — FROSch 'Level
                # Combination': coarse acts on the level-1-updated residual
                return z1 + coarse_corr(r - A_loc(z1))
            return z1 + coarse_corr(r)

        return M

    return build, arrays
