"""One-level overlapping Schwarz preconditioner — the FROSch
AlgebraicOverlappingOperator equivalent (SURVEY.md §2.8, the largest rebuild
item).

Reference semantics (configured by parametersPrec.xml):
- subdomains = the DD partitions; overlap grown `Overlap` layers through the
  matrix graph (algebraic, not geometric);
- each subdomain problem factorized once (KLU in the reference) and solved
  per apply;
- combine modes on overlap: Restricted (each dof updated only by its owner),
  Full (sum), Averaging (sum / multiplicity).

TPU-native design: subdomain solves are *batched dense* applies.  Subdomain
matrices are extracted host-side, padded to a uniform size S, factorized on
the host (f64 LU), and their explicit inverses shipped to the device as one
[P, S, S] tensor; an apply is then

    z_ov[p] = Ainv[p] @ r_ov[p]            (batched matmul — MXU)

with gathers/scatters for restrict/prolong.  Dense-padded batching trades
FLOPs for perfect regularity, which is the right trade on the MXU at
reference-scale subdomain sizes (SURVEY.md §7 hard part 1).  A Pallas
sparse-triangular-solve path can replace the explicit inverse later without
changing this interface.

Serial (single-chip) and distributed (shard_map) applies share the same
host-built data.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sps

from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.la.map import IndexMap


def grow_overlap(csr: sps.csr_matrix, seed_rows: np.ndarray,
                 layers: int) -> np.ndarray:
    """Grow `layers` of overlap through the matrix graph from seed rows
    (FROSch AlgebraicOverlappingOperator overlap growth).  Returns the sorted
    dof set."""
    current = np.unique(seed_rows)
    reach = current
    for _ in range(layers):
        # neighbors of current set = column support of those rows
        sub = csr[reach]
        reach = np.unique(sub.indices)
        current = np.union1d(current, reach)
    return current


#: counters of regularized subdomain factorizations since process start —
#: {"pinned": per-subdomain pressure-dof pins, "shifted": diagonal-shift
#: fallbacks, "pinv": pseudo-inverse last resorts}.  The reference relies
#: on KLU pivot perturbations and is silent about them; we count and WARN
#: (round-1 review: a shifted/pseudo-inverse silently changes the
#: preconditioner).
ROBUST_INVERSE_STATS = {"pinned": 0, "shifted": 0, "pinv": 0}


def _robust_inverse(block: np.ndarray) -> np.ndarray:
    """Dense inverse with structured fallbacks for singular subdomain
    blocks.  Saddle-point subdomains (Stokes/NS) carry a local
    constant-pressure null space: interior subdomains see div u = 0 with
    no pressure anchor, so the block is EXACTLY singular.  The reference
    gets by on KLU pivot perturbations; here the first fallback is the
    structured fix — PIN one zero-diagonal (pressure) dof per subdomain
    (unit row/column), which deflates the constant-pressure mode exactly
    and leaves every other dof's solve untouched.  Only if that still
    fails (singularity not of pressure type) do we fall back to a
    diagonal shift, then pseudo-inverse.  Every fallback is counted in
    ROBUST_INVERSE_STATS and reported."""
    import warnings

    scale = np.abs(block).max() or 1.0
    zd_all = np.flatnonzero(np.abs(np.diag(block)) <= 1e-14 * scale)
    try:
        out = np.linalg.inv(block)
        # LAPACK getri "succeeds" on numerically singular blocks with
        # ~1/eps entries.  Only blocks carrying the saddle-point
        # SIGNATURE (zero-diagonal pressure dofs) get a quality gate —
        # an ill-conditioned but nonsingular block must keep its exact
        # inverse (err grows like eps·cond(A), which would trip any
        # fixed threshold on fine/anisotropic meshes).
        if not len(zd_all):
            return out
        cols = zd_all[:8]
        err = np.abs(block @ out[:, cols]
                     - np.eye(block.shape[0])[:, cols]).max()
        if np.isfinite(err) and err < 1e-6:
            return out
    except np.linalg.LinAlgError:
        pass
    zd = zd_all
    if len(zd):
        pinned = block.copy()
        j = int(zd[0])
        pinned[j, :] = 0.0
        pinned[:, j] = 0.0
        pinned[j, j] = scale
        try:
            out = np.linalg.inv(pinned)
            ROBUST_INVERSE_STATS["pinned"] += 1
            warnings.warn(
                f"singular subdomain block: pinned local pressure dof "
                f"{j} (constant-pressure deflation; total pinned: "
                f"{ROBUST_INVERSE_STATS['pinned']})", RuntimeWarning)
            return out
        except np.linalg.LinAlgError:
            pass
    for eps in (1e-12, 1e-10, 1e-8):
        try:
            out = np.linalg.inv(block + eps * scale * np.eye(len(block)))
            ROBUST_INVERSE_STATS["shifted"] += 1
            warnings.warn(
                f"singular subdomain block regularized with diagonal "
                f"shift {eps:g}*|A| (total shifted: "
                f"{ROBUST_INVERSE_STATS['shifted']})", RuntimeWarning)
            return out
        except np.linalg.LinAlgError:
            continue
    ROBUST_INVERSE_STATS["pinv"] += 1
    warnings.warn(
        f"subdomain block pseudo-inverted (total pinv: "
        f"{ROBUST_INVERSE_STATS['pinv']}) — preconditioner differs "
        f"from an exact subdomain solve", RuntimeWarning)
    return np.linalg.pinv(block)


class SchwarzPreconditioner:
    """One-level additive/restricted Schwarz built from a global matrix and
    a unique (owned) dof map."""

    def __init__(self, A: CsrMatrix, unique_map: IndexMap, overlap: int = 1,
                 combine: str = "Restricted", dtype=jnp.float64,
                 device_factor: Optional[bool] = None,
                 solver: str = "auto"):
        """solver: 'dense' ([P,S,S] explicit inverses — O(S³) setup),
        'sparse' (batched sparse LU + wavefront triangular device applies,
        setup O(nnz·fill) — the Amesos2/KLU role, la/sparse_lu.py), or
        'auto' (sparse once subdomains exceed ~1k dofs)."""
        if combine not in ("Restricted", "Full", "Averaging"):
            raise ValueError(f"unknown combine mode {combine!r}")
        if solver not in ("auto", "dense", "sparse"):
            raise ValueError(f"unknown subdomain solver {solver!r}")
        self.combine = combine
        self.n = A.shape[0]
        self.n_parts = unique_map.n_parts
        sp = A.to_scipy()
        # On-device factorization avoids uploading [P,S,S] inverses over the
        # ~7 MB/s tunnel: ship small index plans, scatter the (device-
        # resident) matrix values into padded subdomain blocks, and run a
        # batched LU inverse on the accelerator.  TPU has no f64 LU — the
        # host path remains the f64/default-robust fallback.
        if device_factor is None:
            device_factor = (jnp.dtype(dtype) == jnp.float32
                             and jax.devices()[0].platform != "cpu")

        ov_sets: List[np.ndarray] = []
        for p in range(self.n_parts):
            owned = unique_map.partition_indices[p]
            ov = grow_overlap(sp, owned, overlap) if overlap > 0 else owned
            ov_sets.append(ov)
        self.ov_sets = ov_sets
        S = max(len(o) for o in ov_sets)
        self.S = S
        P_ = self.n_parts
        if solver == "auto":
            # dense [P,S,S] inverses win APPLY time up to a few thousand
            # dofs (one batched MXU matmul vs T_L+T_U latency-bound
            # wavefront steps); sparse LU wins SETUP time and memory as
            # S grows (O(S³)/O(P·S²) vs O(nnz·fill)) — cross over at 4k
            solver = "sparse" if S >= 4096 else "dense"
        self.solver = solver

        owner = unique_map.owner_of()
        ov_idx = np.full((P_, S), self.n, dtype=np.int64)  # pad → extra slot
        keep = np.zeros((P_, S), dtype=np.float64)
        mult = np.zeros(self.n, dtype=np.float64)
        for p in range(P_):
            ov = ov_sets[p]
            k = len(ov)
            ov_idx[p, :k] = ov
            if combine == "Restricted":
                keep[p, :k] = (owner[ov] == p).astype(np.float64)
            else:
                keep[p, :k] = 1.0
                mult[ov] += 1.0

        self.slu = None
        if self.solver == "sparse":
            from feddlib_tpu.la.sparse_lu import BatchedSparseLU

            self.slu = BatchedSparseLU([sp[ov][:, ov].tocsc()
                                        for ov in ov_sets], S, dtype=dtype)
            self.inv = None
        elif device_factor:
            # slot-carrying trick: a CSR copy whose values are the slot ids
            # survives scipy's submatrix extraction
            spi = sp.copy()
            spi.data = np.arange(sp.nnz, dtype=np.float64)
            flat_l, slot_l, eye_l = [], [], []
            for p in range(P_):
                ov = ov_sets[p]
                k = len(ov)
                sub = spi[ov][:, ov].tocoo()
                flat_l.append(p * S * S + sub.row.astype(np.int64) * S
                              + sub.col)
                slot_l.append(sub.data.astype(np.int64))
                eye_l.append(p * S * S + np.arange(k, S) * (S + 1))
            flat = np.concatenate(flat_l)
            slots = np.concatenate(slot_l)
            eye_idx = np.concatenate(eye_l) if eye_l else np.zeros(0, np.int64)
            vals = A.data.astype(dtype)[jnp.asarray(slots)]
            blocks = (jnp.zeros(P_ * S * S, dtype)
                      .at[jnp.asarray(flat)].set(vals)
                      .at[jnp.asarray(eye_idx)].set(1.0)
                      .reshape(P_, S, S))
            # tiny diagonal shift guards exactly-singular saddle blocks
            shift = 1e-6 if jnp.dtype(dtype) == jnp.float32 else 1e-12
            diag = jnp.arange(S)
            blocks = blocks.at[:, diag, diag].add(
                shift * jnp.abs(blocks).max())
            self.inv = jnp.linalg.inv(blocks)
        else:
            inv = np.zeros((P_, S, S), dtype=np.float64)
            for p in range(P_):
                ov = ov_sets[p]
                k = len(ov)
                block = np.eye(S)
                block[:k, :k] = sp[ov][:, ov].toarray()
                inv[p] = _robust_inverse(block)
            self.inv = jnp.asarray(inv, dtype)

        self.ov_idx = jnp.asarray(ov_idx)
        self.keep = jnp.asarray(keep, dtype)
        if combine == "Averaging":
            scale = np.where(mult > 0, 1.0 / np.where(mult == 0, 1, mult), 0.0)
            self.avg_scale = jnp.asarray(scale, dtype)
        else:
            self.avg_scale = None

    # -- serial (single-device, batched over subdomains) --------------------
    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """z = Σ_p R_pᵀ D_p A_p⁻¹ R_p r  (batched on one device)."""
        r_pad = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
        r_ov = r_pad[self.ov_idx]  # [P, S]
        if self.slu is not None:
            z_ov = self.slu.solve(r_ov)  # batched wavefront sparse solve
        else:
            z_ov = jnp.einsum("pij,pj->pi", self.inv, r_ov)
        z_ov = z_ov * self.keep
        z = jnp.zeros(self.n + 1, r.dtype).at[self.ov_idx.reshape(-1)].add(
            z_ov.reshape(-1))[: self.n]
        if self.avg_scale is not None:
            z = z * self.avg_scale
        return z

    def __call__(self, r):
        return self.apply(r)

    def operator(self):
        """(pure_fn, operands) form for jit-argument solver programs."""
        dtype = self.keep.dtype
        scale = (self.avg_scale if self.avg_scale is not None
                 else jnp.ones(self.n, dtype))
        if self.slu is not None:
            dims = self.slu.dims

            def sparse_apply(ops, r):
                ov_idx, keep, scale = ops[:3]
                slu_ops = ops[3:]
                from feddlib_tpu.la.sparse_lu import BatchedSparseLU

                n = r.shape[0]
                r_pad = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
                r_ov = r_pad[ov_idx]
                z_ov = BatchedSparseLU.apply_ops(slu_ops, r_ov, dims) * keep
                z = jnp.zeros(n + 1, r.dtype).at[ov_idx.reshape(-1)].add(
                    z_ov.reshape(-1))[:n]
                return z * scale

            return sparse_apply, (self.ov_idx, self.keep, scale,
                                  *self.slu.arrays())
        return schwarz_op_apply, (self.ov_idx, self.keep, self.inv, scale)


def schwarz_op_apply(ops, r):
    ov_idx, keep, inv, scale = ops
    n = r.shape[0]
    r_pad = jnp.concatenate([r, jnp.zeros(1, r.dtype)])
    r_ov = r_pad[ov_idx]
    z_ov = jnp.einsum("pij,pj->pi", inv, r_ov) * keep
    z = jnp.zeros(n + 1, r.dtype).at[ov_idx.reshape(-1)].add(
        z_ov.reshape(-1))[:n]
    return z * scale


def distributed_schwarz(dmat, overlap: int = 1, combine: str = "Restricted",
                        factor: str = "host"):
    """One-level overlapping Schwarz for the shard_map solver, built from
    the DistributedCsr ALONE — no global matrix (the FROSch
    AlgebraicOverlappingOperator: overlap grown `Overlap` layers through
    the matrix graph, parametersPrec.xml:20).

    Returns (build_fn, arrays) for DistributedSolver.solve(precond=...).

    The overlap-k dof set of each device gets its OWN halo plan (ppermute
    rounds) for the residual restriction and — for the Full/Averaging
    combine — the reverse export of overlap corrections; overlap-1 then
    coincides with the SpMV column map, larger overlaps reach further.
    Subdomain matrices are addressed through the symbolic locator and
    factorized from per-device value pulls (host f64 — the KLU role) or on
    device (factor="device", batched f32 LU)."""
    import jax
    import jax.numpy as jnp

    from feddlib_tpu.parallel.spmd import HaloPlan

    if combine not in ("Restricted", "Full", "Averaging"):
        raise ValueError(f"unknown combine mode {combine!r}")
    if overlap < 1:
        raise ValueError("overlap must be >= 1")
    unique_map = dmat.unique_map
    n_dev, N_o = dmat.n_dev, dmat.plan.N_o
    loc = dmat.locator()
    owner = unique_map.owner_of()

    ov_sets, mult = [], np.zeros(dmat.n_global)
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        ov = grow_overlap(loc, owned, overlap) if len(owned) else owned
        ov_sets.append(ov)
        mult[ov] += 1.0
    S = max(max(len(o) for o in ov_sets), 1)

    # dedicated overlap halo plan: col map = owned ++ (ov \ owned)
    ov_col_gids = []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        extra = np.setdiff1d(ov_sets[p], owned)
        ov_col_gids.append(np.concatenate([owned, extra]))
    ovplan = HaloPlan(unique_map, ov_col_gids)
    G_ov = ovplan.G

    # subdomain blocks through the locator (+ identity padding)
    import scipy.sparse as sps

    vals_flat = None if factor == "device" else dmat.values_host()
    inv_l, ov_col_l, keep_l, own_pos_l, sub_l = [], [], [], [], []
    gat_src, gat_dst = [], []  # device-factor gather plans
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        n_own = len(owned)
        ov = ov_sets[p]
        k = len(ov)
        sub = loc[ov][:, ov].tocoo()
        if factor == "device":
            gat_src.append(sub.data.astype(np.int64) - 1)
            gat_dst.append(p * S * S + sub.row.astype(np.int64) * S + sub.col)
        elif factor == "sparse":
            vals = vals_flat[sub.data.astype(np.int64) - 1]
            sub_l.append(sps.csr_matrix((vals, (sub.row, sub.col)),
                                        shape=(max(k, 1), max(k, 1))))
        else:
            block = np.zeros((S, S))
            block[np.arange(k, S), np.arange(k, S)] = 1.0  # identity padding
            block[sub.row, sub.col] = vals_flat[sub.data.astype(np.int64) - 1]
            inv_l.append(_robust_inverse(block))
        # overlap gids → overlap-plan column-local ids
        lookup = np.zeros(dmat.n_global, dtype=np.int64)
        lookup[owned] = np.arange(n_own)
        extra = ov_col_gids[p][n_own:]
        lookup[extra] = N_o + np.arange(len(extra))
        oc = np.zeros(S, dtype=np.int32)
        oc[:k] = lookup[ov]
        ov_col_l.append(oc)
        keep = np.zeros(S)
        keep[:k] = (owner[ov] == p) if combine == "Restricted" else 1.0
        keep_l.append(keep)
        pos = np.searchsorted(ov, owned)
        op_ = np.zeros(N_o, dtype=np.int32)
        op_[:n_own] = pos
        own_pos_l.append(op_)

    slu = None
    if factor == "device":
        src = _pad_like(gat_src, 0)
        dst = _pad_like(gat_dst, n_dev * S * S)  # pad → extra dump slot
        flat = dmat.ell_data.reshape(-1)
        blocks = (jnp.zeros(n_dev * S * S + 1, flat.dtype)
                  .at[jnp.asarray(dst)].set(flat[jnp.asarray(src)])
                  [:-1].reshape(n_dev, S, S))
        eye = jnp.eye(S, dtype=flat.dtype)
        fill = jnp.asarray(
            np.stack([(np.arange(S) >= len(o)).astype(np.float64)
                      for o in ov_sets]))
        blocks = blocks + eye[None] * fill[:, :, None]
        # tiny diagonal shift guards exactly-singular saddle blocks (the
        # KLU pivot-perturbation role; cf. SchwarzPreconditioner)
        shift = 1e-6 if blocks.dtype == jnp.float32 else 1e-12
        diag = jnp.arange(S)
        blocks = blocks.at[:, diag, diag].add(shift * jnp.abs(blocks).max())
        inv = jnp.linalg.inv(blocks)
    elif factor == "sparse":
        from feddlib_tpu.la.sparse_lu import BatchedSparseLU

        slu = BatchedSparseLU(sub_l, S)
        inv = None
    else:
        inv = jnp.asarray(np.stack(inv_l))

    scale_l = []
    for p in range(n_dev):
        owned = unique_map.partition_indices[p]
        sc = np.zeros(N_o)
        sc[: len(owned)] = 1.0 / np.maximum(mult[owned], 1.0)
        scale_l.append(sc)

    imp_tree = ovplan.import_arrays
    exp_tree = ovplan.export_arrays
    imp_leaves, imp_def = jax.tree.flatten(imp_tree)
    exp_leaves, exp_def = jax.tree.flatten(exp_tree)
    n_imp, n_exp = len(imp_leaves), len(exp_leaves)
    ov_imp = ovplan.importer()
    ov_exp = ovplan.exporter()

    head = [jnp.asarray(np.stack(ov_col_l)),
            jnp.asarray(np.stack(keep_l)),
            jnp.asarray(np.stack(own_pos_l)),
            jnp.asarray(np.stack(scale_l))]
    if slu is not None:
        head = head + list(slu.arrays())
        dims = slu.dims
    else:
        head = [inv] + head
    n_head = len(head)
    arrays = head + imp_leaves + exp_leaves

    def build(prec_arrays, ctx):
        _, _, mask, _, _ = ctx
        if slu is not None:
            ov_col, keep, own_pos, scale = prec_arrays[:4]
            slu_ops = prec_arrays[4:n_head]

            def solve_sub(r_ov):
                from feddlib_tpu.la.sparse_lu import solve_one

                return solve_one((r_ov, *slu_ops), dims)
        else:
            inv_p, ov_col, keep, own_pos, scale = prec_arrays[:5]

            def solve_sub(r_ov):
                return inv_p @ r_ov
        ia = jax.tree.unflatten(imp_def,
                                prec_arrays[n_head: n_head + n_imp])
        ea = jax.tree.unflatten(
            exp_def, prec_arrays[n_head + n_imp: n_head + n_imp + n_exp])

        def M(r):
            r_col = ov_imp(r, ia)  # [N_o + G_ov]
            r_ov = r_col[ov_col]  # [S]
            z_ov = solve_sub(r_ov) * keep
            if combine == "Restricted":
                z = z_ov[own_pos] * mask
            else:
                z_col = jax.ops.segment_sum(z_ov, ov_col,
                                            num_segments=N_o + G_ov)
                z = ov_exp(z_col, ea) * mask
                if combine == "Averaging":
                    z = z * scale
            return z

        return M

    return build, arrays


def _pad_like(arrs, pad):
    w = max(max((len(a) for a in arrs), default=0), 1)
    out = np.full((len(arrs), w), pad, dtype=np.int64)
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out
