"""Dense row-cluster SpMV — the TPU fast path for sparse operators.

Motivation (measured on v5e, honest fetch-based timing): XLA lowers TPU
gathers/scatters to a ~15 ns/element serial path, so ELL/CSR SpMV runs at
~0.05 Gnnz/s regardless of locality — two orders below the HBM roofline.
The MXU, however, streams dense blocks at full bandwidth.  So we trade
FLOPs for regularity (SURVEY.md §7 hard part 1's "dense-blocked" option,
applied to the operator itself):

- rows are clustered by the mesh partition (RCB ⇒ compact supports) and
  renumbered into a PADDED cluster space of stride R: row k of cluster p
  lives at padded id p·R + k (pad lanes hold zeros);
- each cluster stores one dense block [R, R + G]: its rows restricted to
  [own columns | ghost columns];
- apply:  y.reshape(P, R) = einsum('prs,ps->pr', blocks,
          [x.reshape(P, R) | halo])
  — one batched MXU contraction + ONE small exchange of the inter-cluster
  halo (O(cut) elements, not O(nnz)).

Halo exchange layout (measured on v5e): a scalar gather x[ghost_idx] costs
~6 ns/element (XLA serializes sub-lane gathers) — 0.6 ms/apply at 94k
ghosts, dominating the 0.38 ms roofline GEMV.  The ghosts are instead
gathered by a 0/1 PLAN-MATRIX windowed-SELL SpMV (la/sell.py): the SELL
kernel performs the lane gather in-register, so the HBM cost is the
~6 B/ghost slot stream (≈7 MB on the bench layout).  The previous scheme
(128-lane row gather + one-hot lane contraction) was exact but streamed
2·P·G·128·4 B ≈ 130 MB per apply — 60% of the level-1 inverse itself.

Memory/FLOP overhead ≈ (R + G) / row_nnz ≈ 20-60×; on TPU that converts a
gather-serial 60 ms SpMV into a bandwidth-bound few-ms one.  The same
blocks double as overlap-1 Schwarz subdomain matrices.

Vector convention: hot-loop vectors live in the padded-clustered space
[P*R] (pad lanes zero).  `to_padded` / `from_padded` convert (each costs
one gather — keep whole Krylov loops padded).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.la.csr import CsrMatrix


def _round_up(x, m):
    return ((x + m - 1) // m) * m


_LANES = 128  # TPU lane width; ghost rows are gathered at this granularity


def rebalance_row_clusters(sp, row_cluster, n_parts=None,
                           max_passes: int = 32) -> np.ndarray:
    """Deterministically even out cluster sizes by moving boundary rows of
    over-full clusters to column-adjacent under-full clusters.

    The padded cluster size R = max cluster count sets the [P, R, W] HBM
    stream of the dense-block layout AND the padded-space vector length
    P*R; lowest-rank ownership arbitration (IndexMap.build_unique_map)
    piles boundary nodes onto low-id parts (measured: R = 400 vs mean 269
    on the 256-cluster bench layout — a 1.5x tax on every level-1 byte).
    Only rows with an out-of-cluster matrix column ever move, so clusters
    stay geometrically compact; purely a layout optimization — Schwarz
    subdomains follow the new clusters, preconditioner quality is
    unchanged (same measured iteration counts)."""
    indptr, indices = sp.indptr, sp.indices
    rc0 = np.asarray(row_cluster).astype(np.int32)
    rc = rc0.copy()
    P = int(n_parts if n_parts is not None else rc.max() + 1)
    n = len(rc)
    target = -(-n // P)
    row_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    BIG = np.iinfo(np.int64).max

    def _rank_within(groups):
        o = np.argsort(groups, kind="stable")
        rk = np.empty(len(groups), np.int64)
        uniq, start = np.unique(groups[o], return_index=True)
        rk[o] = np.arange(len(groups)) - start[
            np.searchsorted(uniq, groups[o])]
        return rk

    for _ in range(max_passes):
        counts = np.bincount(rc, minlength=P).astype(np.int64)
        if counts.max() <= target:
            break
        # per row: least-loaded FOREIGN neighbor cluster (tie → lowest id)
        col_c = rc[indices]
        key = np.where(col_c != rc[row_of],
                       counts[col_c] * P + col_c, BIG)
        best = np.full(n, BIG)
        np.minimum.at(best, row_of, key)
        dst = (best % P).astype(np.int32)
        # DIFFUSION, not surplus-only shedding: any strictly-downhill move
        # is allowed, capped at half the (src,dst) count difference —
        # at-target intermediate clusters must pass load through, else the
        # over-full clusters stay walled in (observed: max never moved)
        cand = np.flatnonzero((best != BIG)
                              & (counts[rc] > best // P + 1))
        if len(cand) == 0:
            break
        src_c, dst_c = rc[cand], dst[cand]
        pair = src_c.astype(np.int64) * P + dst_c
        # per-pair cap: half the count difference; per-dst TOTAL inflow
        # cap: half the gap to its largest candidate source — without it,
        # every over-full neighbor dumps into the same least-loaded
        # cluster and the layout oscillates instead of converging;
        # per-src TOTAL outflow cap: half the gap to its smallest
        # candidate dst — without it a small cluster bordered by several
        # even-smaller ones can be drained below target (even to empty)
        # in one pass
        smax = np.zeros(P, np.int64)
        np.maximum.at(smax, dst_c, counts[src_c])
        dmin = np.full(P, np.iinfo(np.int64).max)
        np.minimum.at(dmin, src_c, counts[dst_c])
        keep = ((_rank_within(pair) < (counts[src_c] - counts[dst_c]) // 2)
                & (_rank_within(dst_c) < (smax[dst_c] - counts[dst_c]) // 2)
                & (_rank_within(src_c) < (counts[src_c] - dmin[src_c]) // 2))
        sel = cand[keep]
        if len(sel) == 0:
            break
        rc[sel] = dst[sel]
    if np.bincount(rc, minlength=P).max() > np.bincount(
            rc0, minlength=P).max():
        return rc0  # diffusion oscillated — keep the input layout
    return rc


class DenseBlockSpMV:
    def __init__(self, blocks, ghost_idx, n: int, pad_of_old, old_of_pad,
                 dtype=jnp.float64):
        self.blocks = blocks  # [P, R, R+G]
        self.ghost_idx = ghost_idx  # [P, G] padded ids (pad → P*R slot = 0)
        self.n = n
        self.P, self.R = blocks.shape[0], blocks.shape[1]
        self.G = ghost_idx.shape[1]
        self.pad_of_old = pad_of_old  # [n] old dof → padded id
        self.old_of_pad = old_of_pad  # [P*R] padded id → old dof (pad → n)
        self.dtype = dtype
        # ghost gather as a 0/1 PLAN-MATRIX SELL SpMV: ghosts.ravel() =
        # plan[P*G, M] @ xp with exactly one 1 per real ghost row (pad
        # entries point at slot M = P*R and simply have no plan entry).
        # The windowed-SELL kernel does the lane gather in-register, so
        # the HBM cost is the ~6 B/ghost slot stream (≈7 MB on the bench
        # layout) — the previous 128-lane row-gather + one-hot contraction
        # streamed 2·P·G·128·4 B ≈ 130 MB per apply, ~60% of the level-1
        # inverse itself.
        self.ghost_plan = _build_ghost_plan(np.asarray(ghost_idx),
                                            self.P * self.R, dtype)

    @classmethod
    def from_csr(cls, A: CsrMatrix, row_cluster: np.ndarray,
                 dtype=jnp.float64, balance: bool = False) -> "DenseBlockSpMV":
        n = A.shape[0]
        if A.shape[0] != A.shape[1]:
            raise ValueError("square matrices only")
        sp = A.to_scipy().tocsr()
        row_cluster = np.asarray(row_cluster)
        if balance:
            row_cluster = rebalance_row_clusters(sp, row_cluster)
        P = int(row_cluster.max()) + 1
        counts = np.bincount(row_cluster, minlength=P)
        R = _round_up(int(counts.max()), 8)

        order = np.argsort(row_cluster, kind="stable")  # cluster-sorted olds
        starts = np.concatenate([[0], np.cumsum(counts)])
        pad_of_old = np.empty(n, dtype=np.int64)
        old_of_pad = np.full(P * R, n, dtype=np.int64)
        for p in range(P):
            olds = order[starts[p]:starts[p + 1]]
            pad_ids = p * R + np.arange(len(olds))
            pad_of_old[olds] = pad_ids
            old_of_pad[pad_ids] = olds

        # fully vectorised block fill (a per-cluster Python loop is minutes
        # at P≈512; this is <1s)
        coo = sp.tocoo()
        pr = pad_of_old[coo.row]
        pc = pad_of_old[coo.col]
        pcl = pr // R  # cluster of each entry
        lrow = pr - pcl * R
        own = (pc // R) == pcl

        M = P * R
        gkey = pcl[~own].astype(np.int64) * M + pc[~own]
        guniq, ginv = np.unique(gkey, return_inverse=True)
        gp = (guniq // M).astype(np.int64)
        gc = (guniq % M).astype(np.int64)
        gcounts = np.bincount(gp, minlength=P)
        G = max(int(gcounts.max()) if len(gcounts) else 1, 1)
        # width alignment: 8 sublanes — but NOT a multiple of 128 lanes.
        # Measured on v5e (round 5, [544,128,W] bf16 batched matvec inside
        # a fori_loop): W % 128 == 0 runs the plain HBM-streamed pipeline
        # (~78-100 us), while any 8-aligned non-128-multiple W lets XLA
        # promote the loop-invariant inverse into VMEM (~35-45 us, above
        # the HBM roofline — the win of v5e's large VMEM for
        # loop-invariant preconditioner data).
        G = _round_up(R + G, 8) - R
        if (R + G) % 128 == 0:
            G += 8
        gstart = np.concatenate([[0], np.cumsum(gcounts)])
        gpos = np.arange(len(guniq)) - gstart[gp]

        ghost_idx = np.full((P, G), M, dtype=np.int32)  # pad → zero slot
        ghost_idx[gp, gpos] = gc.astype(np.int32)

        loc = np.where(own, pc - pcl * R, 0)
        loc[~own] = R + gpos[ginv]
        # build the dense blocks ON DEVICE: ship one int64 scatter plan and
        # reuse the (device-resident) matrix values — host→device bandwidth
        # is ~7 MB/s on tunneled backends, so uploading the P·R·(R+G)
        # tensor itself takes minutes.  scipy CSR→COO preserves the CSR slot
        # order, so coo entries align with A.data elementwise.
        flat = (pcl.astype(np.int64) * (R * (R + G))
                + lrow.astype(np.int64) * (R + G) + loc)
        data_dev = A.data.astype(dtype)
        blocks = _scatter_blocks(data_dev, jnp.asarray(flat), P, R, G)
        return cls(blocks, jnp.asarray(ghost_idx), n,
                   jnp.asarray(pad_of_old), jnp.asarray(old_of_pad), dtype)

    # -- vector layout -------------------------------------------------------
    def to_padded(self, x: jnp.ndarray) -> jnp.ndarray:
        src = jnp.concatenate([jnp.asarray(x, self.dtype),
                               jnp.zeros(1, self.dtype)])
        return src[self.old_of_pad]

    def from_padded(self, xp: jnp.ndarray) -> jnp.ndarray:
        return xp[self.pad_of_old]

    # -- applies -------------------------------------------------------------
    def matvec_padded(self, xp: jnp.ndarray) -> jnp.ndarray:
        """xp [P*R] padded-clustered (pad lanes zero) → y [P*R] padded."""
        return _dense_block_mv(self.blocks, self.ghost_idx, self.ghost_plan,
                               xp, self.P, self.R)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Original-ordering convenience apply (permutes in and out)."""
        return self.from_padded(self.matvec_padded(self.to_padded(x)))

    def operator(self):
        """(pure_fn, operands) for jit-argument solver programs
        (original-ordering vectors)."""
        return dense_block_op, (self.blocks, self.ghost_idx,
                                self.ghost_plan,
                                self.pad_of_old, self.old_of_pad)

    def padded_operator(self):
        """(pure_fn, operands) acting on PADDED-clustered vectors [P*R] —
        run whole Krylov loops in padded space (pad lanes stay zero, so
        dots/norms agree with the original ordering) and skip the two
        permutation gathers per apply that `operator()` pays."""
        return dense_block_padded_op, (self.blocks, self.ghost_idx,
                                       self.ghost_plan)


def _build_ghost_plan(gi: np.ndarray, M: int, dtype):
    """PermutationGather operand tuple for ghosts.ravel() = xp[gi.ravel()]
    (pad entries gi == M -> 0.0).

    Round-3 history: the gather was a 0/1 plan-matrix windowed-SELL SpMV
    — in-register, but the E=8 slot padding made each 128-row chunk touch
    up to 16 column windows, so the K-pass select loop cost ~140 us at the
    bench layout (~60% of a level-1 apply).  The dedicated permutation
    kernel (la/permute.py) needs no reduction and runs ONE gather pass
    (~15 us for the same plan)."""
    from feddlib_tpu.la.permute import PermutationGather

    flat = gi.ravel().astype(np.int64)
    pg = PermutationGather(np.where(flat < M, flat, -1), M)
    return pg.operands()


def _gather_ghosts(ghost_idx, ghost_plan, xp):
    """xp [M] padded-clustered → ghosts [P, G].

    TPU: windowed permutation-gather Pallas kernel (la/permute.py).
    CPU: plain scalar gather (fast there).  Trace-time branch — the
    backend is fixed per process."""
    P, G = ghost_idx.shape
    if jax.default_backend() == "cpu":
        src = jnp.concatenate([xp, jnp.zeros(1, xp.dtype)])
        return src[ghost_idx]
    from feddlib_tpu.la.permute import _permute_apply

    y = _permute_apply(*ghost_plan, xp, P * G, xp.shape[0])
    return y.reshape(P, G).astype(xp.dtype)


def dense_block_op(ops, x):
    """Pure operator: ops = (blocks [P,R,R+G], ghost_idx [P,G],
    ghost_plan (SELL operands), pad_of_old [n], old_of_pad [P*R])."""
    blocks, ghost_idx, ghost_plan, pad_of_old, old_of_pad = ops
    src = jnp.concatenate([x, jnp.zeros(1, x.dtype)])
    xp = src[old_of_pad]
    P, R = blocks.shape[0], blocks.shape[1]
    x_own = xp.reshape(P, R)
    ghosts = _gather_ghosts(ghost_idx, ghost_plan, xp)
    xs = jnp.concatenate([x_own, ghosts], axis=1)
    y = _batched_gemv(blocks, xs).reshape(-1)
    return y[pad_of_old]


def dense_block_padded_op(ops, xp):
    """Pure operator on padded-clustered vectors: xp [P*R] → y [P*R]."""
    blocks, ghost_idx, ghost_plan = ops
    P, R = blocks.shape[0], blocks.shape[1]
    x_own = xp.reshape(P, R)
    ghosts = _gather_ghosts(ghost_idx, ghost_plan, xp)
    xs = jnp.concatenate([x_own, ghosts], axis=1)
    return _batched_gemv(blocks, xs).reshape(-1)


class DenseBlockSchwarz:
    """Overlap-1 restricted additive Schwarz in the padded cluster space.

    The dense row-cluster layout already materializes each cluster's
    overlap-1 dof set as its column map [own | ghost] (= the column support
    of the owned rows, exactly FROSch's algebraic overlap growth of one
    layer).  The subdomain matrix is therefore A[ov][:, ov] in that SAME
    ordering, the residual restriction reuses the fast halo exchange of the
    SpMV, and the Restricted combine (each dof updated only by its owner —
    parametersPrec.xml 'Combine Values in Overlap') is a FREE slice
    z = z_ov[:, :R]: no scatter at all.  Equivalent to
    SchwarzPreconditioner(overlap=1, combine='Restricted') conjugated by
    the padding permutation (asserted in tests).

    Factorization: batched explicit inverse — on-device f32 LU on
    accelerators (jnp.linalg.inv has no f64 TPU lowering), host f64
    otherwise — mirroring SchwarzPreconditioner's device_factor policy.

    `store_dtype=jnp.bfloat16` halves the inverse's HBM stream (the
    dominant bytes of a Schwarz apply) with f32 accumulation on the MXU —
    measured on v5e: identical GMRES iteration counts at fixed tolerance,
    31% faster iterations.  Inside iterative refinement the bf16-
    perturbed M caps the per-pass contraction at ~1e-2 (measured: ONE-
    LEVEL bf16 took 2 passes → 4-5); with a TWO-LEVEL coarse correction
    on top the contraction stays strong enough that the per-iteration win
    dominates (r4 bench default: bf16 level 1 + bf16 coarse, additive —
    IR reaches 1e-8 in ~4 passes)."""

    def __init__(self, A: CsrMatrix, db: DenseBlockSpMV, dtype=None,
                 device_factor: Optional[bool] = None, shift: float = 0.0,
                 store_dtype=None):
        dtype = dtype or db.dtype
        P, R = db.P, db.R
        W = db.blocks.shape[2]
        M = P * R
        n = db.n
        self.P, self.R, self.W = P, R, W
        self.db = db
        if device_factor is None:
            device_factor = (jnp.dtype(dtype) == jnp.float32
                             and jax.default_backend() != "cpu")
        if device_factor and shift == 0.0:
            # f32 LU without pivoting perturbation: guard exactly-singular
            # saddle-point subdomain blocks (same policy as
            # SchwarzPreconditioner's device path)
            shift = 1e-6

        old_of_pad = np.asarray(db.old_of_pad)  # [M], pad → n
        ghost_idx = np.asarray(db.ghost_idx)    # [P, G] padded ids, pad → M
        colmap = np.empty((P, W), np.int64)     # per-cluster ORIGINAL ids
        colmap[:, :R] = old_of_pad.reshape(P, R)
        gi_old = np.full(ghost_idx.shape, n, np.int64)
        valid = ghost_idx < M
        gi_old[valid] = old_of_pad[ghost_idx[valid]]
        colmap[:, R:] = gi_old

        # slot-carrying extraction of A[ov][:, ov] per cluster (values stay
        # on device; only index plans are built on the host)
        sp = A.to_scipy()
        spi = sp.copy()
        spi.data = np.arange(sp.nnz, dtype=np.float64) + 1.0
        flat_l, slot_l = [], []
        for p in range(P):
            ov = colmap[p]
            real = np.nonzero(ov < n)[0]
            sub = spi[ov[real]][:, ov[real]].tocoo()
            flat_l.append(p * W * W + real[sub.row].astype(np.int64) * W
                          + real[sub.col])
            slot_l.append(sub.data.astype(np.int64) - 1)
        flat = np.concatenate(flat_l)
        slots = np.concatenate(slot_l)
        eye_idx = (np.arange(P, dtype=np.int64)[:, None] * (W * W)
                   + np.arange(W, dtype=np.int64)[None, :] * (W + 1)).ravel()
        vals = A.data.astype(dtype)[jnp.asarray(slots)]
        blocks_sq = (jnp.zeros(P * W * W, dtype)
                     .at[jnp.asarray(eye_idx)].set(1.0)
                     .at[jnp.asarray(flat)].set(vals)
                     .reshape(P, W, W))
        if shift:
            diag = jnp.arange(W)
            blocks_sq = blocks_sq.at[:, diag, diag].add(
                shift * jnp.abs(blocks_sq).max())
        # Restricted combine only ever reads the OWNED rows of each
        # subdomain solve (z = z_ov[:, :R]) — compute/store just
        # inv[:, :R, :] and skip the ghost-row FLOPs/bytes entirely.  The
        # [P,W,W] inverse's HBM stream is the dominant bytes of the whole
        # two-level apply; R/W ≈ 0.4-0.5 on the bench layout, so ~2x.
        # Row j of A⁻¹ = (A⁻ᵀ e_j)ᵀ, so one batched solve with R
        # right-hand sides replaces the full inverse (skips W-R of the W
        # triangular-solve columns).
        if device_factor:
            eye_r = jnp.eye(W, R, dtype=blocks_sq.dtype)
            # SPD subdomains (Poisson/elasticity with the Dirichlet
            # shift): batched Cholesky — W³/3 flops and XLA's blocked
            # MXU-friendly factorization instead of the pivoted-LU while
            # loop.  A NaN anywhere (indefinite saddle-point block) falls
            # back to the LU solve; symmetry is checked on the host plan.
            self.inv = None
            if _blocks_symmetric(A):
                L = jnp.linalg.cholesky(blocks_sq)
                eye_b = jnp.broadcast_to(eye_r, (P, W, R))
                z = jax.scipy.linalg.solve_triangular(L, eye_b, lower=True)
                x = jax.scipy.linalg.solve_triangular(
                    jnp.swapaxes(L, 1, 2), z, lower=False)  # A⁻¹[:, :R]
                xv = jnp.swapaxes(x, 1, 2)
                if bool(jnp.isfinite(xv).all()):
                    self.inv = xv  # symmetric A ⇒ rows == columns
            if self.inv is None:
                x = jnp.linalg.solve(jnp.swapaxes(blocks_sq, 1, 2), eye_r)
                self.inv = jnp.swapaxes(x, 1, 2)  # [P, R, W]
        else:
            from feddlib_tpu.la.sparse_lu import _parallel_map

            import scipy.linalg as sla

            # same-dtype asarray is a buffer view; the f64 widening runs
            # in numpy (jax's dtype-converting device_get is ~20x slower)
            blocks_np = np.asarray(blocks_sq)
            if blocks_np.dtype != np.float64:
                blocks_np = blocks_np.astype(np.float64)
            inv_r = np.empty((P, R, W), np.float64)
            eye_r = np.eye(W, R)

            def _owned_rows(p):
                a = blocks_np[p]
                try:
                    lu, piv = sla.lu_factor(a.T, check_finite=False)
                    x = sla.lu_solve((lu, piv), eye_r, check_finite=False)
                    if not np.isfinite(x).all():
                        raise np.linalg.LinAlgError
                except (np.linalg.LinAlgError, ValueError):
                    x = _np_robust_inverse(a)[:R, :].T
                inv_r[p] = x.T

            # LAPACK releases the GIL — factor the P blocks on a pool
            _parallel_map(_owned_rows, range(P))
            self.inv = jnp.asarray(inv_r, dtype)
        if store_dtype is not None:
            self.inv = self.inv.astype(store_dtype)

    def apply_padded(self, rp: jnp.ndarray) -> jnp.ndarray:
        fn, ops = self.padded_operator()
        return fn(ops, rp)

    def padded_operator(self):
        db = self.db
        return dense_block_schwarz_op, (self.inv, db.ghost_idx,
                                        db.ghost_plan)


def dense_block_schwarz_op(ops, rp):
    """Pure padded-space Schwarz apply: rp [P*R] → z [P*R].

    inv is the OWNED-ROW slice [P, R, W] of the subdomain inverses — the
    Restricted combine is realized by never storing the ghost rows."""
    inv, ghost_idx, ghost_plan = ops
    P = inv.shape[0]
    R = rp.shape[0] // P
    r_own = rp.reshape(P, R)
    ghosts = _gather_ghosts(ghost_idx, ghost_plan, rp)
    rs = jnp.concatenate([r_own, ghosts], axis=1)  # [P, W]
    if inv.dtype != rs.dtype:  # low-precision storage, f32 accumulation
        from feddlib_tpu.la.pallas_kernels import (
            dense_block_mv_lowp_pallas, use_pallas_lowp)

        if use_pallas_lowp(inv.dtype, R):
            z = dense_block_mv_lowp_pallas(inv, rs)
        else:
            z = jnp.einsum("prw,pw->pr", inv, rs.astype(inv.dtype),
                           preferred_element_type=rs.dtype)
    else:
        z = _batched_gemv(inv, rs)  # [P, R]
    return z.reshape(-1)  # Restricted combine = owned rows only


def _blocks_symmetric(A: CsrMatrix, tol: float = 1e-12) -> bool:
    """Host check that A is (numerically) symmetric — gate for the
    batched-Cholesky subdomain factorization."""
    try:
        sp = A.to_scipy().tocsr()
        d = abs(sp - sp.T)
        scale = max(abs(sp).max(), 1e-300)
        return bool(d.max() <= tol * scale)
    except Exception:
        return False


def _np_robust_inverse(block):
    # shared structured fallbacks (pressure-dof pinning → shift → pinv)
    from feddlib_tpu.precond.schwarz import _robust_inverse

    return _robust_inverse(block)


@partial(jax.jit, static_argnames=("P", "R", "G"))
def _scatter_blocks(data, flat_idx, P, R, G):
    return jnp.zeros(P * R * (R + G), data.dtype).at[flat_idx].set(
        data).reshape(P, R, R + G)


def _batched_gemv(blocks, xs):
    from feddlib_tpu.la.pallas_kernels import (
        dense_block_mv_pallas, use_pallas_dense)

    P, R, W = blocks.shape
    if use_pallas_dense(blocks.dtype) and R % 8 == 0 and W % 128 == 0:
        return dense_block_mv_pallas(blocks, xs)
    return jnp.einsum("prs,ps->pr", blocks, xs,
                      preferred_element_type=blocks.dtype)


@partial(jax.jit, static_argnames=("P", "R"))
def _dense_block_mv(blocks, ghost_idx, ghost_plan, xp, P, R):
    x_own = xp.reshape(P, R)
    ghosts = _gather_ghosts(ghost_idx, ghost_plan, xp)
    xs = jnp.concatenate([x_own, ghosts], axis=1)  # [P, R+G]
    return _batched_gemv(blocks, xs).reshape(-1)
