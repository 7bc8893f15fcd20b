"""DIA (diagonal) SpMV — the gather-free TPU format for banded operators.

Fills the Tpetra CrsMatrix::apply role (reference:
feddlib/core/LinearAlgebra/Matrix_decl.hpp:116-120) for matrices whose
nonzeros concentrate on a small set of diagonals — structured-grid FEM
stencils above all (a 3D P1 tet stencil is exactly 15 diagonals).  The
general-purpose windowed sliced-ELL kernel (la/sell.py) is fundamentally
bound by the VPU's lane-gather unit (~K gather passes per value register,
measured ~16 Gnnz/s on v5e); the diagonal form needs NO gather at all:

    y = Σ_d  vals[d] ⊙ shift(x, off_d)

which XLA lowers to fused streaming multiply-adds over lane-shifted reads
— measured 165 Gnnz/s f32 on v5e at 13.5M nnz (~82% of the format's
4.1 B/nnz HBM roofline), ~10x the SELL kernel on the same operator.

`DiaMatrix.from_csr` detects the diagonal structure and REFUSES (returns
None) when the matrix is not truly banded-sparse — unstructured meshes
(even RCM-ordered) spread nnz over too many partial diagonals; those stay
on the SELL path via `auto_spmv`.  A small remainder (< 1 - coverage) is
carried exactly in a COO spill applied by segment-sum.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


# operator() fns memoized by their static layout facts: solvers/krylov.py
# solve_jit caches compiled programs keyed on the fn IDENTITY, so the fn
# for a given layout must be a singleton or every reassembly recompiles.
_op_fn_cache: dict = {}


class DiaMatrix:
    """Diagonal-storage operator for y = A @ x (+ exact COO spill)."""

    def __init__(self, n_rows, n_cols, offsets, vals, spill_rows, spill_cols,
                 spill_vals, nnz, data_slots, spill_sel, dtype):
        self.shape = (n_rows, n_cols)
        self.offsets = offsets          # host tuple of python ints (static)
        self.vals = vals                # [n_offsets, n_rows] dtype
        self.spill_rows = spill_rows    # [S] int32 (or None)
        self.spill_cols = spill_cols
        self.spill_vals = spill_vals
        self.nnz = nnz
        self.data_slots = data_slots    # device: csr nnz -> k*n_rows+row (-1)
        self.spill_sel = spill_sel      # device: csr positions of spill nnz
        self.dtype = dtype
        self._vals_list = None          # per-diagonal [n] views (lazy)

    # -- construction --------------------------------------------------------
    @classmethod
    def from_csr(cls, A, dtype=jnp.float32, max_offsets=40, coverage=0.97,
                 max_bytes_per_nnz=8.0):
        """Build from CsrMatrix/scipy CSR, or return None if the matrix is
        not diagonal-concentrated enough for the format to win:
        - the top `max_offsets` diagonals must cover >= `coverage` of nnz
        - padded storage must stay under `max_bytes_per_nnz` streamed bytes
        """
        is_fedd = hasattr(A, "to_scipy")
        sp = (A.to_scipy() if is_fedd else A).tocsr()
        sp.sort_indices()
        n_rows, n_cols = sp.shape
        if n_rows != n_cols or n_rows == 0:
            return None
        row = np.repeat(np.arange(n_rows, dtype=np.int64),
                        np.diff(sp.indptr))
        off = sp.indices.astype(np.int64) - row
        uoff, inv, counts = np.unique(off, return_inverse=True,
                                      return_counts=True)
        order = np.argsort(-counts, kind="stable")[:max_offsets]
        covered = int(counts[order].sum())
        if covered < coverage * sp.nnz:
            return None
        keep = np.zeros(len(uoff), np.bool_)
        keep[order] = True
        n_off = int(keep.sum())
        if n_off * n_rows * jnp.dtype(dtype).itemsize > \
                max_bytes_per_nnz * sp.nnz:
            return None
        # diagonal rank of each kept offset (sorted for determinism)
        kept_off = np.sort(uoff[keep])
        rank_of_uoff = np.full(len(uoff), -1, np.int64)
        rank_of_uoff[keep] = np.searchsorted(kept_off, uoff[keep])
        nz_rank = rank_of_uoff[inv]                      # [-1 = spill]
        in_dia = nz_rank >= 0

        data_slots = np.where(in_dia, nz_rank * n_rows + row,
                              -1).astype(np.int32)
        spill_idx = np.flatnonzero(~in_dia)

        data_dev = (A.data.astype(dtype)
                    if is_fedd and isinstance(A.data, jnp.ndarray)
                    else jnp.asarray(sp.data, dtype))
        slots_dev = jnp.asarray(data_slots)
        vals = _fill_dia(data_dev, slots_dev, n_off * n_rows).reshape(
            n_off, n_rows)
        if len(spill_idx):
            spill_sel = jnp.asarray(spill_idx)
            s_rows = jnp.asarray(row[spill_idx].astype(np.int32))
            s_cols = jnp.asarray(sp.indices[spill_idx].astype(np.int32))
            s_vals = data_dev[spill_sel]
        else:
            spill_sel = s_rows = s_cols = s_vals = None
        return cls(n_rows, n_cols, tuple(int(o) for o in kept_off), vals,
                   s_rows, s_cols, s_vals, sp.nnz, slots_dev, spill_sel,
                   dtype)

    def with_data(self, data: jnp.ndarray) -> "DiaMatrix":
        """Same pattern, new CSR value array (reassembly hot path)."""
        d = jnp.asarray(data).astype(self.dtype)
        n_off = self.vals.shape[0]
        vals = _fill_dia(d, self.data_slots,
                         n_off * self.shape[0]).reshape(self.vals.shape)
        s_vals = d[self.spill_sel] if self.spill_sel is not None else None
        return DiaMatrix(self.shape[0], self.shape[1], self.offsets, vals,
                         self.spill_rows, self.spill_cols, s_vals, self.nnz,
                         self.data_slots, self.spill_sel, self.dtype)

    # -- apply ---------------------------------------------------------------
    def operands(self):
        # each diagonal rides as its OWN contiguous [n] array: row-slicing
        # a [K, n] 2D *argument* inside the compiled loop forces a strided
        # relayout per diagonal (measured 21 vs 156 Gnnz/s on v5e)
        if self._vals_list is None:
            # ONE compiled program for all rows: per-k getitem dispatches
            # would each be a separate remote compile on tunneled TPUs
            self._vals_list = _split_rows(self.vals)
        return (self._vals_list, self.spill_rows, self.spill_cols,
                self.spill_vals)

    def operator(self):
        """(pure_fn, operands) protocol for jit-argument solver programs."""
        n_rows, n_cols, offsets = self.shape[0], self.shape[1], self.offsets
        key = ("dia", n_rows, n_cols, offsets)
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, x):
                return _apply(*ops, x, n_rows, n_cols, offsets)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return _jit_apply(self.operands(), jnp.asarray(x), self.shape[0],
                          self.shape[1], self.offsets)

    def hbm_bytes_per_apply(self) -> int:
        isz = jnp.dtype(self.dtype).itemsize
        b = self.vals.size * isz + (self.shape[1] + self.shape[0]) * isz
        if self.spill_rows is not None:
            b += int(self.spill_rows.size) * (8 + 2 * isz)
        return b


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "offsets"))
def _jit_apply(packed, x, n_rows, n_cols, offsets):
    return _apply(*packed, x, n_rows, n_cols, offsets)


def _apply(vals_list, s_rows, s_cols, s_vals, x, n_rows, n_cols, offsets):
    out_dtype = x.dtype
    dt = vals_list[0].dtype
    xc = x.astype(dt)
    lo = min(min(offsets), 0)
    hi = max(max(offsets) + n_rows - n_cols, 0)
    xp = jnp.pad(xc, (-lo, hi))
    y = jnp.zeros(n_rows, dt)
    for k, o in enumerate(offsets):
        y = y + vals_list[k] * lax.dynamic_slice(xp, (o - lo,), (n_rows,))
    if s_rows is not None:
        y = y + jax.ops.segment_sum(s_vals * xc[s_cols], s_rows,
                                    num_segments=n_rows)
    return y.astype(out_dtype)


@jax.jit
def _split_rows(v):
    return tuple(v[k] for k in range(v.shape[0]))


@partial(jax.jit, static_argnames=("size",))
def _fill_dia(data, slots, size):
    valid = slots >= 0
    return jnp.zeros(size, data.dtype).at[
        jnp.where(valid, slots, size)].set(
        jnp.where(valid, data, 0), mode="drop")


class BlockDiaMatrix:
    """Block-DIA SpMV for vector-field operators (dofs-per-node d > 1).

    The reference's vector operators (elasticity 2με:ε+λdiv·div, vector
    Laplace/stress — FE_def.hpp:670,2407,2739) produce d×d dense node
    blocks on the scalar node pattern under NodeWise dof ordering
    (dof = node·d + c, Map::buildVecFieldMap, Map_decl.hpp:72).  On a
    banded NODE pattern every (node-offset, ci, cj) triple is its own
    perfect dof-diagonal, so the apply is d² gather-free scalar-DIA passes
    over component PLANES:

        y[ci] += vals[o, ci, cj] ⊙ shift(x[cj], node_off)

    streaming exactly 4 B/nnz (f32) with unit-stride reads (measured
    104 Gnnz/s f32 on v5e at 8.9M nnz).  Non-banded node patterns return
    None (auto_spmv falls back to SELL).

    LAYOUT: the hot path works on PLANAR component-major vectors
    xc [d, nn] (lane axis = nodes).  The NodeWise interleaved vector
    x [nn*d] has node index on the 3-wide minor axis — any reshape/
    transpose of it is a lane-starved relayout that costs more than the
    whole apply (measured: 1.7 ms relayout vs 0.086 ms planar apply).
    Keep whole Krylov loops planar via `planar_operator()` +
    `to_planar`/`from_planar`; `operator()`/`matvec` accept interleaved
    vectors and pay the two relayouts."""

    def __init__(self, n, d, offsets, vals, spill_rows, spill_cols,
                 spill_vals, nnz, data_slots, spill_sel, dtype):
        self.shape = (n, n)
        self.d = d
        self.offsets = offsets          # node offsets, python ints (static)
        self.vals = vals                # [d, n_off*d, nn] ci-major planes
        self.spill_rows = spill_rows    # PLANAR flat dof ids (c*nn + node)
        self.spill_cols = spill_cols
        self.spill_vals = spill_vals
        self.nnz = nnz
        self.data_slots = data_slots    # device: csr nnz -> flat slot (-1)
        self.spill_sel = spill_sel
        self.dtype = dtype

    @classmethod
    def from_csr(cls, A, d, dtype=jnp.float32, max_offsets=40,
                 coverage=0.97, max_bytes_per_nnz=8.0):
        is_fedd = hasattr(A, "to_scipy")
        sp = (A.to_scipy() if is_fedd else A).tocsr()
        sp.sort_indices()
        n = sp.shape[0]
        if sp.shape[0] != sp.shape[1] or n == 0 or d <= 1 or n % d:
            return None
        nn = n // d
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(sp.indptr))
        col = sp.indices.astype(np.int64)
        nrow, ci = row // d, row % d
        ncol, cj = col // d, col % d
        noff = ncol - nrow
        uoff, inv, counts = np.unique(noff, return_inverse=True,
                                      return_counts=True)
        order = np.argsort(-counts, kind="stable")[:max_offsets]
        if int(counts[order].sum()) < coverage * sp.nnz:
            return None
        keep = np.zeros(len(uoff), np.bool_)
        keep[order] = True
        n_off = int(keep.sum())
        if n_off * d * d * nn * jnp.dtype(dtype).itemsize > \
                max_bytes_per_nnz * sp.nnz:
            return None
        kept_off = np.sort(uoff[keep])
        rank_of_uoff = np.full(len(uoff), -1, np.int64)
        rank_of_uoff[keep] = np.searchsorted(kept_off, uoff[keep])
        nz_rank = rank_of_uoff[inv]
        in_dia = nz_rank >= 0

        # ci-major plane index: plane = ci*(n_off*d) + k*d + cj — one
        # contiguous [n_off*d, nn] slab per output component
        plane = (ci * n_off + nz_rank) * d + cj
        data_slots = np.where(in_dia, plane * nn + nrow,
                              -1).astype(np.int64)
        spill_idx = np.flatnonzero(~in_dia)

        data_dev = (A.data.astype(dtype)
                    if is_fedd and isinstance(A.data, jnp.ndarray)
                    else jnp.asarray(sp.data, dtype))
        slots_dev = jnp.asarray(data_slots)
        vals = _fill_dia(data_dev, slots_dev, n_off * d * d * nn).reshape(
            d, n_off * d, nn)
        if len(spill_idx):
            spill_sel = jnp.asarray(spill_idx)
            # planar flat ids: dof (node, c) lives at c*nn + node
            sr, sc = row[spill_idx], col[spill_idx]
            s_rows = jnp.asarray(((sr % d) * nn + sr // d).astype(np.int32))
            s_cols = jnp.asarray(((sc % d) * nn + sc // d).astype(np.int32))
            s_vals = data_dev[spill_sel]
        else:
            spill_sel = s_rows = s_cols = s_vals = None
        return cls(n, d, tuple(int(o) for o in kept_off), vals,
                   s_rows, s_cols, s_vals, sp.nnz, slots_dev, spill_sel,
                   dtype)

    def with_data(self, data: jnp.ndarray) -> "BlockDiaMatrix":
        d = jnp.asarray(data).astype(self.dtype)
        vals = _fill_dia(d, self.data_slots,
                         self.vals.size).reshape(self.vals.shape)
        s_vals = d[self.spill_sel] if self.spill_sel is not None else None
        return BlockDiaMatrix(self.shape[0], self.d, self.offsets, vals,
                              self.spill_rows, self.spill_cols, s_vals,
                              self.nnz, self.data_slots, self.spill_sel,
                              self.dtype)

    # -- vector layout -------------------------------------------------------
    def to_planar(self, x: jnp.ndarray) -> jnp.ndarray:
        """NodeWise interleaved [nn*d] → planar [d, nn] (a relayout —
        do this once per solve, not per apply)."""
        nn = self.shape[0] // self.d
        return jnp.asarray(x).reshape(nn, self.d).T

    def from_planar(self, xc: jnp.ndarray) -> jnp.ndarray:
        return xc.T.reshape(-1)

    # -- applies -------------------------------------------------------------
    def operands(self):
        return (self.vals, self.spill_rows, self.spill_cols,
                self.spill_vals)

    def planar_operator(self):
        """(pure_fn, operands) on planar [d, nn] vectors — the hot path."""
        d, offsets = self.d, self.offsets
        key = ("bdia-planar", self.shape[0], d, offsets)
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, xc):
                return _block_apply_planar(*ops, xc, d, offsets)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def operator(self):
        """(pure_fn, operands) on NodeWise interleaved vectors (pays two
        relayouts per apply — use planar_operator for Krylov loops)."""
        n, d, offsets = self.shape[0], self.d, self.offsets
        key = ("bdia", n, d, offsets)
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, x):
                xc = jnp.asarray(x).reshape(n // d, d).T
                y = _block_apply_planar(*ops, xc, d, offsets)
                return y.T.reshape(-1).astype(x.dtype)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return _jit_block_apply(self.operands(), jnp.asarray(x),
                                self.shape[0], self.d, self.offsets)

    def hbm_bytes_per_apply(self) -> int:
        isz = jnp.dtype(self.dtype).itemsize
        b = self.vals.size * isz + 2 * self.shape[0] * isz
        if self.spill_rows is not None:
            b += int(self.spill_rows.size) * (8 + 2 * isz)
        return b


@partial(jax.jit, static_argnames=("n", "d", "offsets"))
def _jit_block_apply(packed, x, n, d, offsets):
    vals = packed[0]
    xc = x.astype(vals.dtype).reshape(n // d, d).T
    y = _block_apply_planar(*packed, xc, d, offsets)
    return y.T.reshape(-1).astype(x.dtype)


def _block_apply_planar(vals, s_rows, s_cols, s_vals, xc, d, offsets):
    """xc [d, nn] planar → y [d, nn].  One stacked shift-gather of x (the
    15-ish dynamic slices fuse) + ONE multiply-reduce against the ci-major
    value slabs — measured 104 Gnnz/s f32 on v5e; per-plane or per-offset
    formulations are launch-overhead-bound (25 / 5 Gnnz/s)."""
    out_dtype = xc.dtype
    dt = vals.dtype
    nn = xc.shape[1]
    n_off = len(offsets)
    lo = min(min(offsets), 0)
    hi = max(max(offsets), 0)
    xp = jnp.pad(xc.astype(dt), ((0, 0), (-lo, hi)))
    xs = jnp.stack([lax.dynamic_slice(xp, (0, o - lo), (xc.shape[0], nn))
                    for o in offsets]).reshape(n_off * xc.shape[0], nn)
    y = (vals * xs[None]).sum(axis=1)         # [d, nn]
    if s_rows is not None:
        contrib = s_vals * xc.astype(dt).reshape(-1)[s_cols]
        y = (y.reshape(-1) + jax.ops.segment_sum(
            contrib, s_rows, num_segments=d * nn)).reshape(d, nn)
    return y.astype(out_dtype)


class SplitDiaMatrix:
    """RCM-banded (block-)DIA + windowed-SELL residue for UNSTRUCTURED
    operators — the format answer to the general SELL kernel being
    VPU-issue-bound (~15 Gnnz/s, round-4 ablation), not HBM-bound.

    RCM reordering concentrates most nnz of an unstructured FE operator
    onto O(1) near diagonals; those stream through the gather-free
    (Block)DiaMatrix path at HBM bandwidth (~100+ Gnnz/s) and only the
    residue pays the SELL gather loop — and with the dense diagonals
    removed, the residue's slots-per-row (K passes) shrink too.
    A node diagonal is kept when its occupancy clears `min_occupancy`:
    the marginal DIA rate is BW·occ/4 B, which beats the ~15 Gnnz/s SELL
    rate down to occ ≈ 0.07; 0.15 leaves margin for the pass overhead.

    The operator lives in RCM-PERMUTED (and, for d > 1, PLANAR [d, nn])
    space; `operator()` wraps it with one fused PermutationGather each
    way (interleaved NodeWise in/out — drop-in for the Krylov paths),
    `permuted_operator()` exposes the raw form for whole-loop use.

    Reference role: Tpetra CrsMatrix::apply on unstructured meshes
    (Matrix_decl.hpp:116-120)."""

    def __init__(self, dia_part, sell_part, d, nn, node_perm, sel_dia,
                 sel_res, nnz, dtype, gin, gout):
        self.dia = dia_part          # DiaMatrix (d=1) | BlockDiaMatrix
        self.sell = sell_part        # SellMatrix | BlockSellMatrix | None
        self.d = d
        self.nn = nn
        self.shape = (nn * d, nn * d)
        self.node_perm = node_perm
        self.sel_dia = sel_dia       # original CSR positions per part
        self.sel_res = sel_res
        self._sel_dia_dev = None
        self._sel_res_dev = None
        self.nnz = nnz
        self.dtype = dtype
        self.gin = gin               # PermutationGather in/out plans
        self.gout = gout

    @classmethod
    def from_csr(cls, A, dtype=jnp.float32, dofs_per_node: int = 1,
                 min_occupancy: float = 0.15, max_offsets: int = 96,
                 min_dia_share: float = 0.25):
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        import scipy.sparse as sps

        from feddlib_tpu.la.permute import PermutationGather
        from feddlib_tpu.la.sell import BlockSellMatrix, SellMatrix

        is_fedd = hasattr(A, "to_scipy")
        sp = (A.to_scipy() if is_fedd else A).tocsr()
        sp.sort_indices()
        n = sp.shape[0]
        d = int(dofs_per_node)
        if sp.shape[0] != sp.shape[1] or n == 0 or n % max(d, 1):
            return None
        nn = n // d
        data_np = np.asarray(sp.data)

        # node-graph RCM (symmetric pattern)
        if d > 1:
            row = np.repeat(np.arange(n, dtype=np.int64), np.diff(sp.indptr))
            ng = sps.csr_matrix(
                (np.ones(sp.nnz, np.int8), (row // d, sp.indices // d)),
                shape=(nn, nn))
        else:
            ng = sp
        node_perm = np.asarray(
            reverse_cuthill_mckee(ng.tocsr(), symmetric_mode=True),
            dtype=np.int64)
        dof_perm = ((node_perm[:, None] * d
                     + np.arange(d)[None, :]).reshape(-1) if d > 1
                    else node_perm)

        # permute WITH original-position tracking (with_data plans)
        pos = sp.copy()
        pos.data = np.arange(sp.nnz, dtype=np.int64) + 1
        pos_p = pos[dof_perm][:, dof_perm].tocsr()
        pos_p.sort_indices()
        opos = pos_p.data - 1
        rowp = np.repeat(np.arange(n, dtype=np.int64), np.diff(pos_p.indptr))
        colp = pos_p.indices.astype(np.int64)

        # node-offset occupancy → kept diagonals
        noff = colp // d - rowp // d
        uoff, inv, counts = np.unique(noff, return_inverse=True,
                                      return_counts=True)
        slots = np.maximum(nn - np.abs(uoff), 1) * d * d
        occ = counts / slots
        cand = np.flatnonzero(occ >= min_occupancy)
        if len(cand) > max_offsets:
            cand = cand[np.argsort(-occ[cand], kind="stable")[:max_offsets]]
        keep = np.zeros(len(uoff), np.bool_)
        keep[cand] = True
        in_dia = keep[inv]
        covered = int(in_dia.sum())
        if covered < min_dia_share * sp.nnz:
            return None  # not diagonal-concentrated even under RCM

        def _sub(mask):
            """Sub-CSR of the permuted matrix + the ORIGINAL CSR position
            per entry, in the sub's canonical (row-major) data order —
            the with_data plan."""
            r, c, o = rowp[mask], colp[mask], opos[mask]
            srt = np.lexsort((c, r))
            return (sps.csr_matrix((data_np[o[srt]], (r[srt], c[srt])),
                                   shape=(n, n)), o[srt])

        sub_dia, sel_dia = _sub(in_dia)
        if d > 1:
            dia_part = BlockDiaMatrix.from_csr(
                sub_dia, d, dtype=dtype, max_offsets=len(cand) + 1,
                coverage=0.0, max_bytes_per_nnz=1e12)
        else:
            dia_part = DiaMatrix.from_csr(
                sub_dia, dtype=dtype, max_offsets=len(cand) + 1,
                coverage=0.0, max_bytes_per_nnz=1e12)
        if dia_part is None:
            return None
        if dia_part.spill_rows is not None:
            return None  # by construction the sub is pure-diagonal

        if int((~in_dia).sum()):
            sub_res, sel_res = _sub(~in_dia)
            sell_part = (BlockSellMatrix.from_csr(sub_res, d, dtype=dtype)
                         if d > 1 else
                         SellMatrix.from_csr(sub_res, dtype=dtype))
            if sell_part is None and d > 1:
                # partial blocks in the residue: planar-indexed scalar SELL
                m = ~in_dia
                r_pl = (rowp[m] % d) * nn + rowp[m] // d
                c_pl = (colp[m] % d) * nn + colp[m] // d
                order = np.lexsort((c_pl, r_pl))
                sub_pl = sps.csr_matrix(
                    (data_np[opos[m]][order], (r_pl[order], c_pl[order])),
                    shape=(n, n))
                sell_part = SellMatrix.from_csr(sub_pl, dtype=dtype)
                sel_res = opos[m][order]
        else:
            sell_part = None
            sel_res = np.zeros(0, np.int64)

        # fused entry/exit gathers: interleaved NodeWise original order ↔
        # permuted (planar for d > 1) operator space
        inode = np.empty(nn, np.int64)
        inode[node_perm] = np.arange(nn)
        if d > 1:
            cc, ii = np.meshgrid(np.arange(d), np.arange(nn), indexing="ij")
            idx_in = (node_perm[ii] * d + cc).reshape(-1)  # [d*nn] planar
            no, co = np.meshgrid(np.arange(nn), np.arange(d), indexing="ij")
            idx_out = (co * nn + inode[no]).reshape(-1)    # [nn*d]
        else:
            idx_in, idx_out = node_perm, inode
        gin = PermutationGather(idx_in, n)
        gout = PermutationGather(idx_out, n)
        return cls(dia_part, sell_part, d, nn, node_perm, sel_dia,
                   sel_res, sp.nnz, dtype, gin, gout)

    @property
    def dia_share(self) -> float:
        return len(self.sel_dia) / max(self.nnz, 1)

    def with_data(self, data: jnp.ndarray) -> "SplitDiaMatrix":
        d_arr = jnp.asarray(data)
        if self._sel_dia_dev is None:
            self._sel_dia_dev = jnp.asarray(self.sel_dia)
            self._sel_res_dev = (jnp.asarray(self.sel_res)
                                 if len(self.sel_res) else None)
        new_dia = self.dia.with_data(d_arr[self._sel_dia_dev])
        new_sell = (self.sell.with_data(d_arr[self._sel_res_dev])
                    if self.sell is not None else None)
        out = SplitDiaMatrix(new_dia, new_sell, self.d, self.nn,
                             self.node_perm, self.sel_dia, self.sel_res,
                             self.nnz, self.dtype, self.gin, self.gout)
        out._sel_dia_dev = self._sel_dia_dev
        out._sel_res_dev = self._sel_res_dev
        return out

    def _part_ops(self):
        if self.d > 1:
            dia_fn, dia_ops = self.dia.planar_operator()
            if self.sell is None:
                sell_fn = None
                sell_ops = ()
            elif hasattr(self.sell, "planar_operator"):
                sell_fn, sell_ops = self.sell.planar_operator()
            else:  # planar-indexed scalar SELL: flat [d*nn] in/out
                sf, sell_ops = self.sell.operator()
                nn = self.nn

                def sell_fn(ops, xc):
                    return sf(ops, xc.reshape(-1)).reshape(-1, nn)
            return dia_fn, dia_ops, sell_fn, sell_ops
        dia_fn, dia_ops = self.dia.operator()
        sell_fn, sell_ops = (self.sell.operator() if self.sell is not None
                             else (None, ()))
        return dia_fn, dia_ops, sell_fn, sell_ops

    def permuted_operator(self):
        """(fn, ops) in the RCM-permuted (planar for d>1) space: x is
        [d, nn] planar (d>1) or [n] (d=1)."""
        dia_fn, dia_ops, sell_fn, sell_ops = self._part_ops()
        key = ("split-perm", id(dia_fn), id(sell_fn))
        fn = _op_fn_cache.get(key)
        if fn is None:
            if sell_fn is None:
                def fn(ops, x):
                    return dia_fn(ops[0], x)
            else:
                def fn(ops, x):
                    return dia_fn(ops[0], x) + sell_fn(ops[1], x)

            _op_fn_cache[key] = fn
        return fn, (dia_ops, sell_ops)

    def operator(self):
        """(fn, ops) on interleaved NodeWise vectors in the ORIGINAL
        numbering — one fused permutation gather each way."""
        p_fn, _ = self.permuted_operator()
        gin_fn, gin_ops = self.gin.operator()
        gout_fn, gout_ops = self.gout.operator()
        d, nn = self.d, self.nn
        key = ("split", id(p_fn), id(gin_fn), id(gout_fn), d, nn)
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, x):
                p_ops, gi, go = ops
                xp = gin_fn(gi, x)
                if d > 1:
                    xp = xp.reshape(d, nn)
                y = p_fn(p_ops, xp)
                return gout_fn(go, y.reshape(-1))

            _op_fn_cache[key] = fn
        p2_fn, p_ops = self.permuted_operator()
        return fn, (p_ops, gin_ops, gout_ops)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        fn, ops = self.operator()
        return fn(ops, jnp.asarray(x))

    def to_permuted(self, x: jnp.ndarray):
        y = self.gin(jnp.asarray(x))
        return y.reshape(self.d, self.nn) if self.d > 1 else y

    def from_permuted(self, y: jnp.ndarray) -> jnp.ndarray:
        return self.gout(jnp.asarray(y).reshape(-1))

    def hbm_bytes_per_apply(self) -> int:
        b = self.dia.hbm_bytes_per_apply()
        if self.sell is not None:
            b += self.sell.hbm_bytes_per_apply()
        b += 2 * self.shape[0] * 6  # entry/exit permutation gathers
        return b


def auto_spmv(A, dtype=jnp.float32, order=None, dofs_per_node=1):
    """Pick the fastest TPU SpMV operator for this matrix: (block-)DIA
    for banded node patterns (structured grids), the RCM-banded
    DIA+SELL split for unstructured patterns that concentrate under
    reordering, windowed sliced-ELL otherwise.  All expose the same
    (operator()/matvec/with_data/hbm_bytes_per_apply) surface."""
    if dofs_per_node > 1:
        bdia = BlockDiaMatrix.from_csr(A, dofs_per_node, dtype=dtype)
        if bdia is not None:
            return bdia
        split = SplitDiaMatrix.from_csr(A, dtype=dtype,
                                        dofs_per_node=dofs_per_node)
        if split is not None:
            return split
        from feddlib_tpu.la.sell import BlockSellMatrix

        bsell = BlockSellMatrix.from_csr(A, dofs_per_node, dtype=dtype)
        if bsell is not None:
            return bsell
    dia = DiaMatrix.from_csr(A, dtype=dtype)
    if dia is not None:
        return dia
    if dofs_per_node == 1:
        split = SplitDiaMatrix.from_csr(A, dtype=dtype)
        if split is not None:
            return split
    from feddlib_tpu.la.sell import SellMatrix

    return SellMatrix.from_csr(A, dtype=dtype, order=order)
