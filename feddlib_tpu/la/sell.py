"""Windowed sliced-ELL SpMV — the byte-minimal TPU sparse format.

Fills the Tpetra CrsMatrix::apply role (reference:
feddlib/core/LinearAlgebra/Matrix_decl.hpp:116-120) at HBM streaming
speed.  The round-1 dense row-cluster format (la/dense_blocks.py) streams
~80x the necessary bytes because it densifies each cluster's column
support; this format stores the actual nonzeros (ELL slots) and performs
the x-gather ON CHIP with Mosaic's in-register `take_along_axis`
(lane-wise dynamic gather within a 128-wide window), so HBM traffic is
~(4+2) B/nnz + one streaming read of x.

Layout (all shapes static):
  - rows are processed in CHUNKS of `rows_per_chunk = 8 * (128 // E)`
    (E = padded ELL slots per row, power of two <= 128).  A chunk's slots
    fill exactly one (8, 128) f32 VREG: sublane s, lane l <-> row
    `chunk*RPC + s*(128//E) + l//E`, slot `l % E`.
  - x is reshaped to x2d [ceil(n/128), 128] and kept RESIDENT IN VMEM
    (n <= ~2M dofs per device; the distributed path shards rows, keeping
    per-device n inside this budget).
  - each chunk lists <= K window block ids `bids[chunk, k]` — the distinct
    128-column-blocks its nonzeros touch.  Per slot we store the value
    (f32) and a packed int16 `k*128 + lane` window-local index.
  - kernel, per chunk: read the K window rows of x2d (dynamic sublane
    index into VMEM), lane-gather each against the slot lane indices, and
    select by the slot's window id; multiply by the values and
    segment-sum lanes back to rows with a tiny constant matmul.

Chunks whose nonzeros touch more than K distinct column blocks spill the
excess entries to a COO tail applied by a plain XLA segment-sum (slow but
O(spill)); with RCM/lexicographic row order the spill is empty or tiny.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


_op_fn_cache: dict = {}


class SellMatrix:
    """Windowed sliced-ELL operator for y = A @ x."""

    def __init__(self, n_rows, n_cols, vals, pidx, bids, spill_rows,
                 spill_cols, spill_vals, nnz, data_slots, data_spill,
                 dtype, E, K, perm=None, iperm=None, csr_order=None):
        self.shape = (n_rows, n_cols)
        self.vals = vals          # [nchunks, 8, 128] dtype
        self.pidx = pidx          # [nchunks, 8, 128] int16 (k*128+lane)
        self.bids = bids          # [nchunks, K] int32 rows of x2d
        self.spill_rows = spill_rows  # [S] int32 (or None)
        self.spill_cols = spill_cols  # [S] int32
        self.spill_vals = spill_vals  # [S] dtype
        self.nnz = nnz
        self.data_slots = data_slots  # host plan: csr nnz -> flat slot (-1)
        self.data_spill = data_spill  # host plan: csr nnz -> spill pos (-1)
        self.dtype = dtype
        self.E = E
        self.K = K
        self.perm = perm    # row/col permutation applied (None = identity)
        self.iperm = iperm
        # original-CSR nnz position of each permuted-CSR nnz (rcm only):
        # lets with_data() accept value arrays in the caller's CSR order
        self.csr_order = csr_order
        # device-resident copies of the reassembly plans, built on first
        # with_data() call so the hot path ships no host arrays per call
        self._csr_order_dev = None
        self._data_slots_dev = None
        self._spill_sel_dev = None

    # -- construction --------------------------------------------------------
    @classmethod
    def from_csr(cls, A, dtype=jnp.float32, E=None, K=None, order=None):
        """Build from a CsrMatrix (feddlib_tpu.la.csr) or scipy CSR.

        order: None (keep row order) or 'rcm' (bandwidth-reducing reverse
        Cuthill-McKee on the symmetric pattern — use for unstructured
        meshes whose natural order scatters column support).
        """
        is_fedd = hasattr(A, "to_scipy")
        sp = A.to_scipy().tocsr() if is_fedd else A.tocsr()
        n_rows, n_cols = sp.shape
        perm = iperm = csr_order = None
        if order == "rcm":
            import scipy.sparse as sps
            from scipy.sparse.csgraph import reverse_cuthill_mckee

            if n_rows != n_cols:
                raise ValueError("rcm ordering needs a square matrix")
            perm = np.asarray(reverse_cuthill_mckee(sp, symmetric_mode=True))
            iperm = np.empty_like(perm)
            iperm[perm] = np.arange(n_rows)
            # track where each original nnz lands under the permutation
            # (+1 so scipy never drops a "zero" entry structurally)
            pos = sps.csr_matrix(
                (np.arange(sp.nnz, dtype=np.int64) + 1,
                 sp.indices.copy(), sp.indptr.copy()), shape=sp.shape)
            pos = pos[perm][:, perm].tocsr()
            pos.sort_indices()
            if pos.nnz != sp.nnz:
                raise ValueError(
                    f"rcm permutation changed the nnz count "
                    f"({pos.nnz} != {sp.nnz}): duplicate entries in the "
                    f"input CSR would be silently summed")
            csr_order = np.asarray(pos.data) - 1
            sp = sp[perm][:, perm].tocsr()
        sp.sort_indices()

        row_nnz = np.diff(sp.indptr)
        max_nnz = max(int(row_nnz.max()) if n_rows else 1, 1)
        if E is None:
            E = 8
            while E < min(max_nnz, _LANES):
                E *= 2
        rpl = _LANES // E          # rows per sublane
        rpc = 8 * rpl              # rows per chunk
        nchunks = max(_round_up(n_rows, rpc) // rpc, 1)

        indices = sp.indices
        nz_row = np.repeat(np.arange(n_rows), row_nnz)
        nz_chunk = nz_row // rpc
        nz_block = (indices // _LANES).astype(np.int64)

        # distinct blocks per chunk, ranked by frequency (top-K kept)
        keys = nz_chunk.astype(np.int64) * (1 << 32) + nz_block
        uk, inv, counts = np.unique(keys, return_inverse=True,
                                    return_counts=True)
        uc = (uk >> 32).astype(np.int64)
        ub = (uk & 0xFFFFFFFF).astype(np.int64)
        if K is None:
            per = np.bincount(uc, minlength=nchunks)
            K = int(min(max(per.max() if len(per) else 1, 1), 16))
        order_idx = np.lexsort((-counts, uc))
        rank_of = np.empty(len(uk), np.int64)
        starts = np.searchsorted(uc[order_idx], np.arange(nchunks))
        rank_of[order_idx] = np.arange(len(uk)) - starts[uc[order_idx]]
        bids = np.zeros((nchunks, K), np.int32)
        keep_blk = rank_of < K
        bids[uc[keep_blk], rank_of[keep_blk]] = ub[keep_blk].astype(np.int32)
        nz_k = np.where(rank_of[inv] < K, rank_of[inv], -1).astype(np.int32)

        # slot position within each row over kept entries; >= E spills too
        kept = nz_k >= 0
        kept_idx = np.flatnonzero(kept)
        kr = nz_row[kept_idx]
        row_start = np.zeros(n_rows + 1, np.int64)
        np.add.at(row_start[1:], kr, 1)
        np.cumsum(row_start, out=row_start)
        pos = np.arange(len(kr)) - row_start[kr]
        over = pos >= E
        kept[kept_idx[over]] = False
        kept_idx = kept_idx[~over]
        pos = pos[~over]

        r = nz_row[kept_idx]
        c = r // rpc
        rloc = r - c * rpc
        sublane = rloc // rpl
        lane = (rloc % rpl) * E + pos
        flat = c * (8 * _LANES) + sublane * _LANES + lane

        pidx_flat = np.zeros(nchunks * 8 * _LANES, np.int16)
        pidx_flat[flat] = (nz_k[kept_idx] * _LANES
                           + (indices[kept_idx] % _LANES)).astype(np.int16)
        data_slots = np.full(sp.nnz, -1, np.int64)
        data_slots[kept_idx] = flat

        spill = ~kept
        n_spill = int(spill.sum())
        data_spill = np.full(sp.nnz, -1, np.int64)
        data_spill[np.flatnonzero(spill)] = np.arange(n_spill)
        s_rows = (jnp.asarray(nz_row[spill].astype(np.int32))
                  if n_spill else None)
        s_cols = (jnp.asarray(indices[spill].astype(np.int32))
                  if n_spill else None)

        # device-side value fill: ship index plans, reuse device-resident
        # CSR values (host->device bandwidth is the scarce resource)
        if perm is None and is_fedd and isinstance(A.data, jnp.ndarray):
            data_dev = A.data.astype(dtype)
        else:
            data_dev = jnp.asarray(sp.data, dtype)
        vals = _fill_slots(data_dev, jnp.asarray(data_slots),
                           nchunks * 8 * _LANES).reshape(nchunks, 8, _LANES)
        s_vals = (data_dev[jnp.asarray(np.flatnonzero(spill))]
                  if n_spill else None)

        return cls(n_rows, n_cols, vals,
                   jnp.asarray(pidx_flat).reshape(nchunks, 8, _LANES),
                   jnp.asarray(bids), s_rows, s_cols, s_vals, sp.nnz,
                   data_slots, data_spill, dtype, E, K,
                   None if perm is None else jnp.asarray(perm),
                   None if iperm is None else jnp.asarray(iperm),
                   csr_order)

    def with_data(self, data: jnp.ndarray) -> "SellMatrix":
        """Same pattern, new CSR value array (reassembly hot path).
        `data` is in the CALLER's CSR order; under rcm it is reordered
        to the permuted pattern via the csr_order plan."""
        d = jnp.asarray(data).astype(self.dtype)
        if self.csr_order is not None:
            if self._csr_order_dev is None:
                self._csr_order_dev = jnp.asarray(self.csr_order)
            d = d[self._csr_order_dev]
        if self._data_slots_dev is None:
            self._data_slots_dev = jnp.asarray(self.data_slots)
        vals = _fill_slots(d, self._data_slots_dev,
                           self.vals.size).reshape(self.vals.shape)
        if self.spill_rows is not None:
            if self._spill_sel_dev is None:
                self._spill_sel_dev = jnp.asarray(
                    np.flatnonzero(self.data_spill >= 0))
            s_vals = d[self._spill_sel_dev]
        else:
            s_vals = None
        return SellMatrix(self.shape[0], self.shape[1], vals, self.pidx,
                          self.bids, self.spill_rows, self.spill_cols,
                          s_vals, self.nnz, self.data_slots, self.data_spill,
                          self.dtype, self.E, self.K, self.perm, self.iperm,
                          self.csr_order)

    # -- apply ---------------------------------------------------------------
    def operands(self):
        return (self.vals, self.pidx, self.bids, self.spill_rows,
                self.spill_cols, self.spill_vals, self.perm, self.iperm)

    def operator(self):
        """(pure_fn, operands) protocol for jit-argument solver programs.

        Static layout facts (shape, E) are CLOSED OVER — only arrays ride
        as operands, so the fn can be jitted with operands as arguments.
        fns are memoized per layout so solve_jit's program cache (keyed on
        fn identity) is hit across with_data/reassembly."""
        n_rows, n_cols, E = self.shape[0], self.shape[1], self.E
        key = (n_rows, n_cols, E)
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, x):
                return _apply(*ops, x, n_rows, n_cols, E)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return _jit_apply(self.operands(), jnp.asarray(x),
                          self.shape[0], self.shape[1], self.E)

    def hbm_bytes_per_apply(self) -> int:
        b = (self.vals.size * jnp.dtype(self.vals.dtype).itemsize
             + self.pidx.size * 2 + self.bids.size * 4
             + _round_up(self.shape[1], _LANES) * 4 + self.shape[0] * 4)
        if self.spill_rows is not None:
            b += int(self.spill_rows.size) * 16
        return b


@partial(jax.jit, static_argnames=("n_rows", "n_cols", "E"))
def _jit_apply(packed, x, n_rows, n_cols, E):
    return _apply(*packed, x, n_rows, n_cols, E)


def _apply(vals, pidx, bids, s_rows, s_cols, s_vals, perm, iperm, x,
           n_rows, n_cols, E):
    out_dtype = x.dtype
    if perm is not None:
        x = x[perm]
    nx2 = max(_round_up(n_cols, _LANES) // _LANES, 1)
    x2d = jnp.zeros(nx2 * _LANES, vals.dtype).at[:n_cols].set(
        x.astype(vals.dtype)).reshape(nx2, _LANES)
    if use_pallas_sell(vals.dtype):
        y = _sell_mv_pallas(vals, pidx, bids, x2d, E)[:n_rows]
    else:
        y = _sell_mv_xla(vals, pidx, bids, x2d, E)[:n_rows]
    if s_rows is not None:
        y = y + jax.ops.segment_sum(
            s_vals * x2d.reshape(-1)[s_cols], s_rows, num_segments=n_rows)
    if iperm is not None:
        y = y[iperm]
    return y.astype(out_dtype)


def use_pallas_sell(dtype) -> bool:
    import os

    if os.environ.get("FEDD_NO_PALLAS") == "1":
        return False
    try:
        return (jnp.dtype(dtype) == jnp.float32
                and jax.default_backend() != "cpu")
    except Exception:
        return False


def _sell_mv_xla(vals, pidx, bids, x2d, E):
    """Reference/CPU path: plain XLA gathers (identical semantics)."""
    nchunks = vals.shape[0]
    rpl = _LANES // E
    flat = pidx.astype(jnp.int32)  # k*128 + lane indexes win[c].reshape(-1)
    win = x2d[bids].astype(vals.dtype)  # [nchunks, K, 128]
    gathered = jnp.take_along_axis(
        win.reshape(nchunks, 1, -1), flat.reshape(nchunks, 1, 8 * _LANES),
        axis=2).reshape(nchunks, 8, _LANES)
    contrib = vals * gathered
    y = contrib.reshape(nchunks, 8, rpl, E).sum(-1)  # [nchunks, 8, rpl]
    return y.reshape(-1)


# -- Pallas kernel -----------------------------------------------------------

def _make_kernel(K, C, E):
    rpl = _LANES // E

    def kernel(bids_ref, x_ref, vals_ref, pidx_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, rpl), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, rpl), 1)
        seg = (lane // E == col).astype(jnp.float32)
        g = pl.program_id(0)
        pidx = pidx_ref[:].reshape(C * 8, _LANES).astype(jnp.int32)
        k_idx = pidx >> 7
        m_idx = pidx & 127
        v = vals_ref[:].reshape(C * 8, _LANES)
        acc = jnp.zeros((C * 8, _LANES), jnp.float32)
        for k in range(K):  # one big gather per window slot, ALL chunks
            rows = [jnp.broadcast_to(x_ref[bids_ref[g * C + c, k]],
                                     (8, _LANES)) for c in range(C)]
            src = jnp.concatenate(rows, axis=0)  # [C*8, 128]
            gk = jnp.take_along_axis(src, m_idx, axis=1)
            acc = jnp.where(k_idx == k, gk, acc)
        contrib = v * acc
        # precision=HIGHEST: the TPU default truncates the f32 operands
        # to one bf16 pass (observed 1e-3 errors); with a 0/1 selection
        # matrix the 3-pass product is exact in f32
        y = jax.lax.dot_general(
            contrib, seg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        out_ref[:] = y.reshape(C, 8, rpl)

    return kernel


def _sell_mv_pallas(vals, pidx, bids, x2d, E, C=64):
    nchunks = vals.shape[0]
    K = bids.shape[1]
    rpl = _LANES // E
    # bids is scalar-prefetched into SMEM (~1 MB budget) and the compiler
    # pads its trailing axis to the full 128 lanes (observed: an
    # [nchunks, K] int32 table costs nchunks·128·4 B of SMEM regardless of
    # K).  Very tall matrices (e.g. the plan matrices of the Pallas
    # scatter-assembly) exceed it — split the launch into row
    # super-blocks; x2d stays resident across calls.
    MAX_CHUNKS = 1 << 11  # 2048 chunks ≈ 1 MB of padded SMEM table
    if nchunks > MAX_CHUNKS:
        seg = (MAX_CHUNKS // 2) // C * C  # 1024-chunk launches
        parts = []
        for s in range(0, nchunks, seg):
            e = min(s + seg, nchunks)
            parts.append(_sell_mv_pallas(vals[s:e], pidx[s:e], bids[s:e],
                                         x2d, E, C))
        return jnp.concatenate(parts)
    ng = max(_round_up(nchunks, C) // C, 1)
    padc = ng * C - nchunks
    if padc:
        vals = jnp.concatenate(
            [vals, jnp.zeros((padc, 8, _LANES), vals.dtype)])
        pidx = jnp.concatenate(
            [pidx, jnp.zeros((padc, 8, _LANES), pidx.dtype)])
        bids = jnp.concatenate([bids, jnp.zeros((padc, K), bids.dtype)])
    kernel = _make_kernel(K, C, E)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x2d resident
            pl.BlockSpec((C, 8, _LANES), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8, _LANES), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 8, rpl), lambda g, b: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ng * C, 8, rpl), jnp.float32),
            grid_spec=grid_spec,
        )(bids, x2d, vals, pidx)
    return y.reshape(-1)[: nchunks * 8 * rpl].astype(vals.dtype)


def sell_padded_from(A, db, dtype=jnp.float32, K=12):
    """SELL operator on the PADDED-CLUSTERED row/column space of a
    DenseBlockSpMV (la/dense_blocks.py): rows/cols are permuted by
    `db.pad_of_old`, pad lanes are empty rows.  Lets whole Krylov loops run
    in padded space next to the dense-block Schwarz preconditioner with no
    per-iteration permutation gathers.

    The cluster permutation scatters ghost-column support across more
    128-blocks than the natural mesh order, so K defaults higher; the
    remainder rides the exact COO spill path (~0.1% of nnz at K=12 on the
    bench operator)."""
    import scipy.sparse as sps

    sp = A.to_scipy().tocoo()
    pad_of_old = np.asarray(db.pad_of_old)
    M = db.P * db.R
    perm_sp = sps.csr_matrix(
        (np.asarray(sp.data), (pad_of_old[sp.row], pad_of_old[sp.col])),
        shape=(M, M))
    sm = SellMatrix.from_csr(perm_sp, dtype=dtype, K=K)
    # track where each entry of A's CSR order lands in the permuted CSR so
    # with_data(A.data) works for Newton/time reassemblies (scipy CSR→COO
    # keeps CSR slot order; the permuted CSR has no duplicates)
    pos = sps.csr_matrix(
        (np.arange(sp.nnz, dtype=np.int64) + 1,
         (pad_of_old[sp.row], pad_of_old[sp.col])), shape=(M, M)).tocsr()
    pos.sort_indices()
    if pos.nnz == sp.nnz:
        sm.csr_order = np.asarray(pos.data) - 1
    return sm


class PaddedSplitSpMV:
    """Padded-space SpMV as ONE fused windowed-SELL over [xp ++ g(xp)].

    The padded-cluster permutation scatters the ghost-column support of
    each row chunk across many 128-blocks, driving the windowed-SELL pass
    count to K≈12 (vs 4-7 in natural order).  Round 4 split the operator
    into a block-diagonal LOCAL part (K≈2) and a compact-ghost part
    (K≈5); round 5 fuses the two into a SINGLE SELL whose column space is
    [padded ids 0..M) ++ [compact ghost ids M..M+P·G): same K budget, one
    kernel pass, one output — measured 151 (monolithic) → 121 (split) →
    105 us (fused) on the 69k anchor at P=512.

      y = [A_loc | B] · concat(xp, g(xp)),   g = the one-pass
      permutation-gather of the cluster ghost values (la/permute.py).

    with_data() supports Newton/time reassembly."""

    def __init__(self, A, db, dtype=jnp.float32):
        import scipy.sparse as sps

        sp = A.to_scipy().tocoo()
        pad_of_old = np.asarray(db.pad_of_old)
        P, R, G = db.P, db.R, db.G
        M = P * R
        self.shape = (M, M)
        self.dtype = dtype
        pr = pad_of_old[sp.row]
        pc = pad_of_old[sp.col]
        own = (pc // R) == (pr // R)

        # ghost columns -> compact ghost-space ids M + p*G + j via the
        # cluster's ghost list (sorted padded ids per cluster)
        gi = np.asarray(db.ghost_idx)          # [P, G] padded ids (pad M)
        rows_g = pr[~own]
        cols_g = pc[~own]
        pcl = rows_g // R
        j = np.empty(len(cols_g), np.int64)
        for p in np.unique(pcl):
            sel = pcl == p
            j[sel] = np.searchsorted(gi[p], cols_g[sel])
        rows = np.concatenate([pr[own], rows_g])
        cols = np.concatenate([pc[own], M + pcl * G + j])
        opos = np.concatenate([np.flatnonzero(own), np.flatnonzero(~own)])
        srt = np.lexsort((cols, rows))
        comb = sps.csr_matrix(
            (np.asarray(sp.data)[opos[srt]], (rows[srt], cols[srt])),
            shape=(M, M + P * G))
        self.Ac = SellMatrix.from_csr(comb, dtype=dtype)
        self._sel = jnp.asarray(opos[srt])
        self.ghost_plan = db.ghost_plan
        self.P, self.G = P, G
        self.nnz = sp.nnz

    def with_data(self, data: jnp.ndarray) -> "PaddedSplitSpMV":
        d = jnp.asarray(data)
        new = object.__new__(PaddedSplitSpMV)
        new.__dict__.update(self.__dict__)
        new.Ac = self.Ac.with_data(d[self._sel])
        return new

    def operands(self):
        return (self.Ac.operands(), self.ghost_plan)

    def operator(self):
        c_fn, _ = self.Ac.operator()
        key = ("splitf", self.shape[0], self.P, self.G,
               self.Ac.E, self.Ac.K)
        fn = _op_fn_cache.get(key)
        if fn is None:
            P, G = self.P, self.G

            def fn(ops, xp):
                c_ops, gplan = ops
                from feddlib_tpu.la.permute import _permute_apply

                g = _permute_apply(*gplan, xp, P * G, xp.shape[0])
                return c_fn(c_ops, jnp.concatenate([xp, g]))

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def matvec(self, xp: jnp.ndarray) -> jnp.ndarray:
        fn, ops = self.operator()
        return _jit_by_key(fn)(ops, jnp.asarray(xp))

    def hbm_bytes_per_apply(self) -> int:
        return self.Ac.hbm_bytes_per_apply() + self.P * self.G * 6


@partial(jax.jit, static_argnames=("size",))
def _fill_slots(data, slots, size):
    """vals[slots[i]] = data[i] for slots[i] >= 0 (setup-only scatter)."""
    valid = slots >= 0
    return jnp.zeros(size, data.dtype).at[
        jnp.where(valid, slots, size)].set(
        jnp.where(valid, data, 0), mode="drop")


# -- Block-SELL: windowed sliced-ELL over d x d node blocks ------------------

class BlockSellMatrix:
    """Windowed sliced-ELL SpMV for VECTOR-FIELD operators on unstructured
    meshes (dofs-per-node d > 1, NodeWise ordering).

    The slot layout (window blocks, lane indices) is built once on the
    NODE pattern; each slot then carries the d x d block of values.  Per
    apply the lane-gather runs once per (window, component-j) — d x fewer
    gather passes than scalar SELL on the dof pattern — and the int16
    index stream is amortized d² x; the dof pattern's E-padding tax also
    disappears (dof rows pad to E=128 where node rows fit E=32).
    Measured on v5e, 3D P1 elasticity on an RCM-reordered unstructured
    tet mesh (47k nodes / 5.9M nnz): 0.82 ms = 7.2 Gnnz/s vs 1.91 ms =
    3.1 Gnnz/s for scalar SELL on the dof pattern (2.3x).  Pair with
    Domain.from_file(reorder='rcm') — natural file orderings spill ~30%
    of nnz to the slow COO path, RCM ~0.3%.

    Vectors are PLANAR [d, nn] (see la/dia.BlockDiaMatrix — interleaved
    reshapes are lane-starved relayouts).  Non-square or non-NodeWise
    matrices are not supported; use auto_spmv which falls back cleanly.
    """

    def __init__(self, n, d, layout, vals, spill_rows, spill_cols,
                 spill_vals, nnz, dof_slots, spill_sel, dtype):
        self.shape = (n, n)
        self.d = d
        self.layout = layout            # node-pattern SellMatrix (slots)
        self.vals = vals                # [nchunks, d*d, 8, 128]
        self.spill_rows = spill_rows    # planar flat ids (c*nn + node)
        self.spill_cols = spill_cols
        self.spill_vals = spill_vals
        self.nnz = nnz
        self.dof_slots = dof_slots      # device: csr nnz -> flat val slot
        self.spill_sel = spill_sel
        self.dtype = dtype

    @classmethod
    def from_csr(cls, A, d, dtype=jnp.float32, E=None, K=None):
        import scipy.sparse as sps

        is_fedd = hasattr(A, "to_scipy")
        sp = (A.to_scipy() if is_fedd else A).tocsr()
        sp.sort_indices()
        n = sp.shape[0]
        if sp.shape[0] != sp.shape[1] or n == 0 or d <= 1 or n % d:
            return None
        nn = n // d
        row = np.repeat(np.arange(n, dtype=np.int64), np.diff(sp.indptr))
        col = sp.indices.astype(np.int64)
        nr, ci = row // d, row % d
        nc, cj = col // d, col % d
        keys = nr * nn + nc
        ukeys = np.unique(keys)
        if d * d * len(ukeys) > 1.34 * sp.nnz:
            # pattern is not d x d node-blocked (e.g. a merged saddle-point
            # system): padding the missing block entries would blow storage
            return None
        sp_node = sps.csr_matrix(
            (np.ones(len(ukeys), np.float32),
             (ukeys // nn, ukeys % nn)), shape=(nn, nn))
        layout = SellMatrix.from_csr(sp_node, dtype=jnp.float32, E=E, K=K)
        nslot = layout.vals.size                       # nchunks*8*128
        nchunks = layout.vals.shape[0]

        pair_idx = np.searchsorted(ukeys, keys)        # dof nnz -> node pair
        s = layout.data_slots[pair_idx]                # flat node slot or -1
        plane = ci * d + cj
        dof_slots = np.where(s >= 0, plane * nslot + s, -1)

        data_dev = (A.data.astype(dtype)
                    if is_fedd and isinstance(A.data, jnp.ndarray)
                    else jnp.asarray(sp.data, dtype))
        vals = _fill_slots(data_dev, jnp.asarray(dof_slots),
                           d * d * nslot).reshape(d * d, nchunks, 8, _LANES)
        vals = jnp.transpose(vals, (1, 0, 2, 3))       # [nchunks, d*d, 8, L]

        spill_idx = np.flatnonzero(s < 0)
        if len(spill_idx):
            spill_sel = jnp.asarray(spill_idx)
            sr, sc = row[spill_idx], col[spill_idx]
            s_rows = jnp.asarray(((sr % d) * nn + sr // d).astype(np.int32))
            s_cols = jnp.asarray(((sc % d) * nn + sc // d).astype(np.int32))
            s_vals = data_dev[spill_sel]
        else:
            spill_sel = s_rows = s_cols = s_vals = None
        return cls(n, d, layout, vals, s_rows, s_cols, s_vals, sp.nnz,
                   jnp.asarray(dof_slots), spill_sel, dtype)

    def with_data(self, data: jnp.ndarray) -> "BlockSellMatrix":
        dd = jnp.asarray(data).astype(self.dtype)
        d = self.d
        nslot = self.layout.vals.size
        nchunks = self.layout.vals.shape[0]
        vals = _fill_slots(dd, self.dof_slots, d * d * nslot).reshape(
            d * d, nchunks, 8, _LANES)
        vals = jnp.transpose(vals, (1, 0, 2, 3))
        s_vals = dd[self.spill_sel] if self.spill_sel is not None else None
        return BlockSellMatrix(self.shape[0], d, self.layout, vals,
                               self.spill_rows, self.spill_cols, s_vals,
                               self.nnz, self.dof_slots, self.spill_sel,
                               self.dtype)

    # -- vector layout -------------------------------------------------------
    def to_planar(self, x: jnp.ndarray) -> jnp.ndarray:
        nn = self.shape[0] // self.d
        return jnp.asarray(x).reshape(nn, self.d).T

    def from_planar(self, xc: jnp.ndarray) -> jnp.ndarray:
        return xc.T.reshape(-1)

    # -- applies -------------------------------------------------------------
    def operands(self):
        lay = self.layout
        return (self.vals, lay.pidx, lay.bids, self.spill_rows,
                self.spill_cols, self.spill_vals)

    def planar_operator(self):
        d, E = self.d, self.layout.E
        nn = self.shape[0] // d
        key = ("bsell-planar", self.shape[0], d, E, self.layout.K,
               self.layout.vals.shape[0])
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, xc):
                return _block_sell_apply(*ops, xc, nn, d, E)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def operator(self):
        """Interleaved-vector operator (pays two planar relayouts)."""
        d = self.d
        nn = self.shape[0] // d
        p_fn, _ = self.planar_operator()
        key = ("bsell", self.shape[0], d, self.layout.E, self.layout.K,
               self.layout.vals.shape[0])
        fn = _op_fn_cache.get(key)
        if fn is None:
            def fn(ops, x):
                xc = jnp.asarray(x).reshape(nn, d).T
                return p_fn(ops, xc).T.reshape(-1).astype(x.dtype)

            _op_fn_cache[key] = fn
        return fn, self.operands()

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        fn, ops = self.operator()
        return _jit_by_key(fn)(ops, jnp.asarray(x))

    def hbm_bytes_per_apply(self) -> int:
        isz = jnp.dtype(self.dtype).itemsize
        b = (self.vals.size * isz + self.layout.pidx.size * 2
             + self.layout.bids.size * 4 + 2 * self.shape[0] * isz)
        if self.spill_rows is not None:
            b += int(self.spill_rows.size) * (8 + 2 * isz)
        return b


_jit_cache: dict = {}


def _jit_by_key(fn):
    j = _jit_cache.get(fn)
    if j is None:
        j = jax.jit(fn)
        _jit_cache[fn] = j
    return j


def _block_sell_apply(vals, pidx, bids, s_rows, s_cols, s_vals, xc, nn, d,
                      E):
    out_dtype = xc.dtype
    nx2 = max(_round_up(nn, _LANES) // _LANES, 1)
    xpad = jnp.zeros((d, nx2 * _LANES), vals.dtype)
    xpad = xpad.at[:, :nn].set(xc.astype(vals.dtype))
    x2d = xpad.reshape(d * nx2, _LANES)            # component cj at rows
    if use_pallas_sell(vals.dtype):                # [cj*nx2, (cj+1)*nx2)
        y = _block_sell_mv_pallas(vals, pidx, bids, x2d, E, d, nx2)
    else:
        y = _block_sell_mv_xla(vals, pidx, bids, x2d, E, d, nx2)
    y = y[:, :nn]                                   # [d, nn]
    if s_rows is not None:
        contrib = s_vals * xc.astype(vals.dtype).reshape(-1)[s_cols]
        y = (y.reshape(-1) + jax.ops.segment_sum(
            contrib, s_rows, num_segments=d * nn)).reshape(d, nn)
    return y.astype(out_dtype)


def _block_sell_mv_xla(vals, pidx, bids, x2d, E, d, nx2):
    """CPU/reference path (identical semantics to the Pallas kernel)."""
    nchunks = vals.shape[0]
    rpl = _LANES // E
    flat = pidx.astype(jnp.int32)
    ys = []
    gathered = []
    for cj in range(d):
        win = x2d.reshape(d, nx2, _LANES)[cj][bids]    # [nchunks, K, 128]
        g = jnp.take_along_axis(
            win.reshape(nchunks, 1, -1),
            flat.reshape(nchunks, 1, 8 * _LANES),
            axis=2).reshape(nchunks, 8, _LANES)
        gathered.append(g)
    for ci in range(d):
        contrib = sum(vals[:, ci * d + cj] * gathered[cj]
                      for cj in range(d))
        y = contrib.reshape(nchunks, 8, rpl, E).sum(-1)
        ys.append(y.reshape(-1))
    return jnp.stack(ys)                               # [d, nchunks*8*rpl]


def _make_block_kernel(K, C, E, d, nx2):
    # chunk loop is an IN-KERNEL fori_loop: an unrolled C x K x d body is
    # ~K*d*C Mosaic ops and compiles for >9 minutes at realistic sizes;
    # the looped body is K*d ops and compiles like the scalar kernel
    rpl = _LANES // E

    def kernel(bids_ref, x_ref, vals_ref, pidx_ref, out_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (_LANES, rpl), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (_LANES, rpl), 1)
        seg = (lane // E == col).astype(jnp.float32)
        g = pl.program_id(0)

        def body(c, carry):
            pidx = pidx_ref[c].astype(jnp.int32)         # [8, 128]
            k_idx = pidx >> 7
            m_idx = pidx & 127
            gathered = []
            for cj in range(d):
                acc = jnp.zeros((8, _LANES), jnp.float32)
                for k in range(K):
                    src = jnp.broadcast_to(
                        x_ref[cj * nx2 + bids_ref[g * C + c, k]],
                        (8, _LANES))
                    gk = jnp.take_along_axis(src, m_idx, axis=1)
                    acc = jnp.where(k_idx == k, gk, acc)
                gathered.append(acc)
            for ci in range(d):
                contrib = gathered[0] * vals_ref[c, ci * d]
                for cj in range(1, d):
                    contrib = contrib + gathered[cj] * vals_ref[
                        c, ci * d + cj]
                y = jax.lax.dot_general(
                    contrib, seg, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                out_ref[c, ci] = y                       # [8, rpl]
            return carry

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


def _block_sell_mv_pallas(vals, pidx, bids, x2d, E, d, nx2, C=None):
    nchunks = vals.shape[0]
    K = bids.shape[1]
    rpl = _LANES // E
    if C is None:
        C = 64
    if nchunks > (1 << 11):   # SMEM prefetch-table budget (see scalar path)
        return _block_sell_mv_xla(vals, pidx, bids, x2d, E, d, nx2)
    ng = max(_round_up(nchunks, C) // C, 1)
    padc = ng * C - nchunks
    if padc:
        vals = jnp.concatenate(
            [vals, jnp.zeros((padc,) + vals.shape[1:], vals.dtype)])
        pidx = jnp.concatenate(
            [pidx, jnp.zeros((padc, 8, _LANES), pidx.dtype)])
        bids = jnp.concatenate([bids, jnp.zeros((padc, K), bids.dtype)])
    kernel = _make_block_kernel(K, C, E, d, nx2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),       # x2d resident
            pl.BlockSpec((C, d * d, 8, _LANES), lambda g, b: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 8, _LANES), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, d, 8, rpl), lambda g, b: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    with jax.enable_x64(False):
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ng * C, d, 8, rpl),
                                           jnp.float32),
            grid_spec=grid_spec,
        )(bids, x2d, vals, pidx)
    y = y[:nchunks]                                    # [nchunks, d, 8, rpl]
    return jnp.transpose(y, (1, 0, 2, 3)).reshape(
        d, -1).astype(vals.dtype)
