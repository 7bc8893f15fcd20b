"""SPMD distributed linear algebra over a JAX device mesh.

The TPU-native replacement for Tpetra Import/Export + MPI (SURVEY.md §2.9):
the host precomputes *static* communication plans (the analog of Tpetra
Import objects cached on vectors, MultiVector_decl.hpp:156-157), and jitted
`shard_map` programs execute them with XLA collectives over ICI:

- unique→repeated import (halo exchange): NEIGHBOR-WISE — the partition
  neighbor graph is edge-colored host-side and each color becomes one
  `lax.ppermute` round moving only that pair's boundary values, so per-
  apply volume is O(local cut), independent of device count (the Tpetra
  Import plan executed as point-to-point ICI sends).  The legacy
  all_gather plan remains for one-shot setup paths;
- repeated→unique export/add: the same rounds reversed, ghost
  contributions scatter-added into owner rows (Tpetra Export, Add);
- global reductions ride `lax.psum` (the dot-product allreduce of
  SURVEY.md §3.5).

Layout: every per-device array is stacked host-side into [n_dev, ...] and
passed through shard_map with `P('dd')`, so each device sees its own [1, ...]
slice.  Owned vectors are zero-padded to the max local size — padded lanes
stay zero through SpMV/axpy/dots by construction.

Local (per-device) matrix layout: rows = owned dofs (padded), columns in
*column-map local* numbering [owned | ghost], ELL-padded — SpMV is a dense
gather + row reduction at HBM bandwidth.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from feddlib_tpu.la.csr import CsrMatrix
from feddlib_tpu.la.map import IndexMap

AXIS = "dd"  # the domain-decomposition mesh axis name


@dataclass
class DeviceAxis:
    """1-D device mesh wrapper for the DD axis."""

    n_dev: int
    mesh: Mesh

    @classmethod
    def make(cls, n_dev: Optional[int] = None) -> "DeviceAxis":
        devs = jax.devices()
        n = n_dev or len(devs)
        return cls(n, Mesh(np.array(devs[:n]), (AXIS,)))

    def shard_map(self, f, in_specs, out_specs):
        return jax.shard_map(f, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)


def _col_local_ids(owned: np.ndarray, ghosts: np.ndarray, cols: np.ndarray,
                   N_o: int) -> np.ndarray:
    """Translate global column ids to col-map-local numbering
    [owned (padded to N_o) | ghosts] via sorted-array lookups — O(nnz log)
    per device instead of an O(n_global) scratch array per device (which
    is an O(n_dev · n_global) host-memory wall at scale).  `owned` and
    `ghosts` must be sorted; every col must appear in one of them."""
    cols = np.asarray(cols, dtype=np.int64)
    i = np.searchsorted(owned, cols)
    i_c = np.minimum(i, max(len(owned) - 1, 0))
    is_own = (owned[i_c] == cols) if len(owned) else np.zeros(len(cols), bool)
    j = np.searchsorted(ghosts, cols)
    return np.where(is_own, i_c, N_o + j)


def _pad_stack(arrs: List[np.ndarray], pad_value, width: Optional[int] = None,
               dtype=None) -> np.ndarray:
    w = width if width is not None else max((len(a) for a in arrs), default=0)
    w = max(w, 1)
    out = np.full((len(arrs), w), pad_value,
                  dtype=dtype or (arrs[0].dtype if len(arrs) else np.int64))
    for i, a in enumerate(arrs):
        out[i, : len(a)] = a
    return out


class HaloPlan:
    """Static unique↔repeated exchange plan over the DD axis.

    Built from a unique (owned) map and per-part global column lists
    (col_gids[p] = owned gids ++ ghost gids, owned first — the local column
    map).  All arrays are stacked [n_dev, ...] ready for shard_map.
    """

    def __init__(self, unique_map: IndexMap, col_gids: List[np.ndarray]):
        n_dev = unique_map.n_parts
        self.n_dev = n_dev
        self.n_owned = unique_map.local_sizes  # [n_dev]
        self.N_o = int(self.n_owned.max())
        owner = unique_map.owner_of()

        owned_lists = unique_map.partition_indices
        ghost_lists = []
        for p in range(n_dev):
            n_own = len(owned_lists[p])
            if not np.array_equal(col_gids[p][:n_own], owned_lists[p]):
                raise ValueError("col_gids must start with the owned gids")
            ghost_lists.append(col_gids[p][n_own:])
        self.G = max(max((len(g) for g in ghost_lists), default=0), 1)

        # position of each global id within its owner's owned list
        pos_in_owner = np.full(unique_map.n_global, -1, dtype=np.int64)
        for p in range(n_dev):
            pos_in_owner[owned_lists[p]] = np.arange(len(owned_lists[p]))

        # send sets: owned ids needed as ghosts elsewhere
        needed_by = [[] for _ in range(n_dev)]
        for p in range(n_dev):
            for g_owner, gid in zip(owner[ghost_lists[p]], ghost_lists[p]):
                needed_by[g_owner].append(gid)
        send_gids = [np.unique(np.array(lst, dtype=np.int64))
                     for lst in needed_by]
        self.B = max(max((len(s) for s in send_gids), default=0), 1)
        # send_idx: positions in x_own to pull (pad: 0 → sends a junk value
        # nobody reads)
        self.send_idx = jnp.asarray(_pad_stack(
            [pos_in_owner[s] for s in send_gids], 0, self.B, np.int32))

        # ghost_src: for each ghost gid of part p, flat index owner*B + pos
        # into the all-gathered [n_dev, B] buffer
        ghost_src = []
        send_slot = {}
        for q in range(n_dev):
            for i, gid in enumerate(send_gids[q]):
                send_slot[(q, int(gid))] = i
        for p in range(n_dev):
            src = np.array(
                [owner[g] * self.B + send_slot[(owner[g], int(g))]
                 for g in ghost_lists[p]], dtype=np.int64)
            ghost_src.append(src)
        self.ghost_src = jnp.asarray(_pad_stack(ghost_src, 0, self.G, np.int32))

        # export/add reverse plan: ghost contributions → owner rows.
        # For owner p: entries (src_dev q, ghost position k in q) with
        # ghost_lists[q][k] owned by p; destination = local owned position.
        recv_src, recv_dst = [], []
        for p in range(n_dev):
            src_list, dst_list = [], []
            for q in range(n_dev):
                if q == p:
                    continue
                gl = ghost_lists[q]
                sel = np.nonzero(owner[gl] == p)[0]
                src_list.append(q * self.G + sel)
                dst_list.append(pos_in_owner[gl[sel]])
            src = (np.concatenate(src_list) if src_list
                   else np.array([], np.int64))
            dst = (np.concatenate(dst_list) if dst_list
                   else np.array([], np.int64))
            recv_src.append(src)
            recv_dst.append(dst)
        self.R = max(max((len(s) for s in recv_src), default=0), 1)
        self.recv_src = jnp.asarray(_pad_stack(recv_src, 0, self.R, np.int32))
        # pad destination → N_o (an extra accumulator slot that is dropped)
        self.recv_dst = jnp.asarray(_pad_stack(recv_dst, self.N_o, self.R,
                                               np.int32))

        # mask of real (non-pad) owned lanes
        self.owned_mask = jnp.asarray(
            (np.arange(self.N_o)[None, :] < self.n_owned[:, None]))

        # ---- neighbor-wise ppermute schedule (SURVEY §2.9 backend) ---------
        # The all_gather plans above move O(n_dev · B) per device; the
        # production exchange is point-to-point: the partition neighbor
        # graph is edge-colored greedily, each color becomes one
        # `lax.ppermute` round moving only that pair's boundary, so
        # per-apply communication is O(local cut) independent of n_dev.
        pair_gids = {}  # (src q, dst p) -> gids owned by q ghosted on p
        for p in range(n_dev):
            gl = ghost_lists[p]
            if not len(gl):
                continue
            own = owner[gl]
            for q in np.unique(own):
                pair_gids[(int(q), p)] = np.sort(gl[own == q])
        edges = sorted({tuple(sorted((q, p))) for (q, p) in pair_gids})
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

        self._round_meta = []   # [(perm, W_r)] — static, closed over
        si_rounds, rev_rounds = [], []
        base = 0
        ghost_pos = {}  # (p, gid) -> flat recv index
        for r in range(n_rounds):
            perm = []
            W = 1
            members = {}
            for e, c in color_of.items():
                if c != r:
                    continue
                a, b = e
                perm += [(a, b), (b, a)]
                members[a] = b
                members[b] = a
                W = max(W,
                        len(pair_gids.get((a, b), ())),
                        len(pair_gids.get((b, a), ())))
            si = np.zeros((n_dev, W), np.int64)    # owned positions to send
            rev = np.full((n_dev, W), self.G, np.int64)  # ghost-section pos
            for q, p in list(members.items()):
                g = pair_gids.get((q, p))
                if g is None:
                    continue
                si[q, : len(g)] = pos_in_owner[g]
                # receiver p: where these land in its ghost section, and
                # their flat position in the concatenated recv stream
                gpos = np.searchsorted(ghost_lists[p], g)
                rev[p, : len(g)] = gpos
                for j, gid in enumerate(g):
                    ghost_pos[(p, int(gid))] = base + j
            self._round_meta.append((perm, W))
            si_rounds.append(jnp.asarray(si.astype(np.int32)))
            rev_rounds.append(jnp.asarray(rev.astype(np.int32)))
            base += W
        self._recv_total = base
        gidx = np.full((n_dev, self.G), base, np.int64)  # pad -> zero slot
        for p in range(n_dev):
            for i, gid in enumerate(ghost_lists[p]):
                gidx[p, i] = ghost_pos[(p, int(gid))]
        self.import_arrays = (tuple(si_rounds),
                              jnp.asarray(gidx.astype(np.int32)))
        self.export_arrays = (tuple(rev_rounds), tuple(si_rounds))

    def importer(self):
        """f(x_own [N_o], import_arrays-locals) → x_col [N_o + G], for use
        INSIDE shard_map.  Round perms are static (closed over)."""
        meta = self._round_meta

        def imp(x_own, arrs):
            si_rounds, gidx = arrs
            bufs = [jnp.zeros(0, x_own.dtype)]
            for (perm, _W), si in zip(meta, si_rounds):
                bufs.append(lax.ppermute(x_own[si], AXIS, perm))
            bufs.append(jnp.zeros(1, x_own.dtype))  # pad-ghost zero slot
            stream = jnp.concatenate(bufs)
            return jnp.concatenate([x_own, stream[gidx]])

        return imp

    def exporter(self):
        """f(y_col [N_o + G], export_arrays-locals) → y_own [N_o] with
        remote ghost contributions summed into owners (Export/Add).  Each
        round sends ghost contributions BACK along the reversed pairs."""
        meta = self._round_meta
        N_o = self.N_o

        def exp(y_col, arrs):
            rev_rounds, si_rounds = arrs
            yg = jnp.concatenate([y_col[N_o:], jnp.zeros(1, y_col.dtype)])
            y = y_col[:N_o]
            for (perm, _W), rv, si in zip(meta, rev_rounds, si_rounds):
                recv = lax.ppermute(yg[rv], AXIS, perm)
                y = y.at[si].add(recv)
            return y

        return exp

    def comm_stats(self) -> dict:
        """Per-apply exchange volume (elements per device, worst case)."""
        pp = sum(w for _, w in self._round_meta)
        return {"rounds": len(self._round_meta),
                "ppermute_elems": pp,
                "allgather_elems": self.n_dev * int(self.B)}

def import_ghosts(x_own, send_idx, ghost_src):
    """Inside shard_map: x_own [N_o] (local), send_idx [B], ghost_src [G]
    → x_col [N_o + G]."""
    xb = x_own[send_idx]  # [B]
    buf = lax.all_gather(xb, AXIS)  # [n_dev, B]
    ghosts = buf.reshape(-1)[ghost_src]  # [G]
    return jnp.concatenate([x_own, ghosts])


def export_add(y_col, N_o, recv_src, recv_dst):
    """Inside shard_map: y_col [N_o + G] local contributions (owned ++
    ghost rows) → y_own [N_o] with remote ghost contributions summed in
    (Tpetra Export, Add combine)."""
    ghost_part = y_col[N_o:]
    buf = lax.all_gather(ghost_part, AXIS)  # [n_dev, G]
    vals = buf.reshape(-1)[recv_src]  # [R]
    add = jax.ops.segment_sum(vals, recv_dst, num_segments=N_o + 1)[:N_o]
    return y_col[:N_o] + add


class DistributedCsr:
    """Row-distributed sparse matrix in per-device ELL layout.

    Built host-side from a global CsrMatrix + a unique row map: rows are
    scattered to owners; the per-device column map is the union of owned ids
    and the column support of owned rows (ghosts), which defines the halo
    plan for SpMV."""

    @classmethod
    def from_parts(cls, unique_map: IndexMap, col_gids: List[np.ndarray],
                   ell_cols: np.ndarray, ell_data, K: int,
                   plan: Optional["HaloPlan"] = None,
                   row_lens: Optional[np.ndarray] = None) -> "DistributedCsr":
        """Construct directly from per-device data — used by the
        device-resident distributed assembly pipeline (parallel/pipeline.py):
        no global matrix is ever formed (the reference never forms one
        either; rank-local assembly + Export, FE_def.hpp:637-665).

        col_gids[p]: owned gids ++ ghost gids (local column map);
        ell_cols [n_dev, K, N_o]: column-map-local ELL plan;
        ell_data [n_dev, K, N_o]: device array of values (may be updated
        in place across reassemblies);
        row_lens [n_dev, N_o]: per-row nnz (identifies padding slots —
        needed by the symbolic locator used for preconditioner setup)."""
        obj = cls.__new__(cls)
        obj.n_global = unique_map.n_global
        obj.unique_map = unique_map
        obj.n_dev = unique_map.n_parts
        obj.K = K
        obj.plan = plan if plan is not None else HaloPlan(unique_map, col_gids)
        obj.col_gids = col_gids
        obj.ell_cols = (ell_cols if isinstance(ell_cols, jnp.ndarray)
                        else jnp.asarray(ell_cols))
        obj.ell_data = ell_data
        obj.row_lens = row_lens
        obj._locator = None
        return obj

    def locator(self):
        """Symbolic global pattern locator (host, integers only): a scipy
        CSR over the GLOBAL index space whose .data are 1 + flat positions
        into the stacked [n_dev, K, N_o] ELL value tensor.  Lets
        preconditioner setup (overlap growth, subdomain extraction, GDSW)
        address any matrix entry WITHOUT a global numeric matrix — the
        values stay device-resident (or are pulled per-device)."""
        if self._locator is not None:
            return self._locator
        import scipy.sparse as sps

        if self.row_lens is None:
            raise ValueError("locator requires row_lens metadata")
        n_dev, K = self.n_dev, self.K
        N_o = self.plan.N_o
        ec = np.asarray(self.ell_cols)
        rows_l, cols_l, pos_l = [], [], []
        for p in range(n_dev):
            owned = self.unique_map.partition_indices[p]
            n_own = len(owned)
            lens = self.row_lens[p][:n_own]
            # global col gid from col-map-local id (owned padded to N_o,
            # ghosts from N_o)
            cmap = np.zeros(N_o + max(len(self.col_gids[p]) - n_own, 0) + 1,
                            dtype=np.int64)
            cmap[:n_own] = owned
            cmap[N_o: N_o + len(self.col_gids[p]) - n_own] = \
                self.col_gids[p][n_own:]
            kk, ii = np.nonzero(np.arange(K)[:, None] < lens[None, :])
            rows_l.append(owned[ii])
            cols_l.append(cmap[ec[p, kk, ii]])
            pos_l.append(1 + p * K * N_o + kk * N_o + ii)
        self._locator = sps.csr_matrix(
            (np.concatenate(pos_l),
             (np.concatenate(rows_l), np.concatenate(cols_l))),
            shape=(self.n_global, self.n_global))
        return self._locator

    def ell_host(self) -> np.ndarray:
        """Host copy of the stacked ELL values [n_dev, K, N_o] — cached
        per matrix.  Multiprocess-safe: when the array spans devices of
        OTHER processes (pipeline output under jax.distributed), the
        remote shards are gathered once via process_allgather (the
        reference's rank-local KLU setup reads only local rows; here the
        replicated-host setup convention needs the full copy)."""
        cached = getattr(self, "_host_ell", None)
        if cached is not None and cached[0] is self.ell_data:
            return cached[1]
        try:
            vals = np.asarray(self.ell_data)
        except RuntimeError:  # spans non-addressable devices
            from jax.experimental import multihost_utils

            vals = np.asarray(multihost_utils.process_allgather(
                self.ell_data, tiled=True))
        self._host_ell = (self.ell_data, vals)
        return vals

    def values_host(self) -> np.ndarray:
        """Flat host copy of the stacked ELL values (per-device pulls; used
        only at preconditioner SETUP — the f64 subdomain factorizations the
        reference does on host via KLU, parametersPrec.xml Solver→KLU)."""
        return self.ell_host().reshape(-1)

    def local_rows(self, p: int):
        """(owned_gids, scipy CSR [n_own, n_global]) of device p's owned
        rows — the per-device row view preconditioner setup works from
        (GDSW harmonic extensions, RAP) without a global matrix."""
        import scipy.sparse as sps

        if self.row_lens is None:
            raise ValueError("local_rows requires row_lens metadata")
        owned = self.unique_map.partition_indices[p]
        n_own = len(owned)
        N_o = self.plan.N_o
        lens = self.row_lens[p][:n_own]
        ec = np.asarray(self.ell_cols[p])
        ed = self.ell_host()[p]
        cmap = np.zeros(N_o + max(len(self.col_gids[p]) - n_own, 0) + 1,
                        dtype=np.int64)
        cmap[:n_own] = owned
        cmap[N_o: N_o + len(self.col_gids[p]) - n_own] = self.col_gids[p][n_own:]
        kk, ii = np.nonzero(np.arange(self.K)[:, None] < lens[None, :])
        return owned, sps.csr_matrix(
            (ed[kk, ii], (ii, cmap[ec[kk, ii]])),
            shape=(n_own, self.n_global))

    def __init__(self, global_csr: CsrMatrix, unique_map: IndexMap,
                 dtype=jnp.float64):
        self.n_global = global_csr.shape[0]
        if global_csr.shape[0] != global_csr.shape[1]:
            raise ValueError("DistributedCsr requires a square matrix")
        if unique_map.n_global != self.n_global:
            raise ValueError("row map size mismatch")
        self.unique_map = unique_map
        n_dev = unique_map.n_parts
        self.n_dev = n_dev

        sp = global_csr.to_scipy()
        data_np = np.asarray(global_csr.data)

        col_gids = []
        ell_cols_l, ell_data_l = [], []
        K = 0
        rows_info = []
        N_o = unique_map.max_local_size
        for p in range(n_dev):
            owned = unique_map.partition_indices[p]
            sub = sp[owned]  # [n_own, n_global] CSR
            cols_support = np.unique(sub.indices)
            ghosts = np.setdiff1d(cols_support, owned, assume_unique=False)
            cg = np.concatenate([owned, ghosts])
            col_gids.append(cg)
            # global col id → col-map local via sorted lookups.  The
            # device-side x_col layout is [owned padded to N_o | ghosts],
            # so ghost locals start at N_o, not at n_own.
            rows_info.append((sub, owned, ghosts, len(cg)))
            K = max(K, int(np.diff(sub.indptr).max()) if sub.nnz else 1)
        self.K = K
        self.plan = HaloPlan(unique_map, col_gids)
        assert self.plan.N_o == N_o
        G = self.plan.G

        row_lens = np.zeros((n_dev, N_o), dtype=np.int64)
        for p in range(n_dev):
            sub, owned_p, ghosts_p, n_col = rows_info[p]
            n_own = sub.shape[0]
            # transposed ELL [K, N_o]: rows ride the 128-lane axis (see
            # feddlib_tpu.la.csr._ell_plan for the layout rationale)
            ec = np.zeros((K, N_o), dtype=np.int32)
            ed = np.zeros((K, N_o), dtype=np.float64)
            lens = np.diff(sub.indptr)
            r = np.repeat(np.arange(n_own), lens)
            pos = np.arange(sub.nnz) - np.repeat(sub.indptr[:-1], lens)
            ec[pos, r] = _col_local_ids(owned_p, ghosts_p, sub.indices, N_o)
            ed[pos, r] = sub.data
            row_lens[p, :n_own] = lens
            ell_cols_l.append(ec)
            ell_data_l.append(ed)
        self.ell_cols = jnp.asarray(np.stack(ell_cols_l))  # [ndev, K, N_o]
        self.ell_data = jnp.asarray(np.stack(ell_data_l), dtype=dtype)
        self.col_gids = col_gids
        self.row_lens = row_lens
        self._locator = None

    # device-side local matvec (inside shard_map)
    @staticmethod
    def local_matvec(ell_data, ell_cols, x_col):
        """ell_* [K, N_o] local; x_col [N_o + G] → y_own [N_o]."""
        return jnp.sum(ell_data * x_col[ell_cols], axis=0)

    def matvec_fn(self):
        """Returns f(x_own_local, ell_data, ell_cols, send_idx, ghost_src)
        for composition inside shard_map."""
        def f(x_own, ell_data, ell_cols, send_idx, ghost_src):
            x_col = import_ghosts(x_own, send_idx, ghost_src)
            return self.local_matvec(ell_data, ell_cols, x_col)
        return f


# -- host-side vector scatter/gather ----------------------------------------


def distribute_vector(x_global: np.ndarray, unique_map: IndexMap,
                      N_o: Optional[int] = None) -> jnp.ndarray:
    """Global [n] → stacked owned [n_dev, N_o] (zero-padded)."""
    N_o = N_o or unique_map.max_local_size
    out = np.zeros((unique_map.n_parts, N_o), dtype=np.float64)
    xg = np.asarray(x_global)
    for p, ix in enumerate(unique_map.partition_indices):
        out[p, : len(ix)] = xg[ix]
    return jnp.asarray(out)


def collect_vector(x_dist, unique_map: IndexMap) -> np.ndarray:
    """Stacked owned [n_dev, N_o] → global [n]."""
    xd = np.asarray(x_dist)
    out = np.zeros(unique_map.n_global, dtype=xd.dtype)
    for p, ix in enumerate(unique_map.partition_indices):
        out[ix] = xd[p, : len(ix)]
    return out
