"""SPMD distributed FE assembly — each device assembles ITS elements and
ghost-row contributions are exported to the owning device.

NOTE: superseded by `feddlib_tpu.parallel.pipeline.DistributedPipeline`,
which generalizes this scalar-Laplace prototype to every operator and to
block systems and emits DistributedCsr ELL values directly.  Kept as the
minimal reference implementation of the exchange plan.

This is the scalable analog of the reference's assembly flow
(SURVEY.md §3.1: rank-local element loops insert into globally-indexed rows;
fillComplete/Export reduces off-rank contributions to owners,
MeshPartitioner + Tpetra Export).  All plans are static host-built index
maps; the device program is

    values_q = element_kernel(vert_coords_q)               (batched, local)
    acc      = segment_sum(values_q, seg_ids_q)            (local + send)
    buf      = all_gather(acc[send part])                  (ICI)
    data_q   = acc[local] + segment_sum(buf[recv_src], recv_dst)

producing each device's owned-row CSR values without any global matrix ever
existing on one device.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import PartitionSpec as P

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.la.csr import SparsityPattern
from feddlib_tpu.la.map import IndexMap
from feddlib_tpu.mesh.partition import MeshPartition
from feddlib_tpu.parallel.spmd import AXIS, DeviceAxis, _pad_stack


class DistributedAssembly:
    """Distributed scalar/vector Laplace-type assembly over a MeshPartition.

    Builds, per device: padded element vertex coords, the segment-target
    plan (local CSR slot or send-buffer slot per element-matrix entry), and
    the send/recv exchange plan.  `assemble(axis, kernel_name)` runs the
    shard_map program and returns stacked owned-row CSR data
    [n_dev, L_max] whose slots follow each device's local CSR
    (rows = owned dofs sorted ascending, columns sorted within rows)."""

    def __init__(self, part: MeshPartition, dofs_per_node: int = 1):
        mesh = part.mesh
        self.part = part
        self.dofs = dofs_per_node
        n_dev = part.n_parts
        self.n_dev = n_dev
        nv = mesh.vertices_per_element
        nb = mesh.nodes_per_element
        nloc = nb * dofs_per_node
        n_dofs = mesh.n_points * dofs_per_node

        # global dof pattern (host symbolic, shared bookkeeping only)
        elem_dofs = asm.vector_dof_ids(mesh.elements, dofs_per_node) \
            if dofs_per_node > 1 else mesh.elements
        pat = asm.scatter_pattern(elem_dofs, elem_dofs, n_dofs, n_dofs)
        dof_map = part.unique_map.build_vec_field_map(dofs_per_node) \
            if dofs_per_node > 1 else part.unique_map
        owner = dof_map.owner_of()

        # per-device local CSR slot table: owned rows ascending, cols sorted
        rows_of = pat.rows_of_slots()
        slot_owner = owner[rows_of]
        self.local_slot_of_global = np.full(pat.nnz, -1, dtype=np.int64)
        self.n_local = np.zeros(n_dev, dtype=np.int64)
        for p in range(n_dev):
            sel = np.nonzero(slot_owner == p)[0]  # ascending = local order
            self.local_slot_of_global[sel] = np.arange(len(sel))
            self.n_local[p] = len(sel)
        self.L = int(self.n_local.max())
        self.pattern = pat
        self.dof_map = dof_map

        # per-device element lists and their COO slot targets
        E_max = int(part.element_map.local_sizes.max())
        self.E_max = E_max
        vc_l, seg_l, valid_l = [], [], []
        send_pairs: List[np.ndarray] = []
        for q in range(n_dev):
            eids = part.elem_ids[q]
            Eq = len(eids)
            vc = np.zeros((E_max, nv, mesh.dim))
            vc[:Eq] = mesh.points[mesh.elements[eids][:, :nv]]
            vc[Eq:] = mesh.points[mesh.elements[0][:nv]]  # benign pad geometry
            valid = np.zeros(E_max)
            valid[:Eq] = 1.0
            # slots of this device's element contributions
            ed = elem_dofs[eids]
            rows = np.broadcast_to(ed[:, :, None], (Eq, nloc, nloc)).ravel()
            cols = np.broadcast_to(ed[:, None, :], (Eq, nloc, nloc)).ravel()
            key = rows * n_dofs + cols
            gslot = np.searchsorted(_pattern_keys(pat, n_dofs), key)
            dest = owner[rows]
            remote = dest != q
            # send list: unique (dest_global_slot) pairs
            send_slots = np.unique(gslot[remote])
            send_pairs.append(send_slots)
            slot_in_send = np.full(pat.nnz, -1, dtype=np.int64)
            slot_in_send[send_slots] = np.arange(len(send_slots))
            seg = np.where(remote,
                           self.L + slot_in_send[gslot],
                           self.local_slot_of_global[gslot])
            seg_full = np.full(E_max * nloc * nloc, self.L - 1
                               if self.L else 0, dtype=np.int64)
            # pad elements scatter into a dump slot; their values are zeroed
            # by `valid` anyway — send them to local slot 0
            seg_full[: len(seg)] = seg
            seg_full[len(seg):] = 0
            vc_l.append(vc)
            seg_l.append(seg_full)
            valid_l.append(valid)
        self.S = max(max((len(s) for s in send_pairs), default=0), 1)

        # recv plans: owner p gathers, from each q's send buffer, entries
        # whose global slot it owns
        recv_src, recv_dst = [], []
        for p in range(n_dev):
            src_l, dst_l = [], []
            for q in range(n_dev):
                if q == p:
                    continue
                ss = send_pairs[q]
                sel = np.nonzero(owner[rows_of[ss]] == p)[0]
                src_l.append(q * self.S + sel)
                dst_l.append(self.local_slot_of_global[ss[sel]])
            recv_src.append(np.concatenate(src_l) if src_l
                            else np.array([], np.int64))
            recv_dst.append(np.concatenate(dst_l) if dst_l
                            else np.array([], np.int64))
        self.Rx = max(max((len(s) for s in recv_src), default=0), 1)

        self.vert_coords = jnp.asarray(np.stack(vc_l))
        self.seg_ids = jnp.asarray(_pad_stack(
            [s for s in seg_l], 0, E_max * nloc * nloc, np.int64).astype(
                np.int32))
        self.valid = jnp.asarray(np.stack(valid_l))
        self.recv_src = jnp.asarray(_pad_stack(recv_src, 0, self.Rx, np.int32))
        self.recv_dst = jnp.asarray(_pad_stack(recv_dst, self.L, self.Rx,
                                               np.int32))
        self.nloc = nloc
        self.dim = mesh.dim
        self.fe_type = mesh.fe_type

    def assemble_laplace(self, axis: DeviceAxis) -> jnp.ndarray:
        """Distributed scalar Laplace assembly → [n_dev, L] owned CSR data."""
        if self.dofs != 1:
            raise ValueError("assemble_laplace: dofs_per_node=1 only")
        L, S, Rx = self.L, self.S, self.Rx
        dim, fe = self.dim, self.fe_type

        def prog(vc, seg, valid, rsrc, rdst):
            vc, seg, valid = vc[0], seg[0], valid[0]
            rsrc, rdst = rsrc[0], rdst[0]
            Ke = asm.elem_laplace(vc, dim, fe) * valid[:, None, None]
            acc = jax.ops.segment_sum(Ke.reshape(-1), seg,
                                      num_segments=L + S)
            local, send = acc[:L], acc[L:]
            buf = lax.all_gather(send, AXIS)  # [n_dev, S]
            vals = buf.reshape(-1)[rsrc]
            add = jax.ops.segment_sum(vals, rdst, num_segments=L + 1)[:L]
            return (local + add)[None]

        f = jax.jit(axis.shard_map(prog, (P(AXIS),) * 5, P(AXIS)))
        return f(self.vert_coords, self.seg_ids, self.valid,
                 self.recv_src, self.recv_dst)

    def reference_local_data(self, global_data: np.ndarray) -> np.ndarray:
        """Slice serial CSR data into the per-device local layout (for
        verification)."""
        out = np.zeros((self.n_dev, self.L))
        owner = self.dof_map.owner_of()
        slot_owner = owner[self.pattern.rows_of_slots()]
        for p in range(self.n_dev):
            sel = np.nonzero(slot_owner == p)[0]
            out[p, : len(sel)] = global_data[sel]
        return out


def _pattern_keys(pat: SparsityPattern, n_cols: int) -> np.ndarray:
    return pat.rows_of_slots() * n_cols + pat.indices
