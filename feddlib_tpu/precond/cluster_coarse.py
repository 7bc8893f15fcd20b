"""Two-level Schwarz in the PADDED CLUSTER space — the TPU production
preconditioner for the mixed-precision solve path.

The one-level restricted Schwarz of the padded-cluster layout
(la/dense_blocks.DenseBlockSchwarz) keeps whole Krylov loops free of
permutation gathers; this module adds the GDSW coarse level
(parametersPrec.xml TwoLevel=true; FROSch GDSWCoarseOperator) in the SAME
space, with every step mapped to TPU-friendly primitives:

  restrict   q[p,c]   = Φ_p^T r_p          batched MXU einsum [P,c,R]×[P,R]
  reduce     rc       = S q.ravel()         0/1 plan-matrix SELL SpMV
                                            (coarse fns straddle clusters)
  coarse     zc       = A0⁻¹ rc             dense [nc,nc] matmul
  spread     zg[p,c]  = zc[idx[p,c]]        128-lane row gather + one-hot
                                            (the dense_blocks halo trick)
  prolong    z_p     += Φ_p zg[p]           batched MXU einsum

Φ itself is computed by the existing GDSWCoarseOperator (host setup:
interface classification, energy-minimal harmonic extensions, RAP); this
module only re-lays it out per cluster.  No scalar gathers or scatters
appear anywhere in the apply — XLA lowers those to ~6-15 ns/element serial
loops on TPU, which would dominate at any problem size.

Reference: two-level additive Schwarz apply, SURVEY.md §3.5 step 3;
FROSch GDSWCoarseOperator + 'TwoLevel' (parametersPrec.xml).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sps

_LANES = 128


def _round_up(x, m):
    return ((x + m - 1) // m) * m


class PaddedClusterCoarse:
    """GDSW coarse level re-laid out over the padded clusters of a
    DenseBlockSpMV; apply acts on padded vectors [P*R].

    `store_dtype=jnp.bfloat16` stores Φ blocks and A₀⁻¹ in bf16 with f32
    MXU accumulation — the coarse analog of the level-1 bf16 store
    (measured v5e, nc=2863: 101 → 68 us/apply; the f64 outer refinement
    absorbs the perturbation)."""

    def __init__(self, phi: sps.csr_matrix, A0_inv, db, dtype=jnp.float32,
                 store_dtype=None):
        phi = phi.tocsr()
        n, nc = phi.shape
        P, R = db.P, db.R
        old_of_pad = np.asarray(db.old_of_pad)  # [P*R] -> old id (pad -> n)
        self.P, self.R, self.nc = P, R, nc

        # per-cluster coarse support and dense Φ blocks [P, c, R] —
        # vectorized over all clusters at once (a per-cluster scipy
        # row-slice loop costs ~10 s at P=256; this is <0.5 s)
        valid_pad = np.flatnonzero(old_of_pad < n)
        sub = phi[old_of_pad[valid_pad]].tocoo()
        vr = valid_pad[sub.row]                  # padded id per entry
        pcl = vr // R
        r_loc = vr - pcl * R
        key = pcl.astype(np.int64) * nc + sub.col
        uk, inv = np.unique(key, return_inverse=True)
        up = (uk // nc).astype(np.int64)
        ucol = (uk % nc).astype(np.int64)
        counts = np.bincount(up, minlength=P)
        c = _round_up(max(int(counts.max()) if len(counts) else 1, 1), 8)
        gstart = np.concatenate([[0], np.cumsum(counts)])
        local_c = np.arange(len(uk)) - gstart[up]
        coarse_idx = np.full((P, c), nc, np.int64)  # pad -> slot nc
        coarse_idx[up, local_c] = ucol
        phi_blocks = np.zeros((P, c, R), np.float64)
        phi_blocks[pcl, local_c[inv], r_loc] = sub.data
        self.c = c
        self.store_dtype = store_dtype or dtype
        self.phi_blocks = jnp.asarray(phi_blocks, self.store_dtype)

        # 0/1 plan matrix S [nc, P*c]: rc = S @ q.ravel()
        pp, cc = np.nonzero(coarse_idx < nc)
        plan = sps.csr_matrix(
            (np.ones(len(pp), np.float32),
             (coarse_idx[pp, cc], pp * c + cc)), shape=(nc, P * c))
        from feddlib_tpu.la.sell import SellMatrix

        self.plan = SellMatrix.from_csr(plan, dtype=dtype)
        self.A0_inv = jnp.asarray(A0_inv, self.store_dtype)

        # spread: zc gather as 128-lane row reads + one-hot lane extraction
        ncp = _round_up(nc + 1, _LANES)          # slot nc = zero pad
        self.nc_pad = ncp
        self.idx_rows = jnp.asarray((coarse_idx // _LANES).astype(np.int32))
        onehot = np.zeros((P, c, _LANES), np.float32)
        onehot[pp, cc, (coarse_idx[pp, cc] % _LANES)] = 1.0
        self.onehot = jnp.asarray(onehot, dtype)

    def operands(self):
        plan_fn, plan_ops = self.plan.operator()
        return (self.phi_blocks, plan_ops, self.A0_inv, self.idx_rows,
                self.onehot)

    def operator(self):
        """(pure_fn, operands) on padded vectors; static layout closed
        over."""
        P, R, nc, nc_pad = self.P, self.R, self.nc, self.nc_pad
        plan_fn, _ = self.plan.operator()

        def fn(ops, rp):
            phi_b, plan_ops, A0_inv, idx_rows, onehot = ops
            # low-precision stores accumulate in the VECTOR dtype on the
            # MXU (bf16 Φ/A₀⁻¹ inputs, f32 outputs)
            q = jnp.einsum("pcr,pr->pc", phi_b,
                           rp.reshape(P, R).astype(phi_b.dtype),
                           preferred_element_type=rp.dtype)
            rc = plan_fn(plan_ops, q.reshape(-1))
            zc = jnp.einsum("ij,j->i", A0_inv, rc.astype(A0_inv.dtype),
                            preferred_element_type=rp.dtype)
            z2 = jnp.zeros(nc_pad, zc.dtype).at[:nc].set(zc).reshape(
                -1, _LANES)
            rows = z2[idx_rows]                     # [P, c, 128]
            zg = jnp.einsum("pcl,pcl->pc", rows, onehot.astype(zc.dtype))
            z = jnp.einsum("pcr,pc->pr", phi_b, zg.astype(phi_b.dtype),
                           preferred_element_type=rp.dtype)
            return z.reshape(-1)

        return fn, self.operands()


class PaddedTwoLevelSchwarz:
    """Additive two-level Schwarz on padded vectors: restricted
    dense-block level 1 + PaddedClusterCoarse GDSW level.  Built from the
    global matrix, the mesh partition and the DenseBlockSpMV layout."""

    def __init__(self, A, part, db, dofs_per_node: int = 1,
                 null_space: str = "laplace", variant: str = "GDSW",
                 dirichlet_mask=None, dtype=jnp.float32,
                 dof_map=None, level_combination: str = "Multiplicative",
                 A_padded_op=None, l1_store_dtype=None,
                 coarse_store_dtype=None):
        """l1_store_dtype=jnp.bfloat16 halves the level-1 inverse's HBM
        stream (the dominant bytes of the whole apply) with f32 MXU
        accumulation; the f32 multiplicative coarse level compensates the
        perturbation (unlike one-level bf16, which caps IR contraction —
        la/dense_blocks.DenseBlockSchwarz docstring)."""
        from feddlib_tpu.la.dense_blocks import DenseBlockSchwarz
        from feddlib_tpu.precond.gdsw import GDSWCoarseOperator

        if level_combination not in ("Additive", "Multiplicative"):
            raise ValueError(f"unknown level combination "
                             f"{level_combination!r}")
        self.level_combination = level_combination
        if level_combination == "Multiplicative":
            if A_padded_op is None:
                from feddlib_tpu.la.sell import sell_padded_from

                A_padded_op = sell_padded_from(A, db, dtype=dtype).operator()
            self.A_op = A_padded_op
        else:
            self.A_op = None
        import time as _time

        t0 = _time.perf_counter()
        self.level1 = DenseBlockSchwarz(A, db, dtype=dtype,
                                        store_dtype=l1_store_dtype)
        import jax as _jax

        _jax.block_until_ready(self.level1.inv)
        t1 = _time.perf_counter()
        node_sets = [np.asarray(ix)
                     for ix in part.repeated_map.partition_indices]
        umap = part.unique_map if dof_map is None else dof_map
        co = GDSWCoarseOperator(
            A, umap, node_part_sets=node_sets,
            points=part.mesh.points, dofs_per_node=dofs_per_node,
            null_space=null_space, dirichlet_mask=dirichlet_mask,
            variant=variant, dtype=jnp.float64)
        t2 = _time.perf_counter()
        # A0^-1 on DEVICE for accelerator backends: ship the SPARSE A0
        # (~nnz(A0) values instead of nc^2), densify + invert on chip —
        # the host O(nc^3) LAPACK inverse was seconds of setup on
        # few-core hosts; the coarse solve is preconditioner-only and the
        # outer f64 refinement absorbs the f32 inverse
        if jax.default_backend() != "cpu":
            A0s = co.A0_sparse().tocoo()
            ncc = co.n_coarse
            dense = (jnp.zeros((ncc, ncc), jnp.float32)
                     .at[jnp.asarray(A0s.row), jnp.asarray(A0s.col)]
                     .set(jnp.asarray(A0s.data, jnp.float32)))
            A0_inv = jnp.linalg.inv(dense)
        else:
            A0_inv = np.asarray(co.A0_inv)
        self.coarse = PaddedClusterCoarse(co.phi.to_scipy(),
                                          A0_inv, db,
                                          dtype=dtype,
                                          store_dtype=coarse_store_dtype)
        t3 = _time.perf_counter()
        self.timings = {"level1_s": t1 - t0, "gdsw_s": t2 - t1,
                        "coarse_layout_s": t3 - t2}
        self.n_coarse = self.coarse.nc

    def padded_operator(self):
        l1_fn, l1_ops = self.level1.padded_operator()
        c_fn, c_ops = self.coarse.operator()
        if self.level_combination == "Multiplicative":
            # z = z1 + Φ A0⁻¹ Φᵀ (r − A z1): one extra padded SpMV, fewer
            # Krylov iterations (FROSch 'Level Combination')
            A_fn, A_ops = self.A_op

            def fn_mult(ops, rp):
                l1_o, c_o, A_o = ops
                z1 = l1_fn(l1_o, rp)
                return z1 + c_fn(c_o, rp - A_fn(A_o, z1))

            return fn_mult, (l1_ops, c_ops, A_ops)

        def fn(ops, rp):
            l1_o, c_o = ops
            return l1_fn(l1_o, rp) + c_fn(c_o, rp)

        return fn, (l1_ops, c_ops)
