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


def _robust_inverse(block: np.ndarray) -> np.ndarray:
    """Dense inverse with a regularized fallback: subdomain blocks of
    saddle-point systems (Stokes/NS) carry a local constant-pressure null
    space and are exactly singular — the reference's KLU factors them thanks
    to pivot perturbations; we shift the diagonal by ~machine-eps·‖A‖
    instead (preconditioner quality is unaffected)."""
    try:
        return np.linalg.inv(block)
    except np.linalg.LinAlgError:
        scale = np.abs(block).max() or 1.0
        for eps in (1e-12, 1e-10, 1e-8):
            try:
                return np.linalg.inv(block + eps * scale * np.eye(len(block)))
            except np.linalg.LinAlgError:
                continue
        return np.linalg.pinv(block)


class SchwarzPreconditioner:
    """One-level additive/restricted Schwarz built from a global matrix and
    a unique (owned) dof map."""

    def __init__(self, A: CsrMatrix, unique_map: IndexMap, overlap: int = 1,
                 combine: str = "Restricted", dtype=jnp.float64):
        if combine not in ("Restricted", "Full", "Averaging"):
            raise ValueError(f"unknown combine mode {combine!r}")
        self.combine = combine
        self.n = A.shape[0]
        self.n_parts = unique_map.n_parts
        sp = A.to_scipy()

        ov_sets: List[np.ndarray] = []
        for p in range(self.n_parts):
            owned = unique_map.partition_indices[p]
            ov = grow_overlap(sp, owned, overlap) if overlap > 0 else owned
            ov_sets.append(ov)
        self.ov_sets = ov_sets
        S = max(len(o) for o in ov_sets)
        self.S = S
        P_ = self.n_parts

        owner = unique_map.owner_of()
        ov_idx = np.full((P_, S), self.n, dtype=np.int64)  # pad → extra slot
        keep = np.zeros((P_, S), dtype=np.float64)
        mult = np.zeros(self.n, dtype=np.float64)
        inv = np.zeros((P_, S, S), dtype=np.float64)
        for p in range(P_):
            ov = ov_sets[p]
            k = len(ov)
            ov_idx[p, :k] = ov
            sub = sp[ov][:, ov].toarray()
            # identity padding keeps the dense factor well-posed
            block = np.eye(S)
            block[:k, :k] = sub
            inv[p] = _robust_inverse(block)
            if combine == "Restricted":
                keep[p, :k] = (owner[ov] == p).astype(np.float64)
            else:
                keep[p, :k] = 1.0
                mult[ov] += 1.0

        self.ov_idx = jnp.asarray(ov_idx)
        self.keep = jnp.asarray(keep, dtype)
        self.inv = jnp.asarray(inv, dtype)
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
        z_ov = jnp.einsum("pij,pj->pi", self.inv, r_ov)  # batched dense solve
        z_ov = z_ov * self.keep
        z = jnp.zeros(self.n + 1, r.dtype).at[self.ov_idx.reshape(-1)].add(
            z_ov.reshape(-1))[: self.n]
        if self.avg_scale is not None:
            z = z * self.avg_scale
        return z

    def __call__(self, r):
        return self.apply(r)


def make_distributed_schwarz(prec: SchwarzPreconditioner,
                             unique_map: IndexMap, N_o: int):
    """Package a SchwarzPreconditioner for the distributed solver: returns
    (build_fn, [stacked arrays]) for DistributedSolver.solve(precond=...).

    Per-device data: the local subdomain inverse [S, S], the overlap dofs in
    *column-map local* numbering of the SpMV halo plan (so the already
    imported x_col can be gathered — requires the SpMV ghost set to cover
    the overlap, true for overlap=1 with a mesh-graph matrix), and the keep
    mask + owned positions for the restricted combine."""
    P_ = prec.n_parts
    S = prec.S
    raise NotImplementedError(
        "distributed Schwarz lands with the two-level work; "
        "serial batched apply is the single-chip path")
