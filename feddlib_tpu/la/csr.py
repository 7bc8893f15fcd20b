"""Sparse matrix with host-symbolic structure and device-resident values.

Replaces the reference's Tpetra CrsMatrix facade
(core/LinearAlgebra/Matrix_decl.hpp:29).  The reference's dynamic
insertGlobalValues → fillComplete flow becomes:

1. *Symbolic phase* (host, once): dedupe COO (row, col) pairs → CSR pattern
   + an assembly plan mapping every raw COO contribution to its slot
   (`SparsityPattern.from_coo`).  This is the fillComplete analog — static,
   deterministic, reusable across reassemblies (Newton, time steps).
2. *Numeric phase* (device, per assembly): `segment_sum(values, slots)` —
   deterministic scatter-add, jittable, TPU-friendly.

Device apply format is padded ELL: row-padded column/value planes so SpMV is
a dense gather + row reduction the TPU executes at HBM bandwidth:
    y[i] = sum_k  ell_data[i, k] * x[ell_cols[i, k]]
Padding columns point at row 0 with value 0.  A Pallas SpMV kernel can slot
in behind `matvec` without changing callers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

_LANE = 8  # pad ELL width to a multiple of this

# symbolic-union cache for CsrMatrix.add across reassemblies:
# (id(patA), id(patB)) → (patA, patB, union pattern)
_union_pattern_cache: dict = {}


def _trace_state_clean() -> bool:
    try:
        from jax.core import trace_state_clean

        return trace_state_clean()
    except ImportError:
        try:
            from jax._src.core import trace_state_clean

            return trace_state_clean()
        except ImportError:
            return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass(frozen=True)
class SparsityPattern:
    """Host-side symbolic CSR structure + COO→slot assembly plan."""

    n_rows: int
    n_cols: int
    indptr: np.ndarray  # [n_rows+1] int64
    indices: np.ndarray  # [nnz] int64, sorted within each row
    coo_slots: Optional[np.ndarray] = None  # [n_raw_coo] slot of each raw entry

    @property
    def nnz(self) -> int:
        return len(self.indices)

    @classmethod
    def from_coo(cls, rows: np.ndarray, cols: np.ndarray,
                 n_rows: int, n_cols: int) -> "SparsityPattern":
        rows = np.asarray(rows, dtype=np.int64).ravel()
        cols = np.asarray(cols, dtype=np.int64).ravel()
        # native sort-based symbolic phase when available (C++, ~3x faster
        # than np.unique at FEM sizes); numpy fallback below is equivalent
        try:
            from feddlib_tpu import native

            out = native.coo_to_csr(rows, cols, n_rows, n_cols)
        except Exception:
            out = None
        if out is not None:
            indptr, indices, slots = out
            return cls(n_rows, n_cols, indptr, indices, coo_slots=slots)
        key = rows * n_cols + cols
        uniq, inv = np.unique(key, return_inverse=True)
        urows = uniq // n_cols
        ucols = uniq % n_cols
        indptr = np.zeros(n_rows + 1, dtype=np.int64)
        np.add.at(indptr, urows + 1, 1)
        np.cumsum(indptr, out=indptr)
        return cls(n_rows, n_cols, indptr, ucols, coo_slots=inv.astype(np.int64))

    @classmethod
    def from_csr(cls, indptr, indices, n_cols) -> "SparsityPattern":
        return cls(len(indptr) - 1, int(n_cols),
                   np.asarray(indptr, np.int64), np.asarray(indices, np.int64))

    def row_lengths(self) -> np.ndarray:
        return np.diff(self.indptr)

    def rows_of_slots(self) -> np.ndarray:
        return np.repeat(np.arange(self.n_rows, dtype=np.int64),
                         self.row_lengths())

    def duplication_plan(self):
        """(pos [n_raw] int32, Dp) — unique scatter target slot*Dp+dup for
        each raw COO contribution (dup = index among same-slot entries,
        Dp = max duplicates padded to 8 lanes).  Enables the exact
        scatter-SET + dense-reduce assembly (see assemble_csr_data_tri);
        None if the plan would overflow int32 or Dp is unreasonably wide."""
        cached = getattr(self, "_dup_plan", None)
        if cached is None:
            slots = self.coo_slots
            if slots is None:
                return None
            order = np.argsort(slots, kind="stable")
            ss = slots[order]
            starts = np.searchsorted(ss, np.arange(self.nnz))
            dup = np.empty(len(slots), np.int64)
            dup[order] = np.arange(len(slots)) - starts[ss]
            D = int(dup.max()) + 1 if len(dup) else 1
            Dp = 8 * ((D + 7) // 8)
            if Dp > 64 or self.nnz * Dp >= 2 ** 31:
                cached = (None, 0)
            else:
                pos = (slots * Dp + dup).astype(np.int32)
                cached = (jnp.asarray(pos), Dp)
            object.__setattr__(self, "_dup_plan", cached)
        return cached


class CsrMatrix:
    """Sparse matrix = static SparsityPattern + device value buffer.

    Values are canonically stored in CSR slot order (`data[k]` ↔
    `pattern.indices[k]`); the ELL gather plan for SpMV is derived lazily and
    cached on the pattern's shape.
    """

    def __init__(self, pattern: SparsityPattern, data=None,
                 dtype=jnp.float64):
        self.pattern = pattern
        self.dtype = dtype
        if data is None:
            data = jnp.zeros(pattern.nnz, dtype=dtype)
        self.data = jnp.asarray(data, dtype=dtype)
        self._ell = None  # (ell_cols [n_rows, K], slot_of [n_rows, K]) numpy
        self._ell_dev = None  # device-promoted copy (built outside traces)

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_coo(cls, rows, cols, vals, n_rows, n_cols, dtype=jnp.float64):
        pat = SparsityPattern.from_coo(rows, cols, n_rows, n_cols)
        m = cls(pat, dtype=dtype)
        m.assemble(jnp.asarray(vals, dtype=dtype))
        return m

    @classmethod
    def from_scipy(cls, sp, dtype=jnp.float64):
        sp = sp.tocsr()
        sp.sort_indices()
        pat = SparsityPattern.from_csr(sp.indptr, sp.indices, sp.shape[1])
        return cls(pat, data=jnp.asarray(sp.data, dtype=dtype), dtype=dtype)

    def to_scipy(self):
        import scipy.sparse as sps

        return sps.csr_matrix(
            (np.asarray(self.data), self.pattern.indices, self.pattern.indptr),
            shape=(self.pattern.n_rows, self.pattern.n_cols),
        )

    # -- assembly (numeric fillComplete) ------------------------------------
    def assemble(self, coo_vals: jnp.ndarray) -> None:
        """Sum raw COO contributions (in the order given to from_coo) into
        the CSR value buffer.  Deterministic.

        On accelerators with f64 values the scatter-add lowers to a ~48
        ns/element serial path; the fast route splits each value into
        three f32 parts (ulp-exact split), scatter-SETs them at unique
        precomputed positions (f32 scatters run ~5 ns/element) and reduces
        in f64 — ~4x faster, still deterministic (fixed summation order).
        CPU keeps the plain segment-sum."""
        slots = self.pattern.coo_slots
        if slots is None:
            raise ValueError("pattern has no COO assembly plan")
        vals = coo_vals.astype(self.dtype).ravel()
        if (jnp.dtype(self.dtype) == jnp.float64
                and jax.default_backend() != "cpu"):
            plan = self.pattern.duplication_plan()
            if plan is not None and plan[0] is not None:
                pos, Dp = plan
                self.data = assemble_csr_data_tri(vals, pos,
                                                  self.pattern.nnz, Dp)
                if _trace_state_clean():
                    self._ell_plan()
                return
        # int32 slot ids halve the upload over slow host→device links
        if self.pattern.nnz < 2 ** 31:
            slots = slots.astype(np.int32)
        self.data = assemble_csr_data(
            vals, jnp.asarray(slots), self.pattern.nnz
        )
        if _trace_state_clean():
            # eagerly build + device-promote the ELL plan so a later matvec
            # first invoked inside a jit trace doesn't bake the plan in as a
            # multi-MB constant (re-uploaded per call)
            self._ell_plan()

    # -- shape / properties -------------------------------------------------
    @property
    def shape(self):
        return (self.pattern.n_rows, self.pattern.n_cols)

    @property
    def nnz(self):
        return self.pattern.nnz

    # -- ELL plan -----------------------------------------------------------
    # TPU-native layout: the ELL planes are stored TRANSPOSED, [K, n_rows],
    # so the row index rides the 128-lane dimension and XLA's (8,128) tiling
    # pads only n_rows (negligible).  The naive [n_rows, K] layout pads K to
    # 128 lanes — an 4-16x memory blowup for FEM row widths (K=16..32).
    # SpMV is then K fused multiply-add+gather passes over [n_rows] vectors.
    def _ell_plan(self):
        if self._ell is None:
            pat = self.pattern
            lens = pat.row_lengths()
            K = max(int(lens.max()) if len(lens) else 1, 1)
            ell_cols = np.zeros((K, pat.n_rows), dtype=np.int32)
            slot_of = np.full((K, pat.n_rows), pat.nnz, dtype=np.int32)  # pad→extra 0
            pos = np.arange(pat.nnz) - np.repeat(pat.indptr[:-1], lens)
            r = pat.rows_of_slots()
            ell_cols[pos, r] = pat.indices.astype(np.int32)
            slot_of[pos, r] = np.arange(pat.nnz, dtype=np.int32)
            # cache as NUMPY: building device arrays lazily inside a jit
            # trace would leak tracers; numpy constants are trace-safe
            self._ell = (ell_cols, slot_of)
        if self._ell_dev is None and _trace_state_clean():
            # promote to device arrays once we are outside any trace, so
            # repeated matvecs don't re-transfer the plan
            self._ell_dev = tuple(jnp.asarray(a) for a in self._ell)
        return self._ell_dev if self._ell_dev is not None else self._ell

    def ell_arrays(self):
        """(ell_cols [K,n_rows], ell_data [K,n_rows]) — transposed ELL planes
        for external kernels."""
        ell_cols, slot_of = self._ell_plan()
        padded = jnp.concatenate([self.data, jnp.zeros(1, self.dtype)])
        return ell_cols, padded[slot_of]

    # -- operations ---------------------------------------------------------
    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        ell_cols, slot_of = self._ell_plan()
        return _ell_matvec(self.data, ell_cols, slot_of, x)

    def matmat(self, X: jnp.ndarray) -> jnp.ndarray:
        """Sparse × dense-block SpMM: X [n_cols, m] → [n_rows, m].
        Same K-pass ELL gather as matvec with a trailing block axis
        (device-side building block for the Galerkin RAP product)."""
        ell_cols, slot_of = self._ell_plan()
        return _ell_matmat(self.data, ell_cols, slot_of, X)

    def operator(self):
        """(pure_fn, operands) form for jit-argument solver programs
        (feddlib_tpu.solvers.krylov.solve_jit)."""
        ell_cols, slot_of = self._ell_plan()
        return ell_apply, (self.data, jnp.asarray(ell_cols),
                           jnp.asarray(slot_of))

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self) -> jnp.ndarray:
        pat = self.pattern
        r = pat.rows_of_slots()
        mask = pat.indices == r
        slot = np.full(pat.n_rows, pat.nnz, dtype=np.int64)
        slot[r[mask]] = np.nonzero(mask)[0]
        padded = jnp.concatenate([self.data, jnp.zeros(1, self.dtype)])
        return padded[jnp.asarray(slot)]

    def scale(self, alpha) -> "CsrMatrix":
        return CsrMatrix(self.pattern, self.data * alpha, self.dtype)

    def add(self, other: "CsrMatrix", alpha=1.0, beta=1.0) -> "CsrMatrix":
        """alpha*self + beta*other (reference: Matrix::addMatrix,
        Matrix_decl.hpp:126).  Same pattern → pure device add; otherwise
        the symbolic union is built on the host ONCE per pattern pair and
        cached (Newton/time loops call add with the same two patterns every
        reassembly — the numeric combine stays a pure device op)."""
        if other.pattern is self.pattern or (
            len(other.pattern.indices) == len(self.pattern.indices)
            and np.array_equal(other.pattern.indptr, self.pattern.indptr)
            and np.array_equal(other.pattern.indices, self.pattern.indices)
        ):
            return CsrMatrix(self.pattern,
                             alpha * self.data + beta * other.data, self.dtype)
        key = (id(self.pattern), id(other.pattern))
        ent = _union_pattern_cache.get(key)
        if (ent is None or ent[0] is not self.pattern
                or ent[1] is not other.pattern):
            rows = np.concatenate([self.pattern.rows_of_slots(),
                                   other.pattern.rows_of_slots()])
            cols = np.concatenate([self.pattern.indices,
                                   other.pattern.indices])
            pat = SparsityPattern.from_coo(rows, cols, *self.shape)
            # hold the operand patterns so the id() key stays valid
            ent = (self.pattern, other.pattern, pat)
            _union_pattern_cache[key] = ent
        m = CsrMatrix(ent[2], dtype=self.dtype)
        vals = jnp.concatenate([alpha * self.data, beta * other.data])
        m.assemble(vals)
        return m

    def transpose(self) -> "CsrMatrix":
        pat = self.pattern
        rows = pat.rows_of_slots()
        tpat = SparsityPattern.from_coo(pat.indices, rows,
                                        pat.n_cols, pat.n_rows)
        m = CsrMatrix(tpat, dtype=self.dtype)
        m.assemble(self.data)
        return m

    def write_matrix_market(self, path: str) -> None:
        """MatrixMarket dump (reference: Matrix::writeMM, Matrix_decl.hpp:124)."""
        import scipy.io as sio

        sio.mmwrite(path, self.to_scipy())

    def __repr__(self):
        return f"CsrMatrix({self.shape[0]}x{self.shape[1]}, nnz={self.nnz})"


@partial(jax.jit, static_argnames=("nnz",))
def assemble_csr_data(coo_vals, slots, nnz):
    return jax.ops.segment_sum(coo_vals.ravel(), slots,
                               num_segments=nnz, indices_are_sorted=False)


@partial(jax.jit, static_argnames=("nnz", "Dp"))
def assemble_csr_data_tri(coo_vals, pos, nnz, Dp):
    """Exact f64 assembly via three f32 scatter-SETs + f64 dense reduce.
    Split v = v1+v2+v3 (f32 parts) covers 72 mantissa bits ≥ f64's 53, so
    the value transport is ulp-exact; only the (deterministic) reduction
    order differs from segment_sum."""
    v = coo_vals
    v1 = v.astype(jnp.float32)
    r1 = v - v1.astype(jnp.float64)
    v2 = r1.astype(jnp.float32)
    v3 = (r1 - v2.astype(jnp.float64)).astype(jnp.float32)
    total = jnp.zeros(nnz, jnp.float64)
    for p in (v1, v2, v3):
        buf = jnp.zeros(nnz * Dp, jnp.float32).at[pos].set(
            p, unique_indices=True)
        total = total + buf.reshape(nnz, Dp).astype(jnp.float64).sum(axis=1)
    return total


@jax.jit
def _ell_matvec(data, ell_cols, slot_of, x):
    padded = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    vals = padded[slot_of]  # [K, n_rows]
    xg = x[ell_cols]  # [K, n_rows]
    return jnp.sum(vals * xg, axis=0)


@jax.jit
def _ell_matmat(data, ell_cols, slot_of, X):
    padded = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    vals = padded[slot_of]  # [K, n_rows]
    Xg = X[ell_cols]  # [K, n_rows, m]
    return jnp.sum(vals[:, :, None] * Xg, axis=0)


def ell_apply(ops, x):
    """Pure operator form: ops = (data, ell_cols [K,n], slot_of [K,n])."""
    data, ell_cols, slot_of = ops
    padded = jnp.concatenate([data, jnp.zeros(1, data.dtype)])
    return jnp.sum(padded[slot_of] * x[ell_cols], axis=0)
