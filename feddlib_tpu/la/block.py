"""Block systems — BlockMatrix / BlockVector.

Reference: core/LinearAlgebra/BlockMatrix_decl.hpp:23,
BlockMultiVector.  Block (i,j)-indexed collection of CsrMatrix with a
blocked apply and a `merge()` that flattens into one monolithic CSR with
global block offsets (BlockMatrix_def.hpp:119 merge / :257 mergeBlockNew),
used by monolithic solvers/preconditioners.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.la.csr import CsrMatrix, SparsityPattern


class BlockVector:
    """List of per-block device vectors.

    A vector may carry a `_dist_mirror = (pipe, shards)` attachment — the
    same values as distributed owned shards [n_dev, N_o] of a
    DistributedPipeline's dof map.  Elementwise ops (axpy/scale/copy)
    propagate it, so Newton/time updates keep the device shards alive and
    the distributed solver never re-uploads the solution (the reference's
    u_rep_ update flow never leaves the process either,
    NavierStokes_decl.hpp:102).  Any direct block write invalidates it."""

    def __init__(self, blocks: List[jnp.ndarray]):
        self.blocks = [jnp.asarray(b) for b in blocks]
        self._dist_mirror = None

    @classmethod
    def zeros(cls, sizes, dtype=jnp.float64):
        return cls([jnp.zeros(s, dtype=dtype) for s in sizes])

    @property
    def sizes(self):
        return [b.shape[0] for b in self.blocks]

    def __getitem__(self, i):
        return self.blocks[i]

    def __setitem__(self, i, v):
        self.blocks[i] = jnp.asarray(v)
        self._dist_mirror = None  # host write → device shards stale

    def __len__(self):
        return len(self.blocks)

    def concat(self) -> jnp.ndarray:
        return jnp.concatenate(self.blocks)

    @classmethod
    def split(cls, flat: jnp.ndarray, sizes) -> "BlockVector":
        out, off = [], 0
        for s in sizes:
            out.append(flat[off : off + s])
            off += s
        return cls(out)

    def norm2(self) -> jnp.ndarray:
        return jnp.sqrt(sum(jnp.vdot(b, b) for b in self.blocks))

    def dot(self, other: "BlockVector") -> jnp.ndarray:
        return sum(jnp.vdot(a, b) for a, b in zip(self.blocks, other.blocks))

    def axpy(self, alpha, x: "BlockVector") -> "BlockVector":
        out = BlockVector([a + alpha * b
                           for a, b in zip(self.blocks, x.blocks)])
        ma, mb = self._dist_mirror, getattr(x, "_dist_mirror", None)
        if ma is not None and mb is not None and ma[0] is mb[0]:
            out._dist_mirror = (ma[0], ma[1] + alpha * mb[1])
        return out

    def scale(self, alpha) -> "BlockVector":
        out = BlockVector([alpha * b for b in self.blocks])
        if self._dist_mirror is not None:
            out._dist_mirror = (self._dist_mirror[0],
                                alpha * self._dist_mirror[1])
        return out

    def copy(self) -> "BlockVector":
        out = BlockVector(list(self.blocks))
        out._dist_mirror = self._dist_mirror
        return out


class BlockMatrix:
    """(i,j)-indexed sparse blocks over fixed block row/col sizes."""

    def __init__(self, row_sizes: List[int], col_sizes: Optional[List[int]] = None):
        self.row_sizes = list(row_sizes)
        self.col_sizes = list(col_sizes if col_sizes is not None else row_sizes)
        self.blocks: Dict[Tuple[int, int], CsrMatrix] = {}
        self._merged: Optional[CsrMatrix] = None

    @property
    def n_block_rows(self):
        return len(self.row_sizes)

    @property
    def n_block_cols(self):
        return len(self.col_sizes)

    def add_block(self, i: int, j: int, m: CsrMatrix) -> None:
        if m.shape != (self.row_sizes[i], self.col_sizes[j]):
            raise ValueError(
                f"block ({i},{j}) shape {m.shape} != "
                f"({self.row_sizes[i]},{self.col_sizes[j]})"
            )
        self.blocks[(i, j)] = m
        self._merged = None

    def get_block(self, i: int, j: int) -> Optional[CsrMatrix]:
        return self.blocks.get((i, j))

    def __contains__(self, ij):
        return ij in self.blocks

    def apply(self, x: BlockVector, coeffs=None) -> BlockVector:
        """Blocked SpMV; optional per-block coefficient table like the
        reference's apply with SmallMatrix coefficients
        (BlockMatrix_def.hpp:347,371)."""
        out = []
        for i in range(self.n_block_rows):
            acc = jnp.zeros(self.row_sizes[i], dtype=jnp.float64)
            for j in range(self.n_block_cols):
                m = self.blocks.get((i, j))
                if m is None:
                    continue
                c = 1.0 if coeffs is None else coeffs[i][j]
                if coeffs is not None and c == 0.0:
                    continue
                acc = acc + c * m.matvec(x[j])
            out.append(acc)
        return BlockVector(out)

    def merge(self) -> CsrMatrix:
        """Flatten to one monolithic CSR with global block offsets
        (reference: BlockMatrix::merge, BlockMatrix_def.hpp:119).  Memoized
        until a block changes — time loops merge once per lhs."""
        if self._merged is not None:
            return self._merged
        row_off = np.concatenate([[0], np.cumsum(self.row_sizes)])
        col_off = np.concatenate([[0], np.cumsum(self.col_sizes)])
        n_rows, n_cols = int(row_off[-1]), int(col_off[-1])
        rows_l, cols_l, vals_l = [], [], []
        for (i, j), m in sorted(self.blocks.items()):
            pat = m.pattern
            rows_l.append(pat.rows_of_slots() + row_off[i])
            cols_l.append(pat.indices + col_off[j])
            vals_l.append(m.data)
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)
        pat = SparsityPattern.from_coo(rows, cols, n_rows, n_cols)
        out = CsrMatrix(pat)
        out.assemble(jnp.concatenate(vals_l))
        self._merged = out
        return out

    def __repr__(self):
        return (f"BlockMatrix({self.n_block_rows}x{self.n_block_cols}, "
                f"blocks={sorted(self.blocks)})")
