from feddlib_tpu.la.map import IndexMap
from feddlib_tpu.la.csr import CsrMatrix, SparsityPattern
from feddlib_tpu.la.block import BlockMatrix, BlockVector

__all__ = ["IndexMap", "CsrMatrix", "SparsityPattern", "BlockMatrix", "BlockVector"]
