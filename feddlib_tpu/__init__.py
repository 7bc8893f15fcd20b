"""feddlib_tpu — a TPU-native finite-element and domain-decomposition framework.

A from-scratch rebuild of the capabilities of FEDDLib (C++/MPI/Trilinos) as an
idiomatic JAX/XLA/Pallas stack:

- host side (numpy/C++): mesh I/O + generation, graph partitioning, index maps,
  halo/communication plans, symbolic sparsity ("fillComplete"), config system,
  HDF5/XDMF export;
- device side (jit/shard_map/pallas): batched element assembly kernels with
  deterministic segment-sum scatter, ELL/CSR SpMV, Krylov solvers
  (CG / restarted GMRES) as lax.while_loop programs, overlapping-Schwarz
  preconditioners with batched subdomain solves and GDSW coarse spaces,
  Newton and time-stepping drivers.

The reference (surveyed in SURVEY.md) is f64 throughout
(feddlib/core/General/DefaultTypeDefs.hpp:6); we enable x64 at import so
solver tolerances (1e-8) are meaningful. Individual matrices/kernels may
opt into f32/bf16 for throughput.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from feddlib_tpu.utils.config import ParameterList, load_xml_parameters  # noqa: E402
from feddlib_tpu.la.map import IndexMap  # noqa: E402
from feddlib_tpu.la.csr import CsrMatrix  # noqa: E402
from feddlib_tpu.mesh.mesh import Mesh  # noqa: E402
from feddlib_tpu.fe.domain import Domain  # noqa: E402
from feddlib_tpu.bc import BCBuilder  # noqa: E402

__all__ = [
    "ParameterList",
    "load_xml_parameters",
    "IndexMap",
    "CsrMatrix",
    "Mesh",
    "Domain",
    "BCBuilder",
]
