import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, scipy.sparse as sps
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.bc import BCBuilder

dom = Domain.structured(3, 40)
K = ops.assemble_laplace(dom)
bcb = BCBuilder()
bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
Kb, bb = bcb.apply_symmetric(K, b, 0)
sp = Kb.to_scipy().tocsr()
sps.save_npz("/root/repo/.scratch/poisson40.npz", sp)
print("saved", sp.shape, sp.nnz)
