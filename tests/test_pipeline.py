"""Device-resident distributed assembly→solve pipeline tests: values and
iterates must match the serial path WITHOUT any global matrix being formed
(reference flow: rank-local assembly + Tpetra Export, FE_def.hpp:637-665)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockMatrix
from feddlib_tpu.mesh.partition import MeshPartition
from feddlib_tpu.parallel.pipeline import DistributedPipeline
from feddlib_tpu.parallel.solve import DistributedSolver
from feddlib_tpu.parallel.spmd import DeviceAxis, DistributedCsr


def _matvec_dist(dmat, pipe, xg):
    """Global x → global A@x through the distributed operator."""
    import jax
    from jax.sharding import PartitionSpec as P

    from feddlib_tpu.parallel.spmd import AXIS

    axis = pipe.axis
    imp = dmat.plan.importer()

    def prog(x, ed, ec, halo):
        x, ed, ec = x[0], ed[0], ec[0]
        h = jax.tree.map(lambda a: a[0], halo)
        x_col = imp(x, h)
        return jnp.sum(ed * x_col[ec], axis=0)[None]

    f = jax.jit(axis.shard_map(prog, (P(AXIS),) * 4, P(AXIS)))
    xd = pipe.distribute(xg)
    yd = f(xd, dmat.ell_data, dmat.ell_cols, dmat.plan.import_arrays)
    return pipe.collect(yd)


@pytest.mark.parametrize("n_parts", [4, 8])
def test_pipeline_laplace_matches_serial(n_parts):
    dom = Domain.structured(2, 12)
    K = ops.assemble_laplace(dom)  # serial reference
    part = MeshPartition(dom.mesh, n_parts)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize(DeviceAxis.make(n_parts))
    dmat = pipe.assemble()
    rng = np.random.default_rng(3)
    xg = rng.standard_normal(dom.n_nodes)
    y_pipe = _matvec_dist(dmat, pipe, xg)
    y_ref = np.asarray(K.matvec(jnp.asarray(xg)))
    np.testing.assert_allclose(y_pipe, y_ref, rtol=1e-12, atol=1e-12)
    # the per-device ELL layout must equal the from-global construction
    dref = DistributedCsr(K, part.unique_map)
    np.testing.assert_allclose(np.asarray(dmat.ell_data),
                               np.asarray(dref.ell_data), atol=1e-12)


def test_pipeline_dirichlet_and_solve():
    dom = Domain.structured(2, 12)
    n_parts = 4
    # serial path
    K = ops.assemble_laplace(dom)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    mask = np.asarray(bcb.dirichlet_mask(0, dom.n_nodes))
    # row-eliminated serial matrix (same semantics as apply_dirichlet)
    sp = K.to_scipy().tolil()
    g = np.zeros(dom.n_nodes)
    for i in np.nonzero(mask)[0]:
        sp.rows[i] = [i]
        sp.data[i] = [1.0]
    A_ref = sp.tocsr()
    b_ref = np.where(mask, g, np.asarray(b))
    import scipy.sparse.linalg as spla

    x_ref = spla.spsolve(A_ref, b_ref)

    part = MeshPartition(dom.mesh, n_parts)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize(DeviceAxis.make(n_parts))
    dmat = pipe.assemble()
    rhs = pipe.assemble_rhs({0: lambda x: 1.0 + 0 * x[0]})
    np.testing.assert_allclose(pipe.collect(rhs), np.asarray(b), atol=1e-12)
    dmat, rhs = pipe.apply_dirichlet(dmat, rhs, mask, g)
    solver = DistributedSolver(dmat, pipe.axis)
    x, iters, rel = solver.solve(rhs, method="gmres", tol=1e-10,
                                 precond="jacobi")
    assert rel < 1e-9
    np.testing.assert_allclose(pipe.collect(x), x_ref, atol=1e-7)


@pytest.mark.parametrize("fe_u,fe_p", [("P2", "P1"), ("P1", "P1")])
def test_pipeline_stokes_matches_serial(fe_u, fe_p):
    dom_p1 = Domain.structured(2, 6)
    dom_u = dom_p1.p2_domain() if fe_u == "P2" else dom_p1
    dom_p = dom_p1
    dim = 2
    # serial merged system
    A = ops.assemble_laplace_vec(dom_u, 1.0)
    B, BT = ops.assemble_divergence(dom_u, dom_p)
    sizes = [dom_u.n_dofs(dim), dom_p.n_dofs(1)]
    sys = BlockMatrix(sizes)
    sys.add_block(0, 0, A)
    sys.add_block(0, 1, BT)
    sys.add_block(1, 0, B)
    if fe_u == fe_p:
        sys.add_block(1, 1, ops.assemble_bd_stabilization(dom_p))
    merged = sys.merge()

    part = MeshPartition(dom_p1.mesh, 4)
    pipe = DistributedPipeline(part, [(dom_u, dim), (dom_p, 1)])
    pipe.add_block(0, 0, "laplace_vec", viscosity=1.0)
    pipe.add_block(0, 1, "divergence_T")
    pipe.add_block(1, 0, "divergence")
    if fe_u == fe_p:
        pipe.add_block(1, 1, "bd_stab")
    pipe.finalize(DeviceAxis.make(4))
    dmat = pipe.assemble()
    rng = np.random.default_rng(5)
    xg = rng.standard_normal(sum(sizes))
    y_pipe = _matvec_dist(dmat, pipe, xg)
    y_ref = np.asarray(merged.matvec(jnp.asarray(xg)))
    np.testing.assert_allclose(y_pipe, y_ref, rtol=1e-11, atol=1e-11)


def test_pipeline_navier_stokes_advection():
    """Solution-dependent blocks N(u), W(u) assembled through the field halo
    match the serial reassembly."""
    dom_p1 = Domain.structured(2, 5)
    dom_u = dom_p1.p2_domain()
    dom_p = dom_p1
    dim = 2
    sizes = [dom_u.n_dofs(dim), dom_p.n_dofs(1)]
    rng = np.random.default_rng(7)
    u = rng.standard_normal(sizes[0])

    A = ops.assemble_laplace_vec(dom_u, 0.01)
    N = ops.assemble_advection(dom_u, jnp.asarray(u))
    W = ops.assemble_advection_in_u(dom_u, jnp.asarray(u))
    B, BT = ops.assemble_divergence(dom_u, dom_p)
    sys = BlockMatrix(sizes)
    sys.add_block(0, 0, A.add(N).add(W))
    sys.add_block(0, 1, BT)
    sys.add_block(1, 0, B)
    merged = sys.merge()

    part = MeshPartition(dom_p1.mesh, 4)
    pipe = DistributedPipeline(part, [(dom_u, dim), (dom_p, 1)])
    pipe.add_block(0, 0, "laplace_vec", viscosity=0.01)
    pipe.add_block(0, 0, "advection")
    pipe.add_block(0, 0, "advection_in_u")
    pipe.add_block(0, 1, "divergence_T")
    pipe.add_block(1, 0, "divergence")
    pipe.finalize(DeviceAxis.make(4))
    xfull = np.concatenate([u, np.zeros(sizes[1])])
    dmat = pipe.assemble(x=pipe.distribute(xfull))
    xg = rng.standard_normal(sum(sizes))
    y_pipe = _matvec_dist(dmat, pipe, xg)
    y_ref = np.asarray(merged.matvec(jnp.asarray(xg)))
    np.testing.assert_allclose(y_pipe, y_ref, rtol=1e-10, atol=1e-10)
