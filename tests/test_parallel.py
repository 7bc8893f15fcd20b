"""Distributed (shard_map) linear algebra tests on the 8-device virtual CPU
mesh — the analog of the reference's NUM_MPI_PROCS 2-8 CTest runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.mesh.partition import MeshPartition, partition_elements
from feddlib_tpu.parallel.spmd import (
    DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
from feddlib_tpu.parallel.solve import DistributedSolver
from feddlib_tpu.solvers.krylov import cg


@pytest.fixture(scope="module")
def poisson():
    dom = Domain.structured(2, 12)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    ref = cg(Kb.matvec, bb, tol=1e-10, maxiter=2000)
    return dom, Kb, bb, ref


def test_partition_balance_and_coverage():
    dom = Domain.structured(2, 10)
    part = MeshPartition(dom.mesh, 4)
    sizes = part.element_map.local_sizes
    assert sizes.sum() == dom.n_elements
    assert sizes.max() - sizes.min() <= 1
    assert part.unique_map.is_unique()
    # every node appears in some repeated set
    assert part.repeated_map.build_unique_map().is_unique()
    # determinism
    p2 = partition_elements(dom.mesh, 4)
    np.testing.assert_array_equal(part.elem_part, p2)


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_distributed_matvec(poisson, n_parts):
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, n_parts)
    dmat = DistributedCsr(Kb, part.unique_map)
    axis = DeviceAxis.make(n_parts)
    solver = DistributedSolver(dmat, axis)
    rng = np.random.default_rng(0)
    xg = rng.standard_normal(dom.n_nodes)
    x_dist = distribute_vector(xg, part.unique_map, dmat.plan.N_o)

    from jax.sharding import PartitionSpec as P

    from feddlib_tpu.parallel.spmd import AXIS

    imp = dmat.plan.importer()

    def prog(x_own, ed, ec, halo):
        x_own, ed, ec = x_own[0], ed[0], ec[0]
        hi = jax.tree.map(lambda a: a[0], halo)
        x_col = imp(x_own, hi)
        return jnp.sum(ed * x_col[ec], axis=0)[None]

    f = jax.jit(axis.shard_map(prog, (P(AXIS),) * 4, P(AXIS)))
    y = f(x_dist, dmat.ell_data, dmat.ell_cols, dmat.plan.import_arrays)
    y_ref = np.asarray(Kb.matvec(jnp.asarray(xg)))
    np.testing.assert_allclose(collect_vector(y, part.unique_map), y_ref,
                               atol=1e-12)


@pytest.mark.parametrize("n_parts", [2, 4])
def test_distributed_cg_matches_serial(poisson, n_parts):
    """Iterates are rank-count invariant (M1 acceptance, SURVEY.md §7)."""
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, n_parts)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(n_parts))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map, dmat.plan.N_o)
    x, it, rel = solver.solve(b_dist, method="cg", tol=1e-10, maxiter=2000)
    assert it == ref.iters
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-12)


def test_distributed_gmres(poisson):
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, 4)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(4))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map, dmat.plan.N_o)
    x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-10, maxiter=500,
                              restart=60)
    assert rel <= 1e-10
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-8)


def test_distributed_cg_jacobi(poisson):
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, 4)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(4))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map, dmat.plan.N_o)
    x, it, rel = solver.solve(b_dist, method="cg", tol=1e-10, maxiter=2000,
                              precond="jacobi")
    assert rel <= 1e-10
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-9)


def test_distributed_assembly_matches_serial():
    """Per-device element assembly + ghost-row export reproduces the serial
    CSR data exactly (the Tpetra export/fillComplete analog)."""
    from feddlib_tpu.parallel.assembly import DistributedAssembly

    dom = Domain.structured(2, 10)
    part = MeshPartition(dom.mesh, 4)
    da = DistributedAssembly(part, dofs_per_node=1)
    axis = DeviceAxis.make(4)
    data = np.asarray(da.assemble_laplace(axis))
    K = ops.assemble_laplace(dom)
    ref = da.reference_local_data(np.asarray(K.data))
    np.testing.assert_allclose(data, ref, atol=1e-12)


def test_multihost_single_process_fallback():
    """multihost helpers degrade to the local device list in a single
    process (the N-host path differs only by jax.distributed.initialize)."""
    import jax

    from feddlib_tpu.parallel import multihost

    assert not multihost.is_multiprocess()
    axis = multihost.global_device_axis(4)
    assert axis.n_dev == 4
    lo, hi = multihost.process_local_slice(axis)
    assert (lo, hi) == (0, 4)  # all partitions are process-local


def test_halo_exchange_is_neighbor_wise(poisson):
    """The ppermute schedule moves O(local cut) elements per device, not
    O(n_dev * boundary) as the all_gather fallback would (SURVEY §2.9:
    neighbor-wise exchange).  On a 2D strip partition the neighbor graph
    has bounded degree, so volume must not scale with device count."""
    dom, Kb, bb, ref = poisson
    stats = {}
    for n_parts in (2, 8):
        part = MeshPartition(dom.mesh, n_parts)
        dmat = DistributedCsr(Kb, part.unique_map)
        stats[n_parts] = dmat.plan.comm_stats()
    # all_gather volume grows ~linearly with device count...
    assert stats[8]["allgather_elems"] > 2.5 * stats[2]["allgather_elems"]
    # ...the ppermute schedule stays bounded by the local cut
    assert stats[8]["ppermute_elems"] < 2.0 * stats[2]["ppermute_elems"]
    assert (stats[8]["ppermute_elems"]
            < 0.5 * stats[8]["allgather_elems"])
    # rounds = neighbor-graph edge coloring, bounded by max degree + 1
    assert stats[8]["rounds"] <= 8
