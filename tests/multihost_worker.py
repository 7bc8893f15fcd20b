"""Worker process for the multi-host runtime test (tests/test_multihost.py).

Each process joins the jax.distributed runtime via
feddlib_tpu.parallel.multihost (the MPI role), contributes its local CPU
devices to the global DD axis, and runs the SAME replicated host setup +
distributed CG as the single-process path.  Iteration counts must equal the
serial solve — the rank-count-invariance invariant, now across processes.

Run as:  python multihost_worker.py <coordinator> <num_procs> <pid>
"""

import os
import sys

# 2 virtual CPU devices per process -> 4 global devices over 2 processes
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main():
    coordinator, num_procs, pid = (sys.argv[1], int(sys.argv[2]),
                                   int(sys.argv[3]))
    from feddlib_tpu.parallel import multihost

    multihost.initialize(coordinator=coordinator, num_processes=num_procs,
                         process_id=pid)
    assert multihost.is_multiprocess()
    assert jax.process_count() == num_procs
    n_dev = jax.device_count()
    assert n_dev == 2 * num_procs, n_dev

    import numpy as np  # noqa: E402

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.fe.host_assembly import host_poisson_dirichlet
    from feddlib_tpu.la.csr import CsrMatrix
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import DistributedCsr, distribute_vector
    from feddlib_tpu.solvers.krylov import cg

    # replicated host setup — identical on every process (the reference's
    # 'every rank reads the whole mesh', MeshPartitioner_def.hpp:258)
    dom = Domain.structured(2, 12)
    Kb_sp, bb = host_poisson_dirichlet(dom)
    Kb = CsrMatrix.from_scipy(Kb_sp)
    ref = cg(Kb.matvec, jax.numpy.asarray(bb), tol=1e-10, maxiter=2000)

    part = MeshPartition(dom.mesh, n_dev)
    dmat = DistributedCsr(Kb, part.unique_map)
    axis = multihost.global_device_axis(n_dev)
    lo, hi = multihost.process_local_slice(axis)
    assert 0 <= lo < hi <= n_dev

    solver = DistributedSolver(dmat, axis)
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    x, it, rel = solver.solve(b_dist, method="cg", tol=1e-10, maxiter=2000)
    print(f"MULTIHOST_RESULT pid={pid} procs={jax.process_count()} "
          f"devices={n_dev} iters={it} serial_iters={ref.iters} "
          f"relres={rel:.3e}", flush=True)
    assert it == ref.iters, (it, ref.iters)
    assert rel <= 1e-10

    # ---- production stack across the process boundary: device-resident
    # pipeline assembly (ppermute contribution exchange) + two-level GDSW
    # GMRES — the reference's full-stack NUM_MPI_PROCS CTests
    # (SURVEY.md §4); iteration count must equal the serial two-level
    # solve (rank-count invariance, now across OS processes)
    import jax.numpy as jnp  # noqa: E402

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.parallel.pipeline import DistributedPipeline
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz, distributed_two_level
    from feddlib_tpu.solvers.krylov import gmres

    dom2 = Domain.structured(2, 16)
    part2 = MeshPartition(dom2.mesh, n_dev)
    pipe = DistributedPipeline(part2, [(dom2, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize(axis)
    dmat2 = pipe.assemble()
    rhs2 = pipe.assemble_rhs({0: lambda x: 1.0 + 0 * x[0]})
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom2, "Dirichlet", 1)
    dmask = np.asarray(bcb.dirichlet_mask(0, dom2.n_nodes))
    dmat2, rhs2 = pipe.apply_dirichlet(dmat2, rhs2, dmask,
                                       np.zeros(dom2.n_nodes))
    build, arrs = distributed_two_level(dmat2, part2, dom2.mesh.points, 1,
                                        dirichlet_mask=dmask)
    solver2 = DistributedSolver(dmat2, axis)
    x2, it2, rel2 = solver2.solve(rhs2, method="gmres", tol=1e-8,
                                  maxiter=300, precond=(build, arrs))
    # serial oracle with the SAME rows-only BC elimination
    K2 = bcb.apply_to_matrix(ops.assemble_laplace(dom2), 0)
    b2 = ops.assemble_rhs(dom2, lambda x: 1.0 + 0 * x[0])
    b2 = jnp.where(jnp.asarray(dmask), 0.0, b2)
    tls = TwoLevelSchwarz(K2, part2.unique_map,
                          part2.repeated_map.partition_indices,
                          dom2.mesh.points, 1, overlap=1,
                          dirichlet_mask=dmask)
    ref2 = gmres(K2.matvec, b2, M=tls.apply, tol=1e-8, maxiter=300)
    print(f"MULTIHOST_PIPELINE pid={pid} iters={it2} "
          f"serial_iters={ref2.iters} relres={rel2:.3e}", flush=True)
    assert rel2 <= 1e-8
    assert it2 == ref2.iters, (it2, ref2.iters)


if __name__ == "__main__":
    main()
