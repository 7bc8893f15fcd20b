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


def test_distributed_overlap2_matches_serial():
    """Distributed Schwarz with overlap>1 (its own halo plan beyond the SpMV
    column map) reproduces the serial overlap-2 operator exactly."""
    from feddlib_tpu.parallel.spmd import distribute_vector, collect_vector
    from feddlib_tpu.precond.schwarz import (SchwarzPreconditioner,
                                             distributed_schwarz)
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    part = MeshPartition(dom.mesh, 8)
    for combine in ("Restricted", "Averaging"):
        sp = SchwarzPreconditioner(Kb, part.unique_map, overlap=2,
                                   combine=combine)
        ref = gmres(Kb.matvec, bb, M=sp.apply, tol=1e-8, maxiter=500)
        dmat = DistributedCsr(Kb, part.unique_map)
        solver = DistributedSolver(dmat, DeviceAxis.make(8))
        b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                                   dmat.plan.N_o)
        build, arrs = distributed_schwarz(dmat, overlap=2, combine=combine)
        x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8,
                                  maxiter=500, precond=(build, arrs))
        assert it == ref.iters, (combine, it, ref.iters)
        np.testing.assert_allclose(collect_vector(x, part.unique_map),
                                   np.asarray(ref.x), atol=1e-9)
        # overlap-2 must not iterate worse than overlap-1
        sp1 = SchwarzPreconditioner(Kb, part.unique_map, overlap=1,
                                    combine=combine)
        ref1 = gmres(Kb.matvec, bb, M=sp1.apply, tol=1e-8, maxiter=500)
        assert ref.iters <= ref1.iters


def test_pipeline_stokes_block_gdsw_distributed_matches_serial():
    """Stokes through the full device-resident chain (pipeline assembly →
    Dirichlet → monolithic block-GDSW two-level Schwarz) reproduces the
    serial monolithic preconditioner iteration-for-iteration."""
    import scipy.sparse as sps

    from feddlib_tpu.la.csr import CsrMatrix
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz, distributed_two_level
    from feddlib_tpu.solvers.krylov import gmres

    dom_p1 = Domain.structured(2, 8)
    dom_u = dom_p1.p2_domain()
    dim = 2
    n_u, n_p = dom_u.n_dofs(dim), dom_p1.n_dofs(1)
    part = MeshPartition(dom_p1.mesh, 4)
    pipe = DistributedPipeline(part, [(dom_u, dim), (dom_p1, 1)])
    pipe.add_block(0, 0, "stress", viscosity=1.0)
    pipe.add_block(0, 1, "divergence_T")
    pipe.add_block(1, 0, "divergence")
    pipe.finalize(DeviceAxis.make(4))
    dmat = pipe.assemble()
    # lid-driven cavity: u Dirichlet everywhere on the boundary, pin one p
    bnd = dom_u.mesh.point_flags > 0
    bmask = np.zeros(n_u + n_p, dtype=bool)
    bmask[0:n_u:2] = bnd
    bmask[1:n_u:2] = bnd
    bmask[n_u] = True
    g = np.zeros(n_u + n_p)
    lid = bnd & np.isclose(dom_u.mesh.points[:, 1], 1.0)
    g[0:n_u:2] = np.where(lid, 1.0, 0.0)
    rhs = jnp.zeros((4, pipe.N_o))
    dmat, rhs = pipe.apply_dirichlet(dmat, rhs, bmask, g)

    # serial reference: same merged matrix via scipy row elimination
    A = ops.assemble_stress(dom_u, 1.0)
    B, BT = ops.assemble_divergence(dom_u, dom_p1)
    sys = BlockMatrix([n_u, n_p])
    sys.add_block(0, 0, A)
    sys.add_block(0, 1, BT)
    sys.add_block(1, 0, B)
    sp = sys.merge().to_scipy().tolil()
    for i in np.nonzero(bmask)[0]:
        sp.rows[i] = [i]
        sp.data[i] = [1.0]
    A_ser = CsrMatrix.from_scipy(sp.tocsr())
    b_ser = np.where(bmask, g, 0.0)
    specs = pipe.block_specs()
    tls = TwoLevelSchwarz(A_ser, pipe.dof_map, blocks=specs,
                          dirichlet_mask=bmask)
    ref = gmres(A_ser.matvec, jnp.asarray(b_ser), M=tls.apply, tol=1e-8,
                maxiter=500)
    assert ref.converged

    build, arrs = distributed_two_level(dmat, dirichlet_mask=bmask,
                                        blocks=specs)
    solver = DistributedSolver(dmat, pipe.axis)
    x, it, rel = solver.solve(rhs, method="gmres", tol=1e-8, maxiter=500,
                              precond=(build, arrs))
    assert it == ref.iters  # distributed must reproduce serial exactly
    # both runs stop at relres 1e-8; the pressure block's conditioning
    # leaves O(1e-6) solution slack at that residual level
    xs, xr = pipe.collect(x), np.asarray(ref.x)
    np.testing.assert_allclose(xs[:n_u], xr[:n_u], atol=1e-7)
    np.testing.assert_allclose(xs[n_u:], xr[n_u:], atol=1e-4)


def test_use_device_pipeline_laplace():
    """'Use Device Pipeline': the standard Problem.solve() flow runs the
    device-resident assembly→solve chain and reproduces the plain
    distributed path's iterates."""
    from feddlib_tpu.problems.laplace import Laplace
    from feddlib_tpu.utils.config import ParameterList

    results = {}
    for pipe_on in (False, True):
        pl = ParameterList("P")
        for k, v in {"Use Distributed Solve": True, "Devices": 4,
                     "Use Device Pipeline": pipe_on,
                     "Preconditioner Type": "SchwarzTwoLevel",
                     "Overlap": 1, "Convergence Tolerance": 1e-9,
                     "Maximum Iterations": 500}.items():
            pl[k] = v
        dom = Domain.structured(2, 16)
        prob = Laplace(dom, 1, parameter_list=pl)
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.set_boundaries_rhs()
        iters = prob.solve()
        results[pipe_on] = (iters, np.asarray(prob.solution[0]))
    assert results[True][0] == results[False][0]
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-7)


def test_use_device_pipeline_navier_stokes_newton():
    """Full Newton on NS through the pipeline: reassembly is a device
    re-run with the new solution shards; iterates match the serial
    backend."""
    from feddlib_tpu.problems import NavierStokes
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver
    from feddlib_tpu.utils.config import ParameterList

    results = {}
    for backend in ("serial", "pipeline"):
        pl = ParameterList("P")
        opts = {"Viscosity": 0.05, "Density": 1.0,
                "Preconditioner Type": "SchwarzTwoLevel",
                "Subdomains": 4, "Convergence Tolerance": 1e-9,
                "Maximum Iterations": 2000,
                "relNonLinTol": 1e-8, "MaxNonLinIts": 12}
        if backend == "pipeline":
            opts.update({"Use Distributed Solve": True, "Devices": 4,
                         "Use Device Pipeline": True})
        for k, v in opts.items():
            pl[k] = v
        dom_p = Domain.structured(2, 6)
        dom_u = dom_p.p2_domain()
        prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
        prob.assemble()

        def lid(x, t):
            on_lid = jnp.isclose(x[1], 1.0)
            return jnp.where(on_lid, jnp.array([1.0, 0.0]), jnp.zeros(2))

        prob.add_bc(lid, 1, 0)
        solver = NonLinearSolver("Newton")
        its = solver.solve(prob)
        results[backend] = (its, np.asarray(prob.solution[0]))
        if backend == "pipeline":
            # the solution rides its device-shard mirror across Newton
            # steps: ONE solution upload total; the per-step uploads are
            # only the Newton RHS (host residual) — round-4 weak item 4
            pipe = prob._pipe_cache["pipe"]
            assert pipe.n_distributes == 1 + its, pipe.n_distributes
    assert results["pipeline"][0] == results["serial"][0]
    np.testing.assert_allclose(results["pipeline"][1],
                               results["serial"][1], atol=1e-6)


def test_device_rhs_volume_and_surface():
    """Device-resident RHS program (volume + Neumann surface loads,
    time-dependent) matches the serial assemblies at each t — per-step
    reassembly is a pure device re-run (FE_def.hpp:4511,4694)."""
    import jax.numpy as jnp
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.pipeline import DistributedPipeline
    from feddlib_tpu.parallel.spmd import collect_vector

    dom = Domain.structured(2, 8)
    part = MeshPartition(dom.mesh, 4)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize()

    def f(x, t):
        return jnp.sin(3.0 * x[0]) * (1.0 + t) + x[1]

    def g(x, t):
        return x[0] * (2.0 - t)

    pipe.add_rhs(0, f)
    pipe.add_surface_rhs(0, g, flag=1)
    for t in (0.0, 0.7):
        b_dev = collect_vector(pipe.assemble_rhs_device(t=t), pipe.dof_map)
        b_ref = np.asarray(ops.assemble_rhs(
            dom, lambda x, tt=t: f(x, tt)))
        b_ref = b_ref + np.asarray(ops.assemble_surface_rhs(
            dom, lambda x, tt=t: g(x, tt), flag=1))
        assert np.abs(b_dev - b_ref).max() < 1e-12 * max(
            np.abs(b_ref).max(), 1.0)


def test_device_rhs_vector_field():
    """Vector-valued volume source on a P2 velocity space."""
    import jax.numpy as jnp
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.pipeline import DistributedPipeline
    from feddlib_tpu.parallel.spmd import collect_vector

    dom_p1 = Domain.structured(2, 6)
    dom = dom_p1.p2_domain()
    part = MeshPartition(dom_p1.mesh, 4)
    pipe = DistributedPipeline(part, [(dom, 2)])
    pipe.add_block(0, 0, "laplace_vec")
    pipe.finalize()

    def f(x, t):
        return jnp.stack([x[0] + t, x[0] * x[1]])

    pipe.add_rhs(0, f)
    b_dev = collect_vector(pipe.assemble_rhs_device(t=0.3), pipe.dof_map)
    b_ref = np.asarray(ops.assemble_rhs(
        dom, lambda x: f(x, 0.3), dofs_per_node=2))
    assert np.abs(b_dev - b_ref).max() < 1e-12 * max(
        np.abs(b_ref).max(), 1.0)


@pytest.mark.parametrize("which", ["tpm", "geometry_scaled", "hyper"])
def test_problem_pipeline_blocks_match_serial(which):
    """TPM Biot / distance-scaled harmonic extension / hyperelastic
    tangent pipeline kinds reproduce the serial merged matrices entry for
    entry (FE_def.hpp:131,2225,6969 parity on the device pipeline)."""
    import scipy.sparse as sps
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.pipeline import DistributedPipeline

    if which == "tpm":
        from feddlib_tpu.problems.tpm import TPM

        dom_p1 = Domain.structured(2, 4)
        dom_u = dom_p1.p2_domain()
        prob = TPM(dom_u, dom_p1)
        base = dom_p1
    elif which == "geometry_scaled":
        from feddlib_tpu.problems.geometry import Geometry

        dom = Domain.structured(2, 6)
        rng = np.random.default_rng(0)
        dist = rng.random(dom.mesh.n_points) + 0.1
        prob = Geometry(dom, distances=dist)
        base = dom
    else:
        from feddlib_tpu.problems.nonlin_elasticity import NonLinElasticity

        dom = Domain.structured(2, 4)
        prob = NonLinElasticity(dom)
        base = dom
    prob.assemble()
    if which == "hyper":
        rng = np.random.default_rng(1)
        prob.solution[0] = jnp.asarray(
            0.02 * rng.standard_normal(prob.block_sizes()[0]))
        prob.reassemble("Newton")
    S = prob.system.merge().to_scipy().tocsr()

    part = MeshPartition(base.mesh, 4)
    pipe = DistributedPipeline(
        part, [(dom_, dofs_) for dom_, dofs_, _ in prob.variables])
    for i, j, kind, prm in prob.pipeline_blocks():
        pipe.add_block(i, j, kind, **prm)
    pipe.finalize()
    x = (pipe.distribute(np.asarray(prob.solution.concat()))
         if which == "hyper" else None)
    dmat = pipe.assemble(x=x)

    rows_l, cols_l, vals_l = [], [], []
    for p in range(dmat.n_dev):
        owned, R = dmat.local_rows(p)
        if len(owned):
            coo = R.tocoo()
            rows_l.append(owned[coo.row])
            cols_l.append(coo.col)
            vals_l.append(coo.data)
    D = sps.csr_matrix((np.concatenate(vals_l),
                        (np.concatenate(rows_l), np.concatenate(cols_l))),
                       shape=S.shape)
    assert abs(S - D).max() < 1e-10 * max(abs(S).max(), 1.0)


def test_unsteady_heat_distributed_device_rhs():
    """Implicit-Euler heat equation driven END-TO-END device-resident:
    matrix from the pipeline, the time-dependent source via
    assemble_rhs_device(t) (zero host sync per step), distributed CG —
    matches the serial implicit-Euler trajectory."""
    import jax.numpy as jnp
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.pipeline import DistributedPipeline
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import collect_vector, distribute_vector

    dom = Domain.structured(2, 8)
    n = dom.n_nodes
    dt = 0.05

    def f(x, t):
        return jnp.sin(2.0 * x[0]) * jnp.cos(1.0 + 3.0 * t)

    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    dmask = np.asarray(bcb.dirichlet_mask(0, n))

    # serial reference
    K = ops.assemble_laplace(dom)
    M = ops.assemble_mass(dom)
    A_ser = M.scale(1.0 / dt).add(K)
    import scipy.sparse.linalg as spla

    As = A_ser.to_scipy().tolil()
    As[dmask] = 0.0
    for i in np.flatnonzero(dmask):
        As[i, i] = 1.0
    As = As.tocsc()
    Ms = M.to_scipy()
    u_ser = np.zeros(n)
    for k in range(3):
        t = (k + 1) * dt
        b = np.asarray(ops.assemble_rhs(dom, lambda x, tt=t: f(x, tt)))
        rhs = Ms @ u_ser / dt + b
        rhs[dmask] = 0.0
        u_ser = spla.spsolve(As, rhs)

    # distributed: pipeline matrix + device RHS program per step
    part = MeshPartition(dom.mesh, 4)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.add_block(0, 0, "mass", coeff=1.0 / dt)
    pipe.add_rhs(0, f)
    pipe.finalize()
    dmat = pipe.assemble()
    dmat, _ = pipe.apply_dirichlet(dmat, None, dmask)
    solver = DistributedSolver(dmat, pipe.axis)

    # mass-matrix action for the history term, via a second pipeline
    pipeM = DistributedPipeline(part, [(dom, 1)])
    pipeM.add_block(0, 0, "mass", coeff=1.0 / dt)
    pipeM.finalize(pipe.axis)
    dM = pipeM.assemble()

    m_dist, _ = pipe.dirichlet_arrays(dmask)
    # DEVICE-RESIDENT time loop: the state stays as owned shards across
    # steps; zero host↔device vector traffic inside the loop (collect only
    # for the final assertion) — round-4 weak item 4
    u_dist = jnp.zeros((pipe.n_dev, dmat.plan.N_o))
    pipe.n_distributes = 0
    for k in range(3):
        t = (k + 1) * dt
        b_dev = pipe.assemble_rhs_device(t=t)  # compiled once, traced t
        # history term (M u)/dt as a distributed SpMV on the live shards
        b_tot = b_dev + _dist_matvec(dM, pipe, u_dist)
        b_tot = jnp.where(m_dist > 0, 0.0, b_tot)
        u_dist, it, rel = solver.solve(b_tot, method="cg", tol=1e-12,
                                       maxiter=2000)
    assert pipe.n_distributes == 0
    u = collect_vector(u_dist, pipe.dof_map)
    assert np.abs(u - u_ser).max() < 1e-8 * max(np.abs(u_ser).max(), 1.0)


def _dist_matvec(dmat, pipe, x_dist):
    """Distributed SpMV helper (shard_map one-shot)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from feddlib_tpu.parallel.spmd import AXIS, DistributedCsr

    imp = dmat.plan.importer()

    def prog(xo, ed, ec, himp):
        xo, ed, ec = xo[0], ed[0], ec[0]
        himp = jax.tree.map(lambda a: a[0], himp)
        return DistributedCsr.local_matvec(ed, ec, imp(xo, himp))[None]

    f = jax.jit(pipe.axis.shard_map(
        prog, (P(AXIS),) * 3 + (P(AXIS),), P(AXIS)))
    return f(x_dist, dmat.ell_data, dmat.ell_cols, dmat.plan.import_arrays)


def test_tpm_consolidation_device_pipeline_matches_serial():
    """TPM consolidation stepping with 'Use Device Pipeline': the Biot
    system assembles device-resident each solve; the trajectory matches
    the serial path."""
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems.tpm import TPM
    from feddlib_tpu.utils.config import ParameterList

    results = {}
    for pipe_on in (False, True):
        dom_p1 = Domain.structured(2, 4)
        dom_u = dom_p1.p2_domain()
        pl = ParameterList("P")
        opts = {"dt": 0.05, "Preconditioner Type": "SchwarzOneLevel",
                "Subdomains": 4, "Convergence Tolerance": 1e-10,
                "Maximum Iterations": 3000}
        if pipe_on:
            opts.update({"Use Distributed Solve": True, "Devices": 4,
                         "Use Device Pipeline": True})
        for k, v in opts.items():
            pl[k] = v
        prob = TPM(dom_u, dom_p1, parameter_list=pl)
        prob.assemble()
        # consolidation: load on top (flag 3), drained top, clamped bottom
        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
        prob.add_bc(lambda x, t: 0.0, 3, 1)
        prob.assemble_source(lambda x: jnp.array([0.0, -1.0]))
        prob.advance(t_end=0.1)
        results[pipe_on] = np.asarray(prob.solution.concat())
    assert np.abs(results[True] - results[False]).max() < 1e-6 * max(
        np.abs(results[False]).max(), 1.0)


def test_hyperelastic_newton_device_pipeline_matches_serial():
    """NonLinElasticity Newton with 'Use Device Pipeline': the consistent
    tangent assembles device-resident from the current iterate; the
    converged displacement matches the serial Newton."""
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems.nonlin_elasticity import NonLinElasticity
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver
    from feddlib_tpu.utils.config import ParameterList

    results = {}
    for pipe_on in (False, True):
        dom = Domain.structured(2, 4)
        pl = ParameterList("P")
        opts = {"E": 5.0, "Poisson Ratio": 0.3,
                "Material Model": "Neo-Hooke",
                "Preconditioner Type": "SchwarzOneLevel", "Subdomains": 4,
                "Convergence Tolerance": 1e-11,
                "Maximum Iterations": 3000,
                "relNonLinTol": 1e-9, "MaxNonLinIts": 15}
        if pipe_on:
            opts.update({"Use Distributed Solve": True, "Devices": 4,
                         "Use Device Pipeline": True})
        for k, v in opts.items():
            pl[k] = v
        prob = NonLinElasticity(dom, parameter_list=pl)
        prob.assemble()
        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
        prob.assemble_source(lambda x: jnp.array([0.0, -0.4]))
        solver = NonLinearSolver("Newton")
        solver.solve(prob)
        results[pipe_on] = np.asarray(prob.solution[0])
    assert np.abs(results[True] - results[False]).max() < 1e-6 * max(
        np.abs(results[False]).max(), 1.0)


def test_pipeline_exchange_volume_is_local_cut():
    """The contribution exchange moves O(local cut) per device (ppermute
    rounds), not O(n_dev * S): total per-round volume stays well below the
    all_gather's n_dev * S."""
    dom = Domain.structured(2, 16)
    part = MeshPartition(dom.mesh, 8)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize(DeviceAxis.make(8))
    assert len(pipe._xc_meta) >= 1
    pp_total = sum(w for _, w in pipe._xc_meta)
    allgather_vol = 8 * pipe.S
    assert pp_total * 3 < allgather_vol, (pp_total, allgather_vol)
    # every send position is within the send buffer, dsts within [0, L]
    for si, rd in zip(pipe._xc_sidx, pipe._xc_rdst):
        assert int(np.asarray(si).max()) < pipe.S
        assert int(np.asarray(rd).max()) <= pipe.L


def test_vert_coords_override_moved_mesh():
    """assemble(vert_coords={0: ...}) assembles on MOVED coordinates
    without rebuilding any plan — the ALE path: matches the serial
    assembly on the moved mesh."""
    import jax
    from jax.sharding import PartitionSpec as P
    from feddlib_tpu.parallel.spmd import AXIS

    dom = Domain.structured(2, 8)
    part = MeshPartition(dom.mesh, 4)
    pipe = DistributedPipeline(part, [(dom, 1)])
    pipe.add_block(0, 0, "laplace")
    pipe.finalize(DeviceAxis.make(4))

    # move: smooth interior perturbation (boundary fixed)
    pts = dom.mesh.points
    disp = 0.03 * np.stack([np.sin(np.pi * pts[:, 0]) *
                            np.sin(np.pi * pts[:, 1])] * 2, axis=1)
    moved = pts + disp

    # serial oracle on a moved copy
    from feddlib_tpu.mesh.structured import build_structured_mesh

    mesh2 = build_structured_mesh(2, 8)
    mesh2.points = moved.copy()
    K_ref = ops.assemble_laplace(Domain(mesh2))

    # distributed: shard the moved coordinates into the pipeline layout
    nv = dom.mesh.vertices_per_element
    vc = np.zeros((pipe.n_dev, pipe.E_max_m[0], nv, 2))
    for q in range(pipe.n_dev):
        eids = part.elem_ids[q]
        vc[q, : len(eids)] = moved[dom.mesh.elements[eids][:, :nv]]
        vc[q, len(eids):] = moved[dom.mesh.elements[0][:nv]]
    dmat = pipe.assemble(vert_coords={0: jnp.asarray(vc)})

    rng = np.random.default_rng(0)
    xg = rng.standard_normal(dom.n_nodes)
    y = _matvec_dist(dmat, pipe, xg)
    y_ref = np.asarray(K_ref.matvec(jnp.asarray(xg)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-11, atol=1e-11)
