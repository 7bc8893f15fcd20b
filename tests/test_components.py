"""Tests for exporter (HDF5/XDMF), AABB tree, hyperelasticity, and the
distributed Schwarz preconditioner."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.utils.config import ParameterList


def _params(**kw):
    p = ParameterList("Parameters")
    for k, v in kw.items():
        p[k] = v
    return p


def test_exporter_paraview(tmp_path):
    from feddlib_tpu.io.exporter import ExporterParaView

    dom = Domain.structured(2, 4)
    exp = ExporterParaView(dom, str(tmp_path / "out"), "sol")
    exp.add_variable("u", 1)
    exp.add_variable("v", 2)
    u = np.linspace(0, 1, dom.n_nodes)
    v = np.ones(dom.n_dofs(2))
    exp.save(0.0, {"u": u, "v": v})
    exp.save(0.5, {"u": u * 2, "v": v})
    exp.close()

    import h5py

    with h5py.File(str(tmp_path / "out.h5")) as f:
        assert f["points"].shape == (dom.n_nodes, 3)
        assert f["connectivity"].shape == (dom.n_elements, 3)
        np.testing.assert_allclose(f["u_1"][:], u * 2)
        assert f["v_0"].shape == (dom.n_nodes, 3)  # 2-D vector padded
    xmf = (tmp_path / "out.xmf").read_text()
    assert "Triangle" in xmf and 'Time Value="0.5"' in xmf


def test_aabb_tree():
    from feddlib_tpu.mesh.aabb import AABBTree

    dom = Domain.structured(2, 5)
    tree = AABBTree(dom.mesh.points, dom.mesh.elements)
    rng = np.random.default_rng(0)
    pts = rng.random((20, 2))
    loc = tree.locate_points(pts)
    assert (loc >= 0).all()
    # verify containment via barycentric coordinates
    for p, e in zip(pts, loc):
        verts = dom.mesh.points[dom.mesh.elements[e]]
        T = (verts[1:] - verts[0]).T
        xi = np.linalg.solve(T, p - verts[0])
        lam = np.concatenate([[1 - xi.sum()], xi])
        assert lam.min() > -1e-10
    # point outside the mesh
    out = tree.locate_points(np.array([[2.5, 2.5]]))
    assert out[0] == -1


@pytest.mark.parametrize("material", ["StVK", "Neo-Hooke", "Mooney-Rivlin"])
def test_hyperelastic_newton(material):
    from feddlib_tpu.problems.nonlin_elasticity import NonLinElasticity
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver

    pl = _params(**{"Material Model": material, "E": 1.0,
                    "Poisson Ratio": 0.3, "Preconditioner Type": "Jacobi",
                    "Maximum Iterations": 4000,
                    "Convergence Tolerance": 1e-10})
    dom = Domain.structured(2, 4)
    prob = NonLinElasticity(dom, parameter_list=pl)
    prob.assemble()
    prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
    prob.assemble_source(lambda x: jnp.array([0.0, -0.001]))
    s = NonLinearSolver("Newton")
    its = s.solve(prob)
    assert its <= 4  # quadratic convergence at small strain
    assert s.final_criterion <= 1e-6
    d = np.asarray(prob.solution[0]).reshape(-1, 2)
    assert d[:, 1].min() < 0


def test_hyperelastic_matches_linear_small_strain():
    from feddlib_tpu.problems import LinElas
    from feddlib_tpu.problems.nonlin_elasticity import NonLinElasticity
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver

    common = {"E": 1.0, "Poisson Ratio": 0.3,
              "Preconditioner Type": "Jacobi", "Maximum Iterations": 4000,
              "Convergence Tolerance": 1e-11}
    lin = LinElas(Domain.structured(2, 4), parameter_list=_params(**common))
    lin.assemble()
    lin.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
    lin.assemble_source(lambda x: jnp.array([0.0, -1e-4]))
    lin.set_boundaries_rhs()
    lin.solve()

    nl = NonLinElasticity(Domain.structured(2, 4), parameter_list=_params(
        **{"Material Model": "StVK", **common}))
    nl.assemble()
    nl.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
    nl.assemble_source(lambda x: jnp.array([0.0, -1e-4]))
    NonLinearSolver("Newton").solve(nl)

    dl = np.asarray(lin.solution[0])
    dn = np.asarray(nl.solution[0])
    assert np.abs(dn - dl).max() / np.abs(dl).max() < 1e-3


@pytest.mark.parametrize("combine", ["Restricted", "Full", "Averaging"])
def test_distributed_schwarz_matches_serial(combine):
    import jax

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.schwarz import (
        SchwarzPreconditioner, distributed_schwarz)
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 12)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    part = MeshPartition(dom.mesh, 4)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(4))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map, dmat.plan.N_o)

    sp = SchwarzPreconditioner(Kb, part.unique_map, overlap=1,
                               combine=combine)
    ref = gmres(Kb.matvec, bb, M=sp.apply, tol=1e-8, maxiter=500)
    build, arrs = distributed_schwarz(dmat, combine=combine)
    x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8, maxiter=500,
                              precond=(build, arrs))
    assert it == ref.iters  # distributed must reproduce serial exactly
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-9)


def test_dense_block_spmv_matches_csr():
    """DenseBlockSpMV (the TPU MXU fast path) must reproduce the CSR apply
    exactly for scalar and vector-dof operators."""
    from feddlib_tpu.fe import ops
    from feddlib_tpu.la.dense_blocks import DenseBlockSpMV
    from feddlib_tpu.mesh.partition import MeshPartition

    rng = np.random.default_rng(0)
    dom = Domain.structured(2, 12)
    K = ops.assemble_laplace(dom)
    part = MeshPartition(dom.mesh, 8)
    dbs = DenseBlockSpMV.from_csr(K, part.unique_map.owner_of())
    x = jnp.asarray(rng.standard_normal(dom.n_nodes))
    np.testing.assert_allclose(np.asarray(dbs.matvec(x)),
                               np.asarray(K.matvec(x)), atol=1e-12)
    # padded round-trip
    xp = dbs.to_padded(x)
    np.testing.assert_allclose(np.asarray(dbs.from_padded(xp)),
                               np.asarray(x))
    # vector dofs
    mu, lam = ops.lame_parameters(1.0, 0.3)
    Ke = ops.assemble_lin_elasticity(dom, mu, lam)
    rc = np.repeat(part.unique_map.owner_of(), 2)
    dbe = DenseBlockSpMV.from_csr(Ke, rc)
    xe = jnp.asarray(rng.standard_normal(Ke.shape[0]))
    np.testing.assert_allclose(np.asarray(dbe.matvec(xe)),
                               np.asarray(Ke.matvec(xe)), atol=1e-12)


def test_distributed_two_level_matches_serial():
    """Distributed GDSW two-level Schwarz reproduces the serial operator
    iteration-for-iteration (coarse residual via psum)."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz, distributed_two_level
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    tls = TwoLevelSchwarz(Kb, part.unique_map,
                          part.repeated_map.partition_indices,
                          dom.mesh.points, 1, overlap=1,
                          dirichlet_mask=dmask)
    ref = gmres(Kb.matvec, bb, M=tls.apply, tol=1e-8, maxiter=500)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                        dirichlet_mask=dmask)
    x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8, maxiter=500,
                              precond=(build, arrs))
    assert it == ref.iters
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-9)


def test_dense_block_schwarz_matches_reference_schwarz():
    """DenseBlockSchwarz (padded-space overlap-1 restricted Schwarz with
    slice-combine) must equal SchwarzPreconditioner(overlap=1, Restricted)
    conjugated by the padding permutation, and the padded A-operator must
    equal the CSR apply."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.la.dense_blocks import DenseBlockSchwarz, DenseBlockSpMV
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.precond.schwarz import SchwarzPreconditioner

    dom = Domain.structured(3, 6)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    Kb, _ = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    part = MeshPartition(dom.mesh, 8)
    db = DenseBlockSpMV.from_csr(Kb, part.unique_map.owner_of())
    x = jnp.asarray(np.random.default_rng(1).standard_normal(dom.n_nodes))
    fnA, opsA = db.padded_operator()
    np.testing.assert_allclose(
        np.asarray(db.from_padded(fnA(opsA, db.to_padded(x)))),
        np.asarray(Kb.matvec(x)), atol=1e-12)
    sw = SchwarzPreconditioner(Kb, part.unique_map, overlap=1,
                               combine="Restricted")
    dsw = DenseBlockSchwarz(Kb, db)
    z0 = np.asarray(sw.apply(x))
    z1 = np.asarray(db.from_padded(dsw.apply_padded(db.to_padded(x))))
    np.testing.assert_allclose(z1, z0, atol=1e-10 * np.abs(z0).max())


def test_device_rap_matches_host():
    """Device-side Galerkin RAP (ELL SpMM + segment-sum, gdsw.rap_device)
    reproduces the host scipy triple product to f64 roundoff, and the
    coarse operator built with rap='device' preconditions identically."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.precond.gdsw import GDSWCoarseOperator, rap_device

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    Kb, _ = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    co_h = GDSWCoarseOperator(Kb, part.unique_map,
                              part.repeated_map.partition_indices,
                              dom.mesh.points, 1, dirichlet_mask=dmask)
    phi = co_h.phi.to_scipy()
    A0_dev = rap_device(Kb, phi, chunk=7)  # odd chunk exercises the tail
    A0_host = (phi.T @ Kb.to_scipy() @ phi).toarray()
    np.testing.assert_allclose(A0_dev, A0_host, atol=1e-12)
    co_d = GDSWCoarseOperator(Kb, part.unique_map,
                              part.repeated_map.partition_indices,
                              dom.mesh.points, 1, dirichlet_mask=dmask,
                              rap="device")
    r = jnp.asarray(np.random.default_rng(3).standard_normal(Kb.shape[0]))
    np.testing.assert_allclose(np.asarray(co_d.apply(r)),
                               np.asarray(co_h.apply(r)), atol=1e-9)


def test_dedicated_coarse_ranks():
    """'Mpi Ranks Coarse' analog (Preconditioner_def.hpp:384-423): domain
    rows on the first 6 of 8 devices, A₀⁻¹ row-sharded over the 2 reserved
    coarse devices.  Iterates must match the serial 6-part two-level
    operator exactly."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz, distributed_two_level
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 6)  # domain work on 6 parts
    tls = TwoLevelSchwarz(Kb, part.unique_map,
                          part.repeated_map.partition_indices,
                          dom.mesh.points, 1, overlap=1,
                          dirichlet_mask=dmask)
    ref = gmres(Kb.matvec, bb, M=tls.apply, tol=1e-8, maxiter=500)

    umap8 = part.unique_map.with_free_parts(2)  # devices 6,7 own nothing
    assert umap8.n_parts == 8 and umap8.is_unique()
    dmat = DistributedCsr(Kb, umap8)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), umap8, dmat.plan.N_o)
    build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                        dirichlet_mask=dmask, coarse_ranks=2)
    x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8, maxiter=500,
                              precond=(build, arrs))
    assert it == ref.iters
    np.testing.assert_allclose(collect_vector(x, umap8),
                               np.asarray(ref.x), atol=1e-9)


@pytest.mark.parametrize("fe_type", ["Q1", "Q2"])
def test_hex_vector_rhs(fe_type):
    """Vector-field volume source on quad meshes (FE::assemblyRHS
    vector branch, FE_def.hpp:4694): partition of unity makes the
    per-component dof totals equal ∫ f over the unit square."""
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain

    dom = Domain.structured_hex(2, 3, fe_type=fe_type)
    b = ops.assemble_rhs(dom, lambda x: jnp.stack(
        [1.0 + 0 * x[0], 3.0 * x[0]]), dofs_per_node=2)
    tot = np.asarray(b).reshape(-1, 2).sum(axis=0)
    np.testing.assert_allclose(tot, [1.0, 1.5], atol=1e-12)


@pytest.mark.parametrize("dim", [2, 3])
def test_q1_hex_elements(dim):
    """Isoparametric Q1 quad/hex elements: partition of unity, nodal basis,
    exact mass total, and linear-exactness of the Poisson solve."""
    from feddlib_tpu.fe.assembly import scatter_pattern
    from feddlib_tpu.fe.hex import (build_hex_mesh, hex_elem_laplace,
                                    hex_elem_mass, q1_phi)
    from feddlib_tpu.la.csr import CsrMatrix
    from feddlib_tpu.solvers.krylov import cg

    mesh = build_hex_mesh(dim, 3)
    coords = jnp.asarray(mesh.points[mesh.elements])
    K = hex_elem_laplace(coords, dim)
    M = hex_elem_mass(coords, dim)
    np.testing.assert_allclose(np.asarray(K).sum(axis=2), 0.0, atol=1e-12)
    assert np.isclose(float(jnp.sum(M)), 1.0, atol=1e-12)

    n = mesh.n_points
    pat = scatter_pattern(mesh.elements, mesh.elements, n, n)
    Kg = CsrMatrix(pat)
    Kg.assemble(K.reshape(-1))
    g = mesh.points[:, 0] + 2 * mesh.points[:, 1]
    mask = mesh.point_flags == 1
    rows = pat.rows_of_slots()
    in_r, in_c = mask[rows], mask[pat.indices]
    is_d = pat.indices == rows
    rhs = -Kg.matvec(jnp.where(jnp.asarray(mask), jnp.asarray(g), 0.0))
    rhs = jnp.where(jnp.asarray(mask), jnp.asarray(g), rhs)
    data = Kg.data.at[jnp.asarray(
        np.nonzero((in_r | in_c) & ~(is_d & in_r))[0])].set(0.0)
    data = data.at[jnp.asarray(np.nonzero(in_r & is_d)[0])].set(1.0)
    Kb = CsrMatrix(pat, data)
    res = cg(Kb.matvec, rhs, tol=1e-12, maxiter=1000)
    assert np.abs(np.asarray(res.x) - g).max() < 1e-9


@pytest.mark.parametrize("fe_type,dim", [("Q2", 2), ("Q2", 3), ("Q2-20", 3)])
def test_q2_hex_elements(fe_type, dim):
    """Q2 (tensor) and Q2-20 (serendipity) quad/hex elements
    (MeshStructured_decl.hpp:71-101, FE::getPhi/getDPhi Q-branches):
    nodal-delta + partition of unity, and *quadratic* exactness of the
    assembled stiffness energy against the analytic integral."""
    from feddlib_tpu.fe.hex import (build_hex_mesh, hex_elem_laplace,
                                    hex_phi, ref_nodes)

    nodes = ref_nodes(fe_type, dim)
    np.testing.assert_allclose(hex_phi(fe_type, dim, nodes),
                               np.eye(len(nodes)), atol=1e-12)
    pts = np.linspace(0.05, 0.95, 4)[:, None] * np.ones((1, dim))
    np.testing.assert_allclose(hex_phi(fe_type, dim, pts).sum(axis=1), 1.0,
                               atol=1e-12)

    mesh = build_hex_mesh(dim, 3, fe_type=fe_type)
    coords = jnp.asarray(mesh.points[mesh.elements[:, :2 ** dim]])
    K = np.asarray(hex_elem_laplace(coords, dim, fe_type))
    p = mesh.points
    u = p[:, 0] ** 2 + 2 * p[:, 1] ** 2 + p[:, 0] * p[:, 1]
    # ∫|∇u|² over [0,1]^dim with ∇u = (2x+y, 4y+x): exact 4/3+1/3+16/3+1/3+2 = 28/3... computed below
    gx = lambda x, y: 2 * x + y
    gy = lambda x, y: 4 * y + x
    from numpy.polynomial.legendre import leggauss
    xg, wg = leggauss(3)
    xg, wg = (xg + 1) / 2, wg / 2
    exact = sum(wi * wj * (gx(xi, yj) ** 2 + gy(xi, yj) ** 2)
                for xi, wi in zip(xg, wg) for yj, wj in zip(xg, wg))
    ue = u[mesh.elements]
    energy = np.einsum("ea,eab,eb->", ue, K, ue)
    np.testing.assert_allclose(energy, exact, rtol=1e-12)


def test_q2_hex_poisson_convergence():
    """End-to-end Q2 hex Poisson (Domain.structured_hex → assemble →
    Dirichlet → CG) converges at ≥3rd order in L2."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.solvers.krylov import cg

    errs = []
    for n in (2, 4):
        dom = Domain.structured_hex(2, n, fe_type="Q2")
        K = ops.assemble_laplace(dom)
        b = ops.assemble_rhs(
            dom, lambda x: 2 * np.pi ** 2 * jnp.sin(np.pi * x[0])
            * jnp.sin(np.pi * x[1]))
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        res = cg(Kb.matvec, bb, tol=1e-12, maxiter=2000)
        pts = dom.mesh.points
        ex = np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])
        M = ops.assemble_mass(dom)
        e = jnp.asarray(np.asarray(res.x) - ex)
        errs.append(float(jnp.sqrt(e @ M.matvec(e))))
    assert np.log2(errs[0] / errs[1]) > 2.9


def test_coarse_numprocs_matches_replicated():
    """'Coarse NumProcs' (the reference Distribution sublist,
    parametersPrec.xml:104-110): sharding A0^-1 over the first k devices
    reproduces the replicated coarse solve iteration-for-iteration."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, distribute_vector)
    from feddlib_tpu.precond.gdsw import distributed_two_level

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    its = {}
    for cp in (0, 2):
        build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                            dirichlet_mask=dmask,
                                            coarse_procs=cp)
        _, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8,
                                  maxiter=500, precond=(build, arrs))
        assert rel < 1e-8
        its[cp] = it
    assert its[2] == its[0]


@pytest.mark.parametrize("combo,csolver", [("Multiplicative", "dense"),
                                           ("Additive", "sparse"),
                                           ("Multiplicative", "sparse")])
def test_distributed_two_level_variants_match_serial(combo, csolver):
    """Distributed multiplicative level combination and the scalable
    sparse-LU coarse solve (CoarseSolver role) reproduce the serial
    two-level operator iteration-for-iteration — the coarse solve is
    exact in both forms, so iterates are identical."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz, distributed_two_level
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    tls = TwoLevelSchwarz(Kb, part.unique_map,
                          part.repeated_map.partition_indices,
                          dom.mesh.points, 1, overlap=1,
                          dirichlet_mask=dmask, level_combination=combo)
    ref = gmres(Kb.matvec, bb, M=tls.apply, tol=1e-8, maxiter=500)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                        dirichlet_mask=dmask,
                                        level_combination=combo,
                                        coarse_solver=csolver)
    x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8, maxiter=500,
                              precond=(build, arrs))
    assert it == ref.iters
    np.testing.assert_allclose(collect_vector(x, part.unique_map),
                               np.asarray(ref.x), atol=1e-9)


def test_distributed_two_level_iterative_coarse():
    """'Coarse Solver: iterative' (GMRES to tol 1e-6, ≤200 its on sparse
    A0 — the reference's Belos CoarseSolver sublist,
    parametersPrec.xml:216-225) pins OUTER-iteration parity with the
    exact dense coarse solve: at inner tol 1e-6 the coarse correction is
    exact to well below the outer convergence behavior."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.gdsw import distributed_two_level

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    its = {}
    for csolver in ("dense", "iterative"):
        build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                            dirichlet_mask=dmask,
                                            coarse_solver=csolver)
        x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8,
                                  maxiter=500, precond=(build, arrs))
        assert rel < 1e-8
        its[csolver] = it
        xg = collect_vector(x, part.unique_map)
        res = np.asarray(Kb.matvec(jnp.asarray(xg))) - np.asarray(bb)
        # tolerance-based inner solves make M weakly nonlinear, so the
        # outer Krylov's implicit residual estimate drifts from the true
        # residual by ~inner tol (the reference's Belos-around-Belos
        # CoarseSolver has the same property); dense is exact
        cap = 1e-7 if csolver == "dense" else 2e-5
        assert np.linalg.norm(res) / np.linalg.norm(np.asarray(bb)) < cap
    # outer-iteration parity (round-4 weak item 8)
    assert abs(its["iterative"] - its["dense"]) <= 1, its


def test_distributed_iterative_coarse_nonsymmetric():
    """The GMRES coarse solve handles NONSYMMETRIC A0 (advective momentum
    block — the case the round-4 fixed-CG silently rerouted): outer
    iterations match the dense coarse solve."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, distribute_vector)
    from feddlib_tpu.precond.gdsw import distributed_two_level

    dom = Domain.structured(2, 12)
    n_u = dom.n_dofs(2)
    adv = jnp.asarray(np.tile([1.0, 0.3], dom.n_nodes))
    A = ops.assemble_laplace_vec(dom, 0.1).add(
        ops.assemble_advection(dom, adv))
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: np.zeros(2), 1, 0, dom, "Dirichlet", 2)
    bb = jnp.asarray(np.random.default_rng(3).standard_normal(n_u))
    Ab, bb = bcb.apply_symmetric(A, bb, 0)
    dmask = bcb.dirichlet_mask(0, n_u)
    part = MeshPartition(dom.mesh, 8)
    dof_map = part.unique_map.build_vec_field_map(2)
    dmat = DistributedCsr(Ab, dof_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), dof_map, dmat.plan.N_o)
    its = {}
    for csolver in ("dense", "iterative"):
        build, arrs = distributed_two_level(
            dmat, part, dom.mesh.points, 2, dirichlet_mask=dmask,
            coarse_solver=csolver)
        _, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8,
                                  maxiter=500, precond=(build, arrs))
        assert rel < 1e-8
        its[csolver] = it
    assert abs(its["iterative"] - its["dense"]) <= 1, its


@pytest.mark.parametrize("csolver", ["sparse", "iterative"])
def test_distributed_coarse_solver_with_numprocs(csolver):
    """Scalable coarse solvers compose with the Distribution sublist
    (Coarse NumProcs): only k devices hold the A0 factors/values (the
    rest carry a padded identity), the correction is psum-recovered —
    iterates identical to the replicated form."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import (
        DeviceAxis, DistributedCsr, collect_vector, distribute_vector)
    from feddlib_tpu.precond.gdsw import distributed_two_level

    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 8)
    dmat = DistributedCsr(Kb, part.unique_map)
    solver = DistributedSolver(dmat, DeviceAxis.make(8))
    b_dist = distribute_vector(np.asarray(bb), part.unique_map,
                               dmat.plan.N_o)
    sols, its = {}, {}
    for cp in (0, 2):
        build, arrs = distributed_two_level(dmat, part, dom.mesh.points, 1,
                                            dirichlet_mask=dmask,
                                            coarse_solver=csolver,
                                            coarse_procs=cp)
        x, it, rel = solver.solve(b_dist, method="gmres", tol=1e-8,
                                  maxiter=500, precond=(build, arrs))
        assert rel < 1e-8
        sols[cp] = collect_vector(x, part.unique_map)
        its[cp] = it
    assert its[2] == its[0]
    np.testing.assert_allclose(sols[2], sols[0], atol=1e-10)
