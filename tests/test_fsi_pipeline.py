"""FSI GE distributed device-resident assembly (multi-mesh pipeline with
disjoint fluid/solid rank ranges + constant interface couplings) vs the
serial monolithic system.

The distributed path never merges a global CsrMatrix — the serial merge
below is the test ORACLE only.  Reference: rank-local assembly + Export
(FE_def.hpp:637-665), coupling identities (FE_def.hpp:3294,3366), mesh
rank ranges (MeshPartitioner_def.hpp:61-120)."""
import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sps

from feddlib_tpu.fe import ops
from feddlib_tpu.problems.fsi import FSI
from feddlib_tpu.utils.config import ParameterList

from test_fsi import _two_box_domains, IFACE


def _collect(dmat):
    """Distributed ELL → global scipy CSR (test oracle only)."""
    n = dmat.n_global
    rows_l, cols_l, vals_l = [], [], []
    for p in range(dmat.n_dev):
        owned, R = dmat.local_rows(p)
        if not len(owned):
            continue
        coo = R.tocoo()
        rows_l.append(owned[coo.row])
        cols_l.append(coo.col)
        vals_l.append(coo.data)
    return sps.csr_matrix(
        (np.concatenate(vals_l),
         (np.concatenate(rows_l), np.concatenate(cols_l))), shape=(n, n))


@pytest.mark.parametrize("material", ["linear", "Neo-Hooke"])
def test_fsi_pipeline_matches_serial_jacobian(material):
    dom_u, dom_p, dom_d = _two_box_domains(n=3)
    pl = ParameterList({"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.2,
                        "Density Solid": 2.0, "E": 5.0,
                        "Material Model": material})
    prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
    prob.assemble()
    prob.init_vectors()

    rng = np.random.default_rng(0)
    dim = prob.dim
    n_u = dom_u.n_dofs(dim)
    prob.solution[0] = jnp.asarray(0.05 * rng.standard_normal(n_u))
    prob.solution[2] = jnp.asarray(
        0.01 * rng.standard_normal(dom_d.n_dofs(dim)))
    w = 0.03 * rng.standard_normal(n_u)

    # serial oracle
    beta0_dt = 1.0 / prob.dt
    newmark_m = 1.0 / (prob.newmark_beta * prob.dt * prob.dt)
    Pmat = ops.assemble_ale_divergence(
        dom_u, jnp.asarray(w)).scale(-prob.density_f)
    prob._build_system("Newton", jnp.asarray(w), beta0_dt, newmark_m,
                       P=Pmat)
    S = prob.system.merge().to_scipy().tocsr()

    # distributed: multi-mesh pipeline, fluid on devices 0-3, solid 4-5
    pipe = prob.build_pipeline(6, solid_devices=2)
    dmat = prob.assemble_distributed(pipe, w=w)
    D = _collect(dmat)

    diff = abs(S - D)
    denom = max(abs(S).max(), 1.0)
    assert diff.max() / denom < 1e-10, f"max diff {diff.max()}"


def test_fsi_gi_pipeline_matches_serial_jacobian():
    """5-field GI Jacobian through the pipeline (shape-derivative kinds
    jacfwd'd INSIDE the device kernel around the reference configuration,
    fluid blocks on moved coords, geometry block with built-in BC rows)
    is entry-exact vs the serial GI assembly (fe/shape_derivatives) —
    reference FE_def.hpp:3410-4246, FSI_def.hpp:567-577."""
    from feddlib_tpu.fe.shape_derivatives import (
        assemble_shape_derivative_blocks)

    dom_u, dom_p, dom_d = _two_box_domains(n=3)
    pl = ParameterList({"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.2,
                        "Density Solid": 2.0, "E": 5.0})
    prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
    prob.assemble()
    prob._gi = True
    prob.init_vectors()
    dim = prob.dim
    n_u = dom_u.n_dofs(dim)
    prob.solution.blocks.append(jnp.zeros(n_u))
    rng = np.random.default_rng(3)
    prob.solution[0] = jnp.asarray(0.05 * rng.standard_normal(n_u))
    prob.solution[1] = jnp.asarray(
        0.05 * rng.standard_normal(dom_p.n_dofs(1)))
    prob.solution[2] = jnp.asarray(
        0.01 * rng.standard_normal(dom_d.n_dofs(dim)))
    g = 0.01 * rng.standard_normal(n_u)
    prob.solution[4] = jnp.asarray(g)
    gp_vec = 0.005 * rng.standard_normal(n_u)
    u_old = 0.02 * rng.standard_normal(n_u)

    # ---- serial oracle: the advance_gi reassemble, expanded ----
    dt = prob.dt
    newmark_m = 1.0 / (prob.newmark_beta * dt * dt)
    Lg_bc, g_dir = prob._gi_geometry_operator()
    ref = dom_u.mesh.ref_points
    dom_u.mesh.points = ref + g.reshape(-1, dim)
    dom_u.invalidate_geometry()
    prob._assemble_fluid_constant()
    w = jnp.asarray((g - gp_vec) / dt)
    Pmat = ops.assemble_ale_divergence(dom_u, w).scale(-prob.density_f)
    prob._build_system("Newton", w, 1.0 / dt, newmark_m, P=Pmat)
    Dug, Dpg = assemble_shape_derivative_blocks(
        dom_u, dom_p, prob.solution[0], prob.solution[1], g, gp_vec,
        u_old, prob.viscosity, prob.density_f, dt, 1.0 / dt)
    from feddlib_tpu.problems.fsi import _interface_identity

    sizes = prob.block_sizes()
    S = prob.system
    S.add_block(0, 4, Dug)
    S.add_block(1, 4, Dpg)
    S.add_block(4, 4, Lg_bc)
    S.add_block(4, 2, _interface_identity(
        sizes[4], sizes[2], prob._uf_cols, prob._ds_cols, -1.0))
    S_sp = S.merge().to_scipy().tocsr()

    # ---- distributed: multi-mesh GI pipeline ----
    pipe = prob.build_pipeline_gi(6, solid_devices=2)
    dmat = prob.assemble_distributed_gi(pipe, gp_vec, u_old)
    D = _collect(dmat)

    diff = abs(S_sp - D)
    denom = max(abs(S_sp).max(), 1.0)
    assert diff.max() / denom < 1e-9, f"max diff {diff.max()}"

    # ---- 5-field GI FaCSI (geometry stage + FaCSI order) solves the
    # distributed system in few iterations and the solution is correct
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import collect_vector, distribute_vector
    from feddlib_tpu.precond.facsi import distributed_facsi

    n = int(pipe.offsets[-1])
    b = rng.standard_normal(n)
    b_dist = distribute_vector(b, pipe.dof_map, dmat.plan.N_o)
    solver = DistributedSolver(dmat, pipe.axis)
    build, arrs = distributed_facsi(
        dmat, pipe.offsets, prob._uf_cols, prob._ds_cols,
        prob._iface_rows, prob.dt, overlap=1)
    x_d, iters, rel = solver.solve(b_dist, method="gmres", tol=1e-9,
                                   maxiter=200, restart=200,
                                   precond=(build, arrs))
    xg = collect_vector(x_d, pipe.dof_map)
    res = np.linalg.norm(S_sp @ xg - b)
    assert rel < 1e-8
    assert res / np.linalg.norm(b) < 1e-7
    assert iters <= 80, f"GI FaCSI took {iters} iterations"


def test_fsi_pipeline_distributed_facsi():
    """Distributed FaCSI (per-field subdomain solves + interface
    condensation inside one shard_map apply) preconditions the multi-mesh
    GE system: large iteration reduction vs unpreconditioned GMRES and a
    true-residual-correct solution (reference PrecOpFaCSI_decl.hpp:27)."""
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import collect_vector, distribute_vector
    from feddlib_tpu.precond.facsi import distributed_facsi

    dom_u, dom_p, dom_d = _two_box_domains(n=3)
    pl = ParameterList({"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.0,
                        "Density Solid": 1.0, "E": 5.0})
    prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
    prob.assemble()
    prob.init_vectors()
    beta0_dt = 1.0 / prob.dt
    newmark_m = 1.0 / (prob.newmark_beta * prob.dt * prob.dt)
    prob._build_system("Newton", jnp.zeros(dom_u.n_dofs(prob.dim)),
                       beta0_dt, newmark_m)
    S = prob.system.merge()

    pipe = prob.build_pipeline(6, solid_devices=2)
    dmat = prob.assemble_distributed(pipe)

    n = S.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)
    b_dist = distribute_vector(b, pipe.dof_map, dmat.plan.N_o)
    solver = DistributedSolver(dmat, pipe.axis)

    build, arrs = distributed_facsi(
        dmat, pipe.offsets, prob._uf_cols, prob._ds_cols, prob._iface_rows,
        prob.dt, overlap=1)
    x_d, iters, rel = solver.solve(b_dist, method="gmres", tol=1e-9,
                                   maxiter=200, restart=200,
                                   precond=(build, arrs))
    xg = collect_vector(x_d, pipe.dof_map)
    res = np.linalg.norm(np.asarray(S.matvec(jnp.asarray(xg))) - b)
    assert rel < 1e-8
    assert res / np.linalg.norm(b) < 1e-7
    # the whole point: FaCSI beats unpreconditioned (224 iters on this
    # system, see test below) by a wide margin
    assert iters <= 60, f"FaCSI took {iters} iterations"


def test_fsi_advance_distributed_matches_serial_trajectory():
    """2-step GE time loop with 'Use Distributed Solve': every Newton
    Jacobian assembles through the multi-mesh pipeline (moved-mesh vertex
    override) and solves with distributed FaCSI — trajectory matches the
    serial advance (reference DAESolverInTime::advanceInTimeFSI,
    DAESolverInTime_def.hpp:726 with FaCSI inner solves)."""
    from feddlib_tpu.bc import BCBuilder

    def make(dist: bool):
        dom_u, dom_p, dom_d = _two_box_domains(n=3)
        d = {"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.0,
             "Density Solid": 1.0, "E": 5.0,
             "Convergence Tolerance": 1e-10, "relNonLinTol": 1e-9}
        if dist:
            d.update({"Use Distributed Solve": True, "Devices": 6,
                      "Solid Devices": 2})
        pl = ParameterList(d)
        prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
        prob.assemble()
        # no-slip walls; solid clamped at the bottom
        prob.add_bc(lambda x, t: np.zeros(2), 1, 0)
        prob.add_bc(lambda x, t: np.zeros(2), 1, 2)
        prob.init_vectors()
        return prob

    # rotational (curl) fluid forcing — a gradient force would be absorbed
    # into hydrostatic pressure and leave u/d/λ at zero (vacuous test)
    def source(x, t):
        return jnp.stack([-8.0 * (x[1] - 0.75), 8.0 * (x[0] - 0.5)])

    ser = make(False)
    ser.advance(0.04, source_f=source)
    dist = make(True)
    dist.advance(0.04, source_f=source)

    assert float(jnp.linalg.norm(ser.solution[2])) > 1e-4  # real motion
    for b in range(4):
        np.testing.assert_allclose(np.asarray(dist.solution[b]),
                                   np.asarray(ser.solution[b]),
                                   rtol=1e-6, atol=1e-9)


def test_fsi_advance_gi_distributed_matches_serial_trajectory():
    """2-step GI time loop with 'Use Distributed Solve': the 5-field
    Jacobian assembles through the GI pipeline (shape kinds on device)
    and solves with 5-field distributed FaCSI — trajectory matches the
    serial advance_gi."""
    def make(dist: bool):
        dom_u, dom_p, dom_d = _two_box_domains(n=3)
        d = {"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.0,
             "Density Solid": 1.0, "E": 5.0,
             "Convergence Tolerance": 1e-10, "relNonLinTol": 1e-9}
        if dist:
            d.update({"Use Distributed Solve": True, "Devices": 6,
                      "Solid Devices": 2})
        pl = ParameterList(d)
        prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
        prob.assemble()
        prob.add_bc(lambda x, t: np.zeros(2), 1, 0)
        prob.add_bc(lambda x, t: np.zeros(2), 1, 2)
        prob.init_vectors()
        # rotational start impulse in the fluid velocity
        rng = np.random.default_rng(7)
        prob.solution[0] = jnp.asarray(
            0.01 * rng.standard_normal(dom_u.n_dofs(2)))
        return prob

    ser = make(False)
    ser.advance_gi(0.04)
    dist = make(True)
    dist.advance_gi(0.04)
    assert float(jnp.linalg.norm(ser.solution[2])) > 1e-8  # real motion
    for b in range(5):
        np.testing.assert_allclose(np.asarray(dist.solution[b]),
                                   np.asarray(ser.solution[b]),
                                   rtol=1e-6, atol=1e-9)


def test_fsi_pipeline_distributed_solve_matches_serial():
    """Solve the pipeline-assembled GE system with distributed GMRES
    (unpreconditioned — the zero-diagonal λ rows make algebraic Schwarz
    subdomain blocks singular; FaCSI is the production FSI preconditioner)
    and check the TRUE residual of the collected solution."""
    from feddlib_tpu.parallel.solve import DistributedSolver
    from feddlib_tpu.parallel.spmd import collect_vector

    dom_u, dom_p, dom_d = _two_box_domains(n=3)
    pl = ParameterList({"dt": 0.02, "Viscosity": 0.5, "Density Fluid": 1.0,
                        "Density Solid": 1.0, "E": 5.0})
    prob = FSI(dom_u, dom_p, dom_d, [IFACE], parameter_list=pl)
    prob.assemble()
    prob.init_vectors()
    beta0_dt = 1.0 / prob.dt
    newmark_m = 1.0 / (prob.newmark_beta * prob.dt * prob.dt)
    prob._build_system("Newton", jnp.zeros(dom_u.n_dofs(prob.dim)),
                       beta0_dt, newmark_m)
    S = prob.system.merge()

    pipe = prob.build_pipeline(6, solid_devices=2)
    dmat = prob.assemble_distributed(pipe)

    n = S.shape[0]
    rng = np.random.default_rng(1)
    b = rng.standard_normal(n)

    solver = DistributedSolver(dmat, pipe.axis)
    from feddlib_tpu.parallel.spmd import distribute_vector

    b_dist = distribute_vector(b, pipe.dof_map, dmat.plan.N_o)
    x_d, iters_d, rel_d = solver.solve(b_dist, method="gmres", tol=1e-9,
                                       maxiter=600, restart=600,
                                       precond=None)
    xg = collect_vector(x_d, pipe.dof_map)
    res = np.linalg.norm(np.asarray(S.matvec(jnp.asarray(xg))) - b)
    assert rel_d < 1e-8
    assert res / np.linalg.norm(b) < 1e-7
