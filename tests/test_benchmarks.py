"""Golden-value benchmark tests against published results — the quantitative
parity bar the reference never enforces in-repo (SURVEY.md §4: "no
golden-value numeric assertions"; we add them)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.problems import NavierStokes
from feddlib_tpu.solvers.nonlinear import NonLinearSolver
from feddlib_tpu.utils.config import ParameterList

from conftest import reference_mesh


@pytest.mark.slow
def test_turek_hron_cfd1_drag_lift():
    """Steady Navier-Stokes on the reference's dfg_fsi_fluid_h004.mesh
    (Turek-Hron CFD1: Re=20, parabolic inflow U_mean=0.2, rho=1000, mu=1).
    Published benchmark values: drag = 14.29, lift = 1.119.  On this coarse
    mesh we reproduce them to <1%/<3%."""
    pl = ParameterList("P")
    for k, v in {"Viscosity": 1.0, "Density": 1000.0,
                 "Preconditioner Type": "SchwarzOneLevel", "Subdomains": 8,
                 "Maximum Iterations": 4000,
                 "Convergence Tolerance": 1e-8,
                 "relNonLinTol": 1e-6, "MaxNonLinIts": 10}.items():
        pl[k] = v
    dom_p = Domain.from_file(reference_mesh("dfg_fsi_fluid_h004.mesh"))
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
    prob.assemble()

    H, umax = 0.41, 0.3

    def inflow(x, t):
        return jnp.array([4.0 * umax * x[1] * (H - x[1]) / (H * H), 0.0])

    zero2 = lambda x, t: jnp.zeros(2)
    prob.add_bc(zero2, 1, 0)
    prob.add_bc(inflow, 2, 0)
    prob.add_bc(zero2, 4, 0)
    prob.add_bc(zero2, 5, 0)

    solver = NonLinearSolver("Newton")
    its = solver.solve(prob)
    assert its <= 6
    F = prob.surface_forces([4, 5])
    drag, lift = float(F[0]), float(F[1])
    assert abs(drag - 14.29) / 14.29 < 0.01, drag
    assert abs(lift - 1.119) / 1.119 < 0.03, lift


@pytest.mark.slow
def test_dfg3d_north_star_goldens():
    """The BASELINE.md north star pinned in CI: DFG 3D cylinder NS
    (DFG3DCylinder_1k.mesh, P2/P1) with Newton + monolithic two-level GDSW
    GMRES at tol 1e-8, 8 subdomains.  Measured goldens (f64, deterministic
    RCB): Newton 5 iterations, GMRES per step [56, 56, 58, 58, 58],
    cd 7.80 / cl 0.019 on the 1k mesh."""
    pl = ParameterList("P")
    for k, v in {"Viscosity": 1.0, "Density": 1000.0,
                 "Preconditioner Type": "SchwarzTwoLevel", "Subdomains": 8,
                 "Maximum Iterations": 4000,
                 "Convergence Tolerance": 1e-8,
                 "relNonLinTol": 1e-6, "MaxNonLinIts": 10}.items():
        pl[k] = v
    dom_p = Domain.from_file(reference_mesh("DFG3DCylinder_1k.mesh"))
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
    prob.assemble()

    H, umax = 0.41, 0.3

    def inflow(x, t):
        ux = 16.0 * umax * x[1] * x[2] * (H - x[1]) * (H - x[2]) / H ** 4
        return jnp.array([ux, 0.0, 0.0])

    zero3 = lambda x, t: jnp.zeros(3)
    prob.add_bc(zero3, 1, 0)
    prob.add_bc(inflow, 2, 0)
    prob.add_bc(zero3, 4, 0)

    solver = NonLinearSolver("Newton")
    its = solver.solve(prob)
    assert its == 5, its
    golden = [56, 56, 58, 58, 58]
    assert len(solver.linear_iters) == len(golden), solver.linear_iters
    for got, want in zip(solver.linear_iters, golden):
        assert abs(got - want) <= 3, (solver.linear_iters, golden)

    u_mean = 4.0 / 9.0 * umax
    F = prob.surface_forces([4])
    cd = 2 * float(F[0]) / (prob.density * u_mean ** 2 * 0.1 * H)
    cl = 2 * float(F[1]) / (prob.density * u_mean ** 2 * 0.1 * H)
    assert abs(cd - 7.80) / 7.80 < 0.02, cd
    assert abs(cl - 0.019) < 0.005, cl


@pytest.mark.slow
def test_gdsw_flatness_3d():
    """Two-level GDSW iteration flatness 16 → 64 subdomains at a 3D size
    (the BASELINE.md scalability anchor, now enforced in CI)."""
    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(3, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    its = {}
    for n_sub in (16, 64):
        part = MeshPartition(dom.mesh, n_sub)
        tl = TwoLevelSchwarz(Kb, part.unique_map,
                             part.repeated_map.partition_indices,
                             dom.mesh.points, 1, dirichlet_mask=dmask)
        its[n_sub] = gmres(Kb.matvec, bb, M=tl.apply, tol=1e-8,
                           maxiter=500).iters
    assert its[64] <= its[16] + 3, its
