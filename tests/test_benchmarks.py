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
