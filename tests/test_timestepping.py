"""Time integration tests — the analog of the reference's unsteady drivers
(problems/tests/unsteadyNavierStokes, unsteadyLinElas; SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.problems import Laplace, LinElas, NavierStokes
from feddlib_tpu.solvers.timestepping import (
    DAESolverInTime, TimeProblem, bdf_coefficients)
from feddlib_tpu.utils.config import ParameterList


def _params(**kw):
    p = ParameterList("Parameters")
    for k, v in kw.items():
        p[k] = v
    return p


def _heat_problem(n=8):
    """du/dt = Δu, u=0 on boundary; first eigenmode decays as
    exp(−2π²t)."""
    dom = Domain.structured(2, n)
    prob = Laplace(dom, parameter_list=_params(
        **{"Preconditioner Type": "Jacobi", "Maximum Iterations": 2000,
           "Convergence Tolerance": 1e-10}))
    prob.assemble()
    prob.add_bc(lambda x, t: 0.0, 1, 0)
    prob.init_vectors()
    pts = dom.mesh.points
    u0 = np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])
    from feddlib_tpu.la.block import BlockVector

    prob.solution = BlockVector([jnp.asarray(u0)])
    return dom, prob, u0


def test_bdf_coefficients():
    b0, al = bdf_coefficients(2)
    assert b0 == 1.5 and al == [2.0, -0.5]
    # consistency: sum(alphas) == beta0 (constant exactness)
    for k in (1, 2, 3):
        b0, al = bdf_coefficients(k)
        assert np.isclose(sum(al), b0)


def _semidiscrete_exact(dom, prob, tp, u0, T):
    """Exact solution of the SEMIDISCRETE system  M u̇ = −K u  on the free
    (non-Dirichlet) dofs via dense expm — isolates the time-integration
    error from the fixed spatial error."""
    import scipy.linalg as sla

    mask = prob.bc_builder.dirichlet_mask(0, dom.n_nodes)
    free = ~mask
    K = prob.system.get_block(0, 0).to_scipy().toarray()[np.ix_(free, free)]
    M = tp.mass[0].to_scipy().toarray()[np.ix_(free, free)]
    A = np.linalg.solve(M, K)
    uT = np.zeros_like(u0)
    uT[free] = sla.expm(-A * T) @ u0[free]
    return uT


@pytest.mark.parametrize("scheme,order", [("theta", 1), ("bdf2", 2)])
def test_heat_decay(scheme, order):
    dom, prob, u0 = _heat_problem(8)
    tp = TimeProblem(prob)
    T = 0.02
    exact = _semidiscrete_exact(dom, prob, tp, u0, T)
    errs = []
    for dt in (T / 8, T / 16):
        from feddlib_tpu.la.block import BlockVector

        prob.solution = BlockVector([jnp.asarray(u0)])
        drv = DAESolverInTime(tp, dt, T, theta=1.0)
        if scheme == "theta":
            drv.advance_linear_theta()
        else:
            drv.advance_linear_bdf(order=2)
        u = np.asarray(prob.solution[0])
        errs.append(np.abs(u - exact).max())
    rate = np.log2(errs[0] / errs[1])
    # BDF1/theta=1 → 1st order; BDF2 → 2nd (startup step costs a bit)
    assert rate > order - 0.45, (errs, rate)


def test_crank_nicolson_second_order():
    dom, prob, u0 = _heat_problem(8)
    tp = TimeProblem(prob)
    T = 0.02
    exact = _semidiscrete_exact(dom, prob, tp, u0, T)
    errs = []
    for dt in (T / 4, T / 8):
        from feddlib_tpu.la.block import BlockVector

        prob.solution = BlockVector([jnp.asarray(u0)])
        drv = DAESolverInTime(tp, dt, T, theta=0.5)
        drv.advance_linear_theta()
        u = np.asarray(prob.solution[0])
        errs.append(np.abs(u - exact).max())
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.6, (errs, rate)


def test_newmark_energy_conservation():
    """Undamped elastic vibration: β=1/4, γ=1/2 Newmark conserves energy."""
    dom = Domain.structured(2, 4)
    prob = LinElas(dom, parameter_list=_params(
        E=1.0, **{"Poisson Ratio": 0.3, "Preconditioner Type": "Jacobi",
                  "Maximum Iterations": 4000,
                  "Convergence Tolerance": 1e-12}))
    prob.assemble()
    prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
    prob.init_vectors()
    pts = dom.mesh.points
    d0 = np.zeros((dom.n_nodes, 2))
    d0[:, 1] = 0.01 * np.sin(np.pi * pts[:, 0]) * np.sin(np.pi * pts[:, 1])
    from feddlib_tpu.la.block import BlockVector

    prob.solution = BlockVector([jnp.asarray(d0.ravel())])
    tp = TimeProblem(prob)
    K = prob.system.get_block(0, 0)
    M = tp.mass[0]

    energies = []

    def observer(t, d):
        v = drv_holder[0].velocity if hasattr(drv_holder[0], "velocity") else None

    drv = DAESolverInTime(tp, 0.05, 1.0)
    drv_holder = [drv]
    drv.advance_linear_newmark()
    d = prob.solution[0]
    v = drv.velocity[0]
    E_pot = 0.5 * float(jnp.vdot(d, K.matvec(d)))
    E_kin = 0.5 * float(jnp.vdot(v, M.matvec(v)))
    d0j = jnp.asarray(d0.ravel())
    E0 = 0.5 * float(jnp.vdot(d0j, K.matvec(d0j)))
    assert abs((E_pot + E_kin) - E0) / E0 < 0.02, (E_pot, E_kin, E0)


def test_unsteady_navier_stokes_smoke():
    """Nonlinear BDF2 NS: started lid-driven flow reaches a nonzero state
    and Newton converges each step."""
    dom_p = Domain.structured(2, 4)
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=_params(
        Viscosity=0.1, **{"Preconditioner Type": "Jacobi",
                          "Maximum Iterations": 4000,
                          "Convergence Tolerance": 1e-9}))
    prob.assemble()

    def lid(x, t):
        on_lid = jnp.isclose(x[1], 1.0)
        return jnp.where(on_lid, jnp.array([1.0, 0.0]), jnp.zeros(2))

    prob.add_bc(lid, 1, 0)
    dom_p.mesh.point_flags = dom_p.mesh.point_flags.copy()
    dom_p.mesh.point_flags[0] = 77
    prob.bc_builder.add_bc(lambda x, t: 0.0, 77, 1, dom_p, "Dirichlet", 1)

    tp = TimeProblem(prob, time_step_def=[1, 0])  # mass on velocity only
    drv = DAESolverInTime(tp, 0.05, 0.2)
    drv.advance_nonlinear_bdf(order=2)
    u = np.asarray(prob.solution[0]).reshape(-1, 2)
    assert np.abs(u).max() > 0.1
    assert np.isfinite(u).all()


def test_fractional_theta_second_order():
    """Fractional-step-θ is 2nd order on the heat equation
    (reference TimeSteppingTools fractional-θ table)."""
    dom, prob, u0 = _heat_problem(8)
    tp = TimeProblem(prob)
    T = 0.02
    exact = _semidiscrete_exact(dom, prob, tp, u0, T)
    errs = []
    for dt in (T / 4, T / 8):
        from feddlib_tpu.la.block import BlockVector

        prob.solution = BlockVector([jnp.asarray(u0)])
        drv = DAESolverInTime(tp, dt, T)
        drv.advance_linear_fractional_theta()
        errs.append(np.abs(np.asarray(prob.solution[0]) - exact).max())
    assert np.log2(errs[0] / errs[1]) > 1.7, errs


def test_navier_stokes_extrapolation():
    """Semi-implicit NS (one linear solve per step, convection at the
    extrapolated velocity — reference reAssemble('Extrapolation'))."""
    dom_p = Domain.structured(2, 4)
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=_params(
        Viscosity=0.1, **{"Preconditioner Type": "Jacobi",
                          "Maximum Iterations": 4000,
                          "Convergence Tolerance": 1e-9}))
    prob.assemble()
    prob.add_bc(lambda x, t: jnp.where(
        jnp.isclose(x[1], 1.0), jnp.array([1.0, 0.0]), jnp.zeros(2)), 1, 0)
    dom_p.mesh.point_flags = dom_p.mesh.point_flags.copy()
    dom_p.mesh.point_flags[0] = 77
    prob.bc_builder.add_bc(lambda x, t: 0.0, 77, 1, dom_p, "Dirichlet", 1)
    tp = TimeProblem(prob, time_step_def=[1, 0])
    drv = DAESolverInTime(tp, 0.05, 0.2)
    drv.advance_navier_stokes_extrapolation()
    u = np.asarray(prob.solution[0]).reshape(-1, 2)
    assert np.isfinite(u).all() and np.abs(u).max() > 0.1


def test_adaptive_theta():
    """Step-doubling adaptive θ-scheme: dt grows as the transient decays
    and the result stays within tolerance of the semidiscrete solution."""
    dom, prob, u0 = _heat_problem(8)
    tp = TimeProblem(prob)
    from feddlib_tpu.la.block import BlockVector

    prob.solution = BlockVector([jnp.asarray(u0)])
    drv = DAESolverInTime(tp, 0.001, 0.05, theta=0.5)
    drv.advance_linear_theta_adaptive(rel_tol=1e-5)
    exact = _semidiscrete_exact(dom, prob, tp, u0, 0.05)
    err = np.abs(np.asarray(prob.solution[0]) - exact).max()
    assert err < 5e-4
    assert max(drv.dt_history) > 2 * 0.001  # controller increased dt


def test_checkpoint_resume_exactness(tmp_path):
    """Checkpoint at t=0.5, resume in a FRESH driver, and finish: the
    resumed trajectory must match an uninterrupted run bit-for-bit (BDF2
    history and Newmark v/a are part of the checkpoint)."""
    import os

    def make():
        dom = Domain.structured(2, 4)
        prob = Laplace(dom, parameter_list=_params(
            **{"Preconditioner Type": "Jacobi", "Maximum Iterations": 4000,
               "Convergence Tolerance": 1e-12}))
        prob.assemble()
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.init_vectors()
        return prob

    def rhs(prob):
        from feddlib_tpu.fe import ops
        from feddlib_tpu.la.block import BlockVector

        f = ops.assemble_rhs(prob.variables[0][0], lambda x: 1.0 + 0 * x[0])
        return lambda t: BlockVector([f * min(t, 1.0)])

    for scheme in ("bdf", "newmark", "theta"):
        # uninterrupted reference run
        p1 = make()
        d1 = DAESolverInTime(TimeProblem(p1), 0.1, 1.0, theta=1.0,
                             rhs_func=rhs(p1))
        getattr(d1, f"advance_linear_{scheme}")()
        ref = np.asarray(p1.solution[0])

        # first half with checkpointing, then resume in a fresh driver
        ck = os.path.join(tmp_path, f"{scheme}.npz")
        p2 = make()
        d2 = DAESolverInTime(TimeProblem(p2), 0.1, 0.5, theta=1.0,
                             rhs_func=rhs(p2), checkpoint_path=ck)
        getattr(d2, f"advance_linear_{scheme}")()
        p3 = make()
        d3 = DAESolverInTime(TimeProblem(p3), 0.1, 1.0, theta=1.0,
                             rhs_func=rhs(p3), resume_from=ck)
        getattr(d3, f"advance_linear_{scheme}")()
        got = np.asarray(p3.solution[0])
        np.testing.assert_allclose(got, ref, atol=1e-13,
                                   err_msg=f"scheme {scheme}")
