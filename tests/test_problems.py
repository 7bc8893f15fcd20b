"""End-to-end problem-layer tests — the analog of the reference's per-physics
integration drivers (problems/tests/laplace, stokes, steadyNavierStokes,
steadyLinElas; SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.problems import Laplace, LinElas, NavierStokes, Stokes
from feddlib_tpu.solvers.nonlinear import NonLinearSolver
from feddlib_tpu.utils.config import ParameterList

from conftest import reference_mesh


def _params(**kw):
    p = ParameterList("Parameters")
    for k, v in kw.items():
        p[k.replace("_", " ")] = v
    return p


def test_laplace_driver():
    """Mirror of problems/tests/laplace/main.cpp on square.mesh."""
    dom = Domain.from_file(reference_mesh("square.mesh"))
    prob = Laplace(dom, parameter_list=_params(
        **{"Preconditioner Type": "SchwarzOneLevel", "Subdomains": 4}))
    prob.assemble()
    prob.assemble_source(lambda x: 1.0 + 0 * x[0])
    for flag in (1, 2, 3, 4):
        prob.add_bc(lambda x, t: 0.0, flag, 0)
    prob.set_boundaries_rhs()
    iters = prob.solve()
    assert prob.last_relres <= 1e-8
    u = np.asarray(prob.solution[0])
    assert u.max() > 0  # interior positive for positive source
    mask = prob.bc_builder.dirichlet_mask(0, dom.n_nodes)
    assert np.abs(u[mask]).max() < 1e-8


def test_laplace_two_level():
    dom = Domain.structured(2, 16)
    prob = Laplace(dom, parameter_list=_params(
        **{"Preconditioner Type": "SchwarzTwoLevel", "Subdomains": 4}))
    prob.assemble()
    prob.assemble_source(lambda x: 1.0 + 0 * x[0])
    prob.add_bc(lambda x, t: 0.0, 1, 0)
    prob.set_boundaries_rhs()
    iters = prob.solve()
    assert prob.last_relres <= 1e-8
    assert iters < 40


def test_linelas_driver():
    """3D cantilever-ish: clamp one face, load the rest weakly."""
    dom = Domain.structured(2, 8)
    pl = _params(E=1.0, **{"Poisson Ratio": 0.3,
                           "Preconditioner Type": "Jacobi"})
    prob = LinElas(dom, parameter_list=pl)
    prob.assemble()
    prob.assemble_source(lambda x: jnp.array([0.0, -0.1]))
    prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)
    prob.set_boundaries_rhs()
    prob.solve()
    assert prob.last_relres <= 1e-8
    d = np.asarray(prob.solution[0]).reshape(-1, 2)
    assert d[:, 1].min() < 0  # sags under downward load


def test_stokes_driver():
    """Lid-driven-cavity-like Stokes, P2-P1 Taylor-Hood."""
    dom_p = Domain.structured(2, 6)
    dom_u = dom_p.p2_domain()
    prob = Stokes(dom_u, dom_p, parameter_list=_params(
        Viscosity=1.0, **{"Preconditioner Type": "SchwarzOneLevel",
                          "Subdomains": 2, "Maximum Iterations": 2000}))
    prob.assemble()

    def lid(x, t):
        on_lid = jnp.isclose(x[1], 1.0)
        return jnp.where(on_lid, jnp.array([1.0, 0.0]), jnp.zeros(2))

    prob.add_bc(lid, 1, 0)
    # pin one pressure dof via flag trick: fix pressure block singular mode
    prob.bc_builder.add_bc(lambda x, t: 0.0, _pin_flag(dom_p), 1, dom_p,
                           "Dirichlet", 1)
    prob.set_boundaries_rhs()
    prob.solve()
    assert prob.last_relres <= 1e-8
    u = np.asarray(prob.solution[0]).reshape(-1, 2)
    # flow should circulate: some negative x-velocity below the lid
    assert u[:, 0].min() < -1e-3
    # divergence-free-ish: Bu small in the interior
    Bu = np.asarray(prob.system.get_block(1, 0).matvec(prob.solution[0]))
    assert np.abs(Bu).max() < 1e-6


def _pin_flag(dom_p):
    """Give node 0 of the pressure mesh a unique flag and return it."""
    flag = 77
    dom_p.mesh.point_flags = dom_p.mesh.point_flags.copy()
    dom_p.mesh.point_flags[0] = flag
    return flag


def test_navier_stokes_newton():
    """Steady NS at moderate Reynolds on a cavity; Newton must converge in
    few iterations (reference criteria: relNonLinTol 1e-6, MaxNonLinIts 10,
    NonLinearSolver_def.hpp:285-287)."""
    dom_p = Domain.structured(2, 6)
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=_params(
        Viscosity=0.1, **{"Preconditioner Type": "SchwarzOneLevel",
                          "Subdomains": 2, "Maximum Iterations": 2000,
                          "Cancel MaxNonLinIts": True}))
    prob.assemble()

    def lid(x, t):
        on_lid = jnp.isclose(x[1], 1.0)
        return jnp.where(on_lid, jnp.array([1.0, 0.0]), jnp.zeros(2))

    prob.add_bc(lid, 1, 0)
    prob.bc_builder.add_bc(lambda x, t: 0.0, _pin_flag(dom_p), 1, dom_p,
                           "Dirichlet", 1)
    solver = NonLinearSolver("Newton")
    its = solver.solve(prob)
    assert its <= 10
    assert solver.final_criterion <= 1e-6
    u = np.asarray(prob.solution[0]).reshape(-1, 2)
    assert u[:, 0].min() < -1e-3


def test_navier_stokes_fixed_point():
    dom_p = Domain.structured(2, 5)
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=_params(
        Viscosity=0.5, **{"Preconditioner Type": "Jacobi",
                          "Maximum Iterations": 4000,
                          "MaxNonLinIts": 20}))
    prob.assemble()

    def lid(x, t):
        on_lid = jnp.isclose(x[1], 1.0)
        return jnp.where(on_lid, jnp.array([1.0, 0.0]), jnp.zeros(2))

    prob.add_bc(lid, 1, 0)
    prob.bc_builder.add_bc(lambda x, t: 0.0, _pin_flag(dom_p), 1, dom_p,
                           "Dirichlet", 1)
    solver = NonLinearSolver("FixedPoint")
    its = solver.solve(prob)
    assert solver.final_criterion <= 1e-6


def test_problem_distributed_backend():
    """'Use Distributed Solve' routes the problem's solve through the
    device-mesh path with identical iterates to the serial Schwarz solve."""
    results = {}
    for dist in (False, True):
        pl = _params(**{"Preconditioner Type": "SchwarzOneLevel",
                        "Use Distributed Solve": dist,
                        "Devices": 8, "Subdomains": 8})
        dom = Domain.structured(2, 16)
        prob = Laplace(dom, parameter_list=pl)
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.set_boundaries_rhs()
        iters = prob.solve()
        results[dist] = (iters, np.asarray(prob.solution[0]))
    assert results[True][0] == results[False][0]
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-9)


def test_problem_mixed_precision_backend():
    """'Use Mixed Precision' (f32 MXU inner Krylov + f64 refinement)
    reaches the f64 tolerance and matches the f64 solution."""
    def run(mixed):
        pl = _params(**{"Preconditioner Type": "SchwarzOneLevel",
                        "Subdomains": 8, "Clusters": 8,
                        "Use Mixed Precision": mixed})
        dom = Domain.structured(2, 16)
        prob = Laplace(dom, parameter_list=pl)
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.set_boundaries_rhs()
        prob.solve()
        return prob.last_relres, np.asarray(prob.solution[0])

    r64, x64 = run(False)
    rmx, xmx = run(True)
    assert rmx <= 1e-8
    np.testing.assert_allclose(xmx, x64, atol=1e-8)


def test_reuse_preconditioner():
    """'Reuse Preconditioner' (reference FROSch Reuse flags): the Schwarz
    setup runs once and is kept across Newton reassemblies; Newton
    convergence is unaffected (M need only approximate A⁻¹)."""
    from feddlib_tpu.solvers import linear as linmod

    builds = []
    orig = linmod.Preconditioner.build

    def patched(self, m):
        builds.append(1)
        return orig(self, m)

    linmod.Preconditioner.build = patched
    try:
        its = {}
        for reuse in (False, True):
            builds.clear()
            dom_p = Domain.structured(2, 6)
            dom_u = dom_p.p2_domain()
            prob = NavierStokes(dom_u, dom_p, parameter_list=_params(
                Viscosity=0.1,
                **{"Preconditioner Type": "SchwarzOneLevel",
                   "Subdomains": 2, "Maximum Iterations": 2000,
                   "Reuse Preconditioner": reuse}))
            prob.assemble()
            prob.add_bc(lambda x, t: jnp.where(
                jnp.isclose(x[1], 1.0), jnp.array([1.0, 0.0]),
                jnp.zeros(2)), 1, 0)
            prob.bc_builder.add_bc(lambda x, t: 0.0, _pin_flag(dom_p), 1,
                                   dom_p, "Dirichlet", 1)
            prob.set_boundaries_rhs()
            from feddlib_tpu.solvers.nonlinear import NonLinearSolver

            its[reuse] = NonLinearSolver("Newton").solve(prob)
            if reuse:
                assert sum(builds) == 1
            else:
                assert sum(builds) == its[reuse]
        assert its[True] == its[False]
    finally:
        linmod.Preconditioner.build = orig


def test_auto_spmv_format_in_solver(monkeypatch):
    """'SpMV Format: auto' (default on accelerators): the Krylov A-apply
    switches to the gather-free DIA/block-DIA operator on banded patterns;
    solutions and iteration counts are unchanged vs the ELL apply."""
    import jax

    from feddlib_tpu.la.dia import BlockDiaMatrix, DiaMatrix
    from feddlib_tpu.problems.linelas import LinElas

    def run(force_auto):
        if force_auto:  # auto formats gate on accelerator backends
            monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        else:
            monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        dom = Domain.structured(2, 12)
        prob = Laplace(dom, parameter_list=_params())
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.set_boundaries_rhs()
        iters = prob.solve()
        fmt = getattr(prob, "_autofmt", {"fmt": None})["fmt"]
        return iters, np.asarray(prob.solution[0]), fmt

    it_ell, x_ell, fmt_ell = run(False)
    it_auto, x_auto, fmt_auto = run(True)
    assert fmt_ell is None and isinstance(fmt_auto, DiaMatrix)
    assert it_auto == it_ell
    np.testing.assert_allclose(x_auto, x_ell, atol=1e-10)

    # vector problem -> block-DIA
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    dom = Domain.structured(2, 8)
    prob = LinElas(dom, parameter_list=_params(E=100.0))
    prob.assemble()
    prob.add_bc(lambda x, t: (0.0, 0.0), 1, 0)
    prob.assemble_source(lambda x: jnp.stack([0.0 * x[0], -1.0 + 0 * x[0]]))
    prob.set_boundaries_rhs()
    prob.solve()
    assert isinstance(prob._autofmt["fmt"], BlockDiaMatrix)
    assert prob.last_relres <= 1e-8


def test_mixed_precision_newton_reuses_preconditioner():
    """Newton with 'Use Mixed Precision': on reassembly the padded SELL
    operator VALUES refresh (with_data) while the factorized Schwarz is
    reused (FROSch Reuse flags) — Newton still converges quadratically to
    the f64 tolerance; 'Reuse Preconditioner': False forces full rebuilds
    and must give the same solution."""
    from feddlib_tpu.problems.navier_stokes import NavierStokes

    def run(reuse):
        pl = _params(**{"Preconditioner Type": "SchwarzOneLevel",
                        "Clusters": 8, "Use Mixed Precision": True,
                        "Reuse Preconditioner": reuse,
                        "Viscosity": 0.05})
        dom_p = Domain.structured(2, 8)
        dom_u = dom_p.p2_domain()
        prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
        prob.assemble()
        lid = lambda x, t: jnp.stack([jnp.where(x[1] > 1 - 1e-9, 1.0, 0.0),
                                      0.0 * x[0]])
        prob.add_bc(lid, 1, 0)
        NonLinearSolver("Newton").solve(prob)
        return np.asarray(prob.solution[0])

    u_reuse = run(True)
    u_fresh = run(False)
    np.testing.assert_allclose(u_reuse, u_fresh, atol=2e-6)
