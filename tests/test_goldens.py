"""Golden iteration counts and GDSW scalability — the BASELINE.md
acceptance anchors (SURVEY.md M2: 'iteration counts flat across subdomain
counts'; reference tolerances from parametersSolver.xml: GMRES rel tol
1e-8).  Counts are platform-stable in f64."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.mesh.partition import MeshPartition
from feddlib_tpu.precond.gdsw import TwoLevelSchwarz
from feddlib_tpu.precond.schwarz import SchwarzPreconditioner
from feddlib_tpu.solvers.krylov import gmres


def _poisson(n):
    dom = Domain.structured(2, n)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    return dom, Kb, bb, bcb.dirichlet_mask(0, dom.n_nodes)


def test_gdsw_iteration_flatness():
    """Two-level GDSW keeps GMRES iterations essentially flat as the
    subdomain count grows (the reference's raison d'être for the coarse
    level, SURVEY.md §5 long-axis scaling); one-level degrades."""
    dom, Kb, bb, dmask = _poisson(48)
    one, two = {}, {}
    for n_sub in (16, 64):
        part = MeshPartition(dom.mesh, n_sub)
        l1 = SchwarzPreconditioner(Kb, part.unique_map, overlap=1)
        one[n_sub] = gmres(Kb.matvec, bb, M=l1.apply, tol=1e-8,
                           maxiter=500).iters
        tl = TwoLevelSchwarz(Kb, part.unique_map,
                             part.repeated_map.partition_indices,
                             dom.mesh.points, 1, overlap=1,
                             dirichlet_mask=dmask)
        two[n_sub] = gmres(Kb.matvec, bb, M=tl.apply, tol=1e-8,
                           maxiter=500).iters
    # measured goldens (f64, deterministic RCB): one-level 24 → 29,
    # two-level 23 → 23 — one-level degrades, two-level is FLAT
    assert one[64] > one[16], (one, two)
    assert two[64] <= two[16] + 1, (one, two)
    assert two[64] < one[64], (one, two)


def test_golden_iteration_counts_laplace():
    """Golden GMRES counts at the reference tolerance (1e-8) — regressions
    in Schwarz/GDSW numerics show up here first.  square.mesh P2 with
    4 overlap-1 subdomains converges in 8 iterations."""
    dom = Domain.from_file("/root/reference/meshes/square.mesh", fe_type="P2")
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    for flag in (1, 2, 3, 4):
        bcb.add_bc(lambda x, t: 0.0, flag, 0, dom, "Dirichlet", 1)
    Kb, bb = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    part = MeshPartition(dom.mesh, 4)
    prec = SchwarzPreconditioner(Kb, part.unique_map, overlap=1)
    res = gmres(Kb.matvec, bb, M=prec.apply, tol=1e-8, maxiter=200)
    assert res.converged
    assert res.iters == 8, res.iters


def test_golden_3d_navier_stokes_anchor():
    """FAST-SUITE 3D anchor (round-4 weak item 9: the DFG3D golden lives
    in the slow suite and only guards regressions when it runs): a small
    3D lid-driven cavity, P2/P1 Newton with monolithic two-level GDSW —
    Newton and per-step GMRES iteration counts pinned as goldens, plus a
    kinetic-energy observable."""
    from feddlib_tpu.problems import NavierStokes
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver
    from feddlib_tpu.utils.config import ParameterList

    pl = ParameterList("P")
    for k, v in {"Viscosity": 0.1, "Density": 1.0,
                 "Preconditioner Type": "SchwarzTwoLevel",
                 "Subdomains": 4, "Convergence Tolerance": 1e-9,
                 "Maximum Iterations": 2000,
                 "relNonLinTol": 1e-8, "MaxNonLinIts": 12}.items():
        pl[k] = v
    dom_p = Domain.structured(3, 3)
    dom_u = dom_p.p2_domain()
    prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
    prob.assemble()

    def lid(x, t):
        on_lid = jnp.isclose(x[2], 1.0)
        return jnp.where(on_lid, jnp.array([1.0, 0.0, 0.0]), jnp.zeros(3))

    prob.add_bc(lid, 1, 0)
    solver = NonLinearSolver("Newton")
    its = solver.solve(prob)
    assert its == NEWTON_3D_CAVITY, f"Newton iterations changed: {its}"
    # per-Newton-step linear iterations (golden; small drift allowed)
    lins = solver.linear_iters
    assert len(lins) == its
    assert all(abs(a - b) <= 2 for a, b in zip(lins, GMRES_3D_CAVITY)), lins
    u = np.asarray(prob.solution[0]).reshape(-1, 3)
    ke = 0.5 * float((u ** 2).sum()) / len(u)
    assert np.isclose(ke, KE_3D_CAVITY, rtol=1e-6), ke


#: goldens of the 3D cavity anchor (f64, deterministic partitions)
NEWTON_3D_CAVITY = 3
GMRES_3D_CAVITY = [22, 23, 22]
KE_3D_CAVITY = 0.07462684304806966
