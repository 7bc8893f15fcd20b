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
