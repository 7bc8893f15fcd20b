"""One-level overlapping Schwarz tests (FROSch AlgebraicOverlappingOperator
equivalent)."""

import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.mesh.partition import MeshPartition
from feddlib_tpu.precond.schwarz import SchwarzPreconditioner, grow_overlap
from feddlib_tpu.solvers.krylov import cg, gmres


@pytest.fixture(scope="module")
def poisson():
    dom = Domain.structured(2, 16)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    ref = gmres(Kb.matvec, bb, tol=1e-8, maxiter=500)
    return dom, Kb, bb, ref


def test_overlap_growth():
    dom = Domain.structured(2, 8)
    K = ops.assemble_laplace(dom)
    sp = K.to_scipy()
    part = MeshPartition(dom.mesh, 4)
    owned = part.unique_map.partition_indices[0]
    ov0 = grow_overlap(sp, owned, 0)
    ov1 = grow_overlap(sp, owned, 1)
    ov2 = grow_overlap(sp, owned, 2)
    assert len(ov0) == len(owned)
    assert len(ov1) > len(ov0)
    assert len(ov2) > len(ov1)
    assert np.all(np.isin(ov0, ov1)) and np.all(np.isin(ov1, ov2))


@pytest.mark.parametrize("combine", ["Restricted", "Averaging", "Full"])
def test_schwarz_accelerates_gmres(poisson, combine):
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, 4)
    prec = SchwarzPreconditioner(Kb, part.unique_map, overlap=1,
                                 combine=combine)
    res = gmres(Kb.matvec, bb, M=prec.apply, tol=1e-8, maxiter=500)
    assert res.converged
    assert res.iters < ref.iters  # must beat unpreconditioned
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               atol=1e-7)


def test_schwarz_exact_single_subdomain(poisson):
    """With one subdomain and no overlap the Schwarz apply is a direct
    solve: GMRES converges in 1-2 iterations."""
    dom, Kb, bb, ref = poisson
    from feddlib_tpu.la.map import IndexMap

    umap = IndexMap.contiguous(dom.n_nodes, 1)
    prec = SchwarzPreconditioner(Kb, umap, overlap=0, combine="Restricted")
    res = gmres(Kb.matvec, bb, M=prec.apply, tol=1e-8, maxiter=10)
    assert res.converged
    assert res.iters <= 2


def test_overlap_reduces_iterations(poisson):
    dom, Kb, bb, ref = poisson
    part = MeshPartition(dom.mesh, 8)
    iters = []
    for ov in (0, 1, 2):
        prec = SchwarzPreconditioner(Kb, part.unique_map, overlap=ov,
                                     combine="Restricted")
        res = gmres(Kb.matvec, bb, M=prec.apply, tol=1e-8, maxiter=500)
        iters.append(res.iters)
    assert iters[1] <= iters[0]
    assert iters[2] <= iters[1]


def test_monolithic_block_gdsw_stokes():
    """Two-level monolithic GDSW on the Stokes saddle point (block-diagonal
    Φ: velocity translations + pressure constants — the FROSch-monolithic
    analog) must beat one-level Schwarz at 16 subdomains and must NOT fall
    back to one level."""
    import warnings

    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems import Stokes
    from feddlib_tpu.utils.config import ParameterList

    def params(**kw):
        p = ParameterList("p")
        for k, v in kw.items():
            p[k] = v
        return p

    iters = {}
    for prec in ("SchwarzOneLevel", "SchwarzTwoLevel"):
        dom_p = Domain.structured(2, 16)
        dom_u = dom_p.p2_domain()
        prob = Stokes(dom_u, dom_p, parameter_list=params(
            Viscosity=1.0, **{"Preconditioner Type": prec, "Subdomains": 16,
                              "Maximum Iterations": 4000}))
        prob.assemble()
        prob.add_bc(lambda x, t: jnp.where(
            jnp.isclose(x[1], 1.0), jnp.array([1.0, 0.0]), jnp.zeros(2)),
            1, 0)
        dom_p.mesh.point_flags = dom_p.mesh.point_flags.copy()
        dom_p.mesh.point_flags[0] = 77
        prob.bc_builder.add_bc(lambda x, t: 0.0, 77, 1, dom_p, "Dirichlet", 1)
        prob.set_boundaries_rhs()
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # fallback warning = failure
            iters[prec] = prob.solve()
        assert prob.last_relres <= 1e-8
    assert iters["SchwarzTwoLevel"] < iters["SchwarzOneLevel"], iters


def test_rgdsw_coarse_space():
    """RGDSW / IPOUHarmonic (reduced, vertex-based coarse space with a
    partition of unity — FROSch RGDSWCoarseOperator): much smaller coarse
    dimension than classic GDSW with comparable, FLAT iteration counts.
    Measured goldens: 64 subdomains on 48² → GDSW dim 161 / 23 its,
    RGDSW dim 49 / 25 its."""
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 48)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    Kb, bb = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 64)
    dims, its = {}, {}
    for var in ("GDSW", "RGDSW"):
        tl = TwoLevelSchwarz(Kb, part.unique_map,
                             part.repeated_map.partition_indices,
                             dom.mesh.points, 1, overlap=1,
                             dirichlet_mask=dmask, variant=var)
        dims[var] = tl.coarse.n_coarse
        its[var] = gmres(Kb.matvec, bb, M=tl.apply, tol=1e-8,
                         maxiter=500).iters
    assert dims["RGDSW"] * 2 < dims["GDSW"], dims
    assert its["RGDSW"] <= its["GDSW"] + 5, its


def test_rgdsw_xml_translation():
    """'CoarseOperator Type: IPOUHarmonicCoarseOperator' in a reference
    prec XML selects the RGDSW variant."""
    from feddlib_tpu.utils.reference_compat import load_reference_configs

    pl = load_reference_configs(
        prec_xml="/root/reference/feddlib/problems/tests/laplace/"
                 "parametersPrec.xml")
    assert "Coarse Space Variant" in pl
    assert pl["Coarse Space Variant"] in ("GDSW", "RGDSW")


def test_multiplicative_level_combination():
    """'Level Combination: Multiplicative' (FROSch): coarse correction on
    the level-1-updated residual must converge in no more iterations than
    additive, and the operator-protocol form must match .apply exactly."""
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz
    from feddlib_tpu.solvers.krylov import gmres

    dom = Domain.structured(2, 32)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    Kb, bb = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    dmask = bcb.dirichlet_mask(0, dom.n_nodes)
    part = MeshPartition(dom.mesh, 16)
    its = {}
    for lc in ("Additive", "Multiplicative"):
        tl = TwoLevelSchwarz(Kb, part.unique_map,
                             part.repeated_map.partition_indices,
                             dom.mesh.points, 1, overlap=1,
                             dirichlet_mask=dmask, level_combination=lc)
        r = jnp.asarray(np.random.default_rng(7).standard_normal(Kb.shape[0]))
        fn, ops_ = tl.operator()
        np.testing.assert_allclose(np.asarray(fn(ops_, r)),
                                   np.asarray(tl.apply(r)), atol=1e-12)
        its[lc] = gmres(Kb.matvec, bb, M=tl.apply, tol=1e-8,
                        maxiter=500).iters
    assert its["Multiplicative"] <= its["Additive"], its


def test_gdsw_elasticity_rotations():
    """SURVEY M3 acceptance: 2D linear elasticity with the elasticity null
    space (translations + rotation) — the coarse space carries 3 functions
    per interface component and two-level beats one-level at 16
    subdomains."""
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems import LinElas
    from feddlib_tpu.utils.config import ParameterList

    def params(**kw):
        p = ParameterList("p")
        for k, v in kw.items():
            p[k] = v
        return p

    its = {}
    for prec in ("SchwarzOneLevel", "SchwarzTwoLevel"):
        dom = Domain.structured(2, 24)
        prob = LinElas(dom, parameter_list=params(
            E=10.0, **{"Poisson Ratio": 0.3, "Preconditioner Type": prec,
                       "Subdomains": 16, "Null Space Type": "Elasticity",
                       "Maximum Iterations": 3000,
                       "Convergence Tolerance": 1e-8}))
        prob.assemble()
        # clamp the left edge only → rigid-body modes matter
        dom.mesh.point_flags = dom.mesh.point_flags.copy()
        left = np.isclose(dom.mesh.points[:, 0], 0.0)
        dom.mesh.point_flags[left] = 8
        prob.add_bc(lambda x, t: jnp.zeros(2), 8, 0)
        prob.assemble_source(lambda x: jnp.array([0.0, -1.0]))
        prob.set_boundaries_rhs()
        its[prec] = prob.solve()
        assert prob.last_relres <= 1e-8
    assert its["SchwarzTwoLevel"] < its["SchwarzOneLevel"], its


def test_padded_two_level_matches_serial():
    """PaddedTwoLevelSchwarz (the TPU padded-cluster two-level apply:
    batched MXU restrict/prolong + plan-matrix SELL reduce + one-hot
    spread) equals TwoLevelSchwarz(overlap=1, Restricted) conjugated by
    the padding permutation."""
    import jax.numpy as jnp

    from feddlib_tpu.fe.host_assembly import host_poisson_dirichlet
    from feddlib_tpu.la.csr import CsrMatrix
    from feddlib_tpu.la.dense_blocks import DenseBlockSpMV
    from feddlib_tpu.precond.cluster_coarse import PaddedTwoLevelSchwarz
    from feddlib_tpu.precond.gdsw import TwoLevelSchwarz

    dom = Domain.structured(3, 8)
    Kb_sp, _ = host_poisson_dirichlet(dom)
    Kb = CsrMatrix.from_scipy(Kb_sp)
    part = MeshPartition(dom.mesh, 8)
    db = DenseBlockSpMV.from_csr(Kb, part.unique_map.owner_of(),
                                 dtype=jnp.float64)
    mask = np.asarray(dom.mesh.point_flags) == 1
    ptl = PaddedTwoLevelSchwarz(Kb, part, db, dirichlet_mask=mask,
                                dtype=jnp.float64,
                                level_combination="Multiplicative")
    assert ptl.n_coarse > 0
    ref = TwoLevelSchwarz(
        Kb, part.unique_map,
        node_part_sets=[np.asarray(ix)
                        for ix in part.repeated_map.partition_indices],
        points=dom.mesh.points, overlap=1, combine="Restricted",
        dirichlet_mask=mask, level_combination="Multiplicative")
    r = np.random.default_rng(0).standard_normal(Kb.shape[0])
    z_ref = np.asarray(ref.apply(jnp.asarray(r)))
    fn, ops = ptl.padded_operator()
    z = np.asarray(db.from_padded(fn(ops, db.to_padded(jnp.asarray(r)))))
    assert np.abs(z - z_ref).max() / np.abs(z_ref).max() < 1e-12


def test_mixed_precision_two_level_cuts_iterations():
    """'Use Mixed Precision' + TwoLevel: the padded GDSW coarse level cuts
    inner GMRES iterations vs one level and still reaches 1e-8."""
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems.laplace import Laplace
    from feddlib_tpu.utils.config import ParameterList

    def run(two_level):
        pl = ParameterList("P", {"Preconditioner Type": "SchwarzOneLevel",
                            "Clusters": 32,
                            "Use Mixed Precision": True,
                            "TwoLevel": two_level})
        dom = Domain.structured(3, 20)
        prob = Laplace(dom, parameter_list=pl)
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
        prob.add_bc(lambda x, t: 0.0, 1, 0)
        prob.set_boundaries_rhs()
        iters = prob.solve()
        return iters, prob.last_relres

    it1, r1 = run(False)
    it2, r2 = run(True)
    assert r1 <= 1e-8 and r2 <= 1e-8
    assert it2 < it1


def test_dense_block_schwarz_cholesky_device_factor():
    """The batched-Cholesky device factorization (SPD subdomains) matches
    the host-LU owned-row inverses; a nonsymmetric matrix falls back to
    the batched LU solve."""
    import jax.numpy as jnp
    from feddlib_tpu.fe import ops as fops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.dense_blocks import DenseBlockSchwarz, DenseBlockSpMV
    from feddlib_tpu.mesh.partition import partition_points

    dom = Domain.structured(2, 10)
    K = fops.assemble_laplace(dom)
    cluster = partition_points(dom.mesh.points, 8)
    db = DenseBlockSpMV.from_csr(K, cluster, dtype=jnp.float32)
    host = DenseBlockSchwarz(K, db, dtype=jnp.float32, device_factor=False)
    dev = DenseBlockSchwarz(K, db, dtype=jnp.float32, device_factor=True)
    # device path adds a 1e-6 diagonal shift; compare applies loosely
    rng = np.random.default_rng(0)
    rp = jnp.asarray(rng.standard_normal(db.P * db.R), jnp.float32)
    zh = np.asarray(host.apply_padded(rp))
    zd = np.asarray(dev.apply_padded(rp))
    assert np.abs(zh - zd).max() < 1e-3 * np.abs(zh).max()

    # nonsymmetric: advection-dominated operator → LU fallback still exact
    Kn = fops.assemble_laplace(dom)
    import scipy.sparse as sps

    spn = Kn.to_scipy().tolil()
    spn[0, 1] += 0.5  # break symmetry
    from feddlib_tpu.la.csr import CsrMatrix

    Kn2 = CsrMatrix.from_scipy(spn.tocsr())
    db2 = DenseBlockSpMV.from_csr(Kn2, cluster, dtype=jnp.float32)
    host2 = DenseBlockSchwarz(Kn2, db2, dtype=jnp.float32,
                              device_factor=False)
    dev2 = DenseBlockSchwarz(Kn2, db2, dtype=jnp.float32,
                             device_factor=True)
    z2h = np.asarray(host2.apply_padded(rp))
    z2d = np.asarray(dev2.apply_padded(rp))
    assert np.abs(z2h - z2d).max() < 1e-3 * np.abs(z2h).max()


def test_saddle_point_subdomain_pressure_pinning():
    """_robust_inverse pins one zero-diagonal (pressure) dof — exact
    constant-pressure deflation — before falling back to diagonal shifts.
    (Overlap-truncated Stokes subdomain blocks are usually regularized by
    the RAS truncation itself; the fallback covers the exactly singular
    cases the reference hands to KLU pivot perturbation.)"""
    import warnings
    from feddlib_tpu.precond import schwarz as sz

    # exactly singular saddle block: velocity part SPD, pressure row/col
    # couple but the pressure "mass" diagonal is zero and the div rows are
    # linearly dependent (constant-pressure mode)
    rng = np.random.default_rng(0)
    n_u, n_p = 12, 3
    Q = rng.standard_normal((n_u, n_u))
    Auu = Q @ Q.T + n_u * np.eye(n_u)
    Bp = rng.standard_normal((n_p - 1, n_u))
    B = np.vstack([Bp, -Bp.sum(axis=0)])  # rows sum to 0: B^T 1 in range
    # make the pressure null space exact: columns of B^T annihilated by 1
    blk = np.zeros((n_u + n_p, n_u + n_p))
    blk[:n_u, :n_u] = Auu
    blk[:n_u, n_u:] = B.T
    blk[n_u:, :n_u] = B
    ones = np.zeros(n_u + n_p)
    ones[n_u:] = 1.0
    assert np.abs(blk @ ones).max() < 1e-12  # exact null vector
    before = dict(sz.ROBUST_INVERSE_STATS)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        inv = sz._robust_inverse(blk)
    after = dict(sz.ROBUST_INVERSE_STATS)
    assert after["pinned"] == before["pinned"] + 1
    assert after["shifted"] == before["shifted"]
    # pinning keeps the inverse bounded (a raw inverse of the singular
    # block would carry ~1/eps entries) ...
    assert np.isfinite(inv).all() and np.abs(inv).max() < 1e4
    # ... and it is an effective preconditioner for the compatible
    # singular system: GMRES drives the residual to zero quickly
    import jax.numpy as jnp
    from feddlib_tpu.solvers.krylov import gmres

    b = rng.standard_normal(n_u + n_p)
    b = b - (ones @ b / (ones @ ones)) * ones  # project off the null space
    res = gmres(lambda x: jnp.asarray(blk) @ x, jnp.asarray(b),
                M=lambda r: jnp.asarray(inv) @ r, tol=1e-10, maxiter=60)
    r = blk @ np.asarray(res.x) - b
    assert np.linalg.norm(r) < 1e-8 * np.linalg.norm(b)
