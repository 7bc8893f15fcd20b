"""AMR tests — the analog of the reference's laplaceAdaptive driver
(problems/tests/laplaceAdaptive; estimator/marking/refinement from
MeshUnstructuredRefinement)."""

import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockVector
from feddlib_tpu.mesh.refine import (
    adapt, error_estimate_p1, mark_elements, refine_mesh_2d, refine_uniform)
from feddlib_tpu.mesh.structured import build_structured_mesh
from feddlib_tpu.solvers.krylov import cg

from conftest import reference_mesh


def _check_conforming(mesh):
    """Every interior edge shared by exactly 2 elements; boundary by 1."""
    edges, elem_edge = mesh.unique_edges()
    count = np.zeros(len(edges), dtype=int)
    np.add.at(count, elem_edge.ravel(), 1)
    assert set(np.unique(count)) <= {1, 2}


def _areas(mesh):
    p = mesh.points[mesh.elements[:, : mesh.dim + 1]]
    if mesh.dim == 2:
        return np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 2
    return np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 6


def test_uniform_refine_2d():
    m = build_structured_mesh(2, 2)
    r = refine_uniform(m)
    assert r.n_elements == 4 * m.n_elements
    assert np.isclose(_areas(r).sum(), 1.0)
    _check_conforming(r)
    # boundary flags survive
    b = (np.isclose(r.points[:, 0], 0) | np.isclose(r.points[:, 0], 1)
         | np.isclose(r.points[:, 1], 0) | np.isclose(r.points[:, 1], 1))
    assert (r.point_flags[b] == 1).all()
    assert (r.point_flags[~b] == 0).all()


def test_uniform_refine_3d():
    m = build_structured_mesh(3, 2)
    r = refine_uniform(m)
    assert r.n_elements == 8 * m.n_elements
    assert np.isclose(_areas(r).sum(), 1.0, atol=1e-12)
    p = r.points[r.elements]
    assert (np.linalg.det(p[:, 1:] - p[:, :1]) > 0).all()
    b = np.zeros(r.n_points, dtype=bool)
    for d in range(3):
        b |= np.isclose(r.points[:, d], 0) | np.isclose(r.points[:, d], 1)
    assert (r.point_flags[b] == 1).all()


def test_partial_refine_conforming():
    m = build_structured_mesh(2, 4)
    marked = np.zeros(m.n_elements, dtype=bool)
    marked[:5] = True
    r = refine_mesh_2d(m, marked)
    assert r.n_elements > m.n_elements
    assert np.isclose(_areas(r).sum(), 1.0)
    _check_conforming(r)


def test_estimator_flags_singularity():
    """On an L-shaped-like solution the estimator concentrates where the
    gradient varies most."""
    m = build_structured_mesh(2, 8)
    pts = m.points
    u = np.sqrt((pts[:, 0] - 0.5) ** 2 + (pts[:, 1] - 0.5) ** 2)  # |x−c|
    eta = error_estimate_p1(m, u)
    cent = pts[m.elements].mean(axis=1)
    r = np.linalg.norm(cent - 0.5, axis=1)
    near = eta[r < 0.2].mean()
    far = eta[r > 0.4].mean()
    assert near > 2 * far  # indicator concentrates at the kink


def test_amr_cycle_improves_solution():
    """Full AMR loop on Poisson with a peak source: refined solve must have
    smaller estimated error than the unrefined one."""
    mesh = build_structured_mesh(2, 6)

    def solve_on(mesh):
        dom = Domain(mesh)
        K = ops.assemble_laplace(dom)
        f = lambda x: jnp.exp(-100 * ((x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2))
        b = ops.assemble_rhs(dom, f, degree=4)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        res = cg(Kb.matvec, bb, tol=1e-10, maxiter=3000)
        return np.asarray(res.x)

    fnp = lambda x: float(np.exp(-100 * ((x[0] - .5) ** 2 + (x[1] - .5) ** 2)))
    u0 = solve_on(mesh)
    eta0 = error_estimate_p1(mesh, u0, fnp)
    m1, _ = adapt(mesh, u0, fnp, strategy="Doerfler", theta=0.6)
    assert m1.n_elements > mesh.n_elements
    _check_conforming(m1)
    u1 = solve_on(m1)
    eta1 = error_estimate_p1(m1, u1, fnp)
    assert np.sqrt((eta1 ** 2).sum()) < np.sqrt((eta0 ** 2).sum())
    # refinement concentrated at the peak
    c1 = m1.points[m1.elements].mean(axis=1)
    frac_near = np.mean(np.linalg.norm(c1 - 0.5, axis=1) < 0.25)
    c0 = mesh.points[mesh.elements].mean(axis=1)
    frac_near0 = np.mean(np.linalg.norm(c0 - 0.5, axis=1) < 0.25)
    assert frac_near > frac_near0


def test_marking_strategies():
    eta = np.array([1.0, 2.0, 3.0, 10.0])
    mk = mark_elements(eta, "Maximum", 0.5)
    np.testing.assert_array_equal(mk, [False, False, False, True])
    md = mark_elements(eta, "Doerfler", 0.5)
    assert md[3] and md.sum() <= 2
    mu = mark_elements(eta, "Uniform")
    assert mu.all()


@pytest.mark.parametrize("dim", [2, 3])
def test_bisection_refinement(dim):
    """Conforming longest-edge bisection — the 3D-capable adaptive path."""
    from feddlib_tpu.mesh.refine import refine_bisection

    m = build_structured_mesh(dim, 3 if dim == 2 else 2)
    cur = m
    for _ in range(2):
        cent = cur.points[cur.elements[:, :dim + 1]].mean(axis=1)
        order = np.argsort(np.linalg.norm(cent - 0.5, axis=1))
        marked = np.zeros(cur.n_elements, dtype=bool)
        marked[order[: max(4, cur.n_elements // 8)]] = True
        cur = refine_bisection(cur, marked)
        nv = dim + 1
        p = cur.points[cur.elements[:, :nv]]
        vols = np.abs(np.linalg.det(p[:, 1:] - p[:, :1]))
        assert np.isclose(vols.sum() / (2 if dim == 2 else 6), 1.0)
        assert vols.min() > 0
        # facet conformity
        v = cur.elements[:, :nv]
        if dim == 2:
            fl = [(0, 1), (1, 2), (0, 2)]
        else:
            fl = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]
        fac = np.concatenate([np.sort(v[:, list(f)], axis=1) for f in fl])
        _, c = np.unique(fac, axis=0, return_counts=True)
        assert set(np.unique(c)) <= {1, 2}
    assert cur.n_elements > m.n_elements


def test_3d_estimator_and_adaptive_cycle():
    """3D residual estimator (face jumps) drives adaptive bisection: a
    localized source concentrates refinement near it and the total
    estimated error decreases over cycles (the 3D analog of the
    reference's errorEstimation + tagged-edge bisection)."""
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.refine import adapt, error_estimate_p1
    from feddlib_tpu.solvers.krylov import cg

    f = lambda x: np.exp(-50.0 * ((x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2
                                  + (x[2] - 0.5) ** 2))

    dom = Domain.structured(3, 4)
    mesh = dom.mesh
    etas = []
    for cycle in range(2):
        dom = Domain(mesh)
        K = ops.assemble_laplace(dom)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        fj = lambda x: jnp.exp(-50.0 * ((x[0] - 0.5) ** 2
                                        + (x[1] - 0.5) ** 2
                                        + (x[2] - 0.5) ** 2))
        b = ops.assemble_rhs(dom, fj)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        u = np.asarray(cg(Kb.matvec, bb, tol=1e-10, maxiter=3000).x)
        eta = error_estimate_p1(mesh, u, f)
        etas.append(float(np.sqrt((eta ** 2).sum())))
        # refinement concentrates near the source
        cent = mesh.points[mesh.elements[:, :4]].mean(axis=1)
        marked_mesh, eta2 = adapt(mesh, u, f, theta=0.5, method="bisection")
        assert marked_mesh.n_elements > mesh.n_elements
        mesh = marked_mesh
    assert etas[1] < etas[0], etas


def test_blue_refinement_conforming_and_leaner():
    """Blue handles two-marked-edge triangles with 3 children; without it
    they are promoted to red (more elements).  Both must be conforming
    (reference refineBlue, MeshUnstructuredRefinement_def.hpp:1905)."""
    from feddlib_tpu.mesh.refine import refine_mesh_2d

    m = build_structured_mesh(2, 6)
    rng = np.random.default_rng(0)
    marked = np.zeros(m.n_elements, dtype=bool)
    marked[rng.choice(m.n_elements, 12, replace=False)] = True
    r_blue = refine_mesh_2d(m, marked, blue=True)
    r_red = refine_mesh_2d(m, marked, blue=False)
    _check_conforming(r_blue)
    _check_conforming(r_red)
    assert np.isclose(_areas(r_blue).sum(), 1.0)
    assert r_blue.n_elements <= r_red.n_elements
    # positive orientation everywhere
    p = r_blue.points[r_blue.elements]
    det = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
           - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0]))
    assert (det > 0).all()


def _check_conforming_3d(mesh):
    """Interior faces shared by exactly 2 tets; single faces lie on the
    unit-cube boundary; volumes sum to 1."""
    elems = mesh.elements[:, :4]
    local = [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)]
    faces = np.concatenate([np.sort(elems[:, list(lf)], axis=1)
                            for lf in local])
    uniq, counts = np.unique(faces, axis=0, return_counts=True)
    assert counts.max() <= 2
    single = uniq[counts == 1]
    cent = mesh.points[single].mean(axis=1)
    on_b = np.zeros(len(cent), dtype=bool)
    for d in range(3):
        on_b |= np.isclose(cent[:, d], 0) | np.isclose(cent[:, d], 1)
    assert on_b.all(), "hanging interior face"
    p = mesh.points[elems]
    vols = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 6
    assert np.isclose(vols.sum(), 1.0)


def test_redgreen_3d_conforming():
    """3D red-green: marked tets red-refined, neighbors green-closed by
    midpoint multisection — conforming, volume-preserving, deterministic."""
    from feddlib_tpu.mesh.refine import refine_mesh_3d

    m = build_structured_mesh(3, 3)
    rng = np.random.default_rng(1)
    marked = np.zeros(m.n_elements, dtype=bool)
    marked[rng.choice(m.n_elements, 8, replace=False)] = True
    r = refine_mesh_3d(m, marked)
    assert r.n_elements > m.n_elements
    _check_conforming_3d(r)
    # determinism
    r2 = refine_mesh_3d(m, marked)
    np.testing.assert_array_equal(r.elements, r2.elements)
    # second cycle stays conforming
    marked2 = np.zeros(r.n_elements, dtype=bool)
    marked2[rng.choice(r.n_elements, 10, replace=False)] = True
    _check_conforming_3d(refine_mesh_3d(r, marked2))


def test_p2_estimator_exact_quadratic_and_singularity():
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.refine import error_estimate_p2

    # u = Σ xᵢ² is exactly representable: f = −Δu = −2·dim ⇒ η ≈ 0
    for dim, n in ((2, 6), (3, 3)):
        dom = Domain.structured(dim, n, fe_type="P2")
        pts3 = dom.mesh.points
        u3 = (pts3 ** 2).sum(axis=1)
        eta3 = error_estimate_p2(dom.mesh, u3, lambda x: -2.0 * len(x))
        assert np.abs(eta3).max() < 1e-10, (dim, np.abs(eta3).max())

    dom = Domain.structured(2, 6, fe_type="P2")
    pts = dom.mesh.points
    u = pts[:, 0] ** 2 + pts[:, 1] ** 2
    eta = error_estimate_p2(dom.mesh, u, lambda x: -4.0)
    assert np.abs(eta).max() < 1e-10
    # kinked solution: estimator concentrates near the kink
    u2 = np.sqrt((pts[:, 0] - 0.5) ** 2 + (pts[:, 1] - 0.5) ** 2 + 1e-12)
    eta2 = error_estimate_p2(dom.mesh, u2)
    cent = pts[dom.mesh.elements[:, :3]].mean(axis=1)
    r = np.linalg.norm(cent - 0.5, axis=1)
    assert eta2[r < 0.2].mean() > 2 * eta2[r > 0.4].mean()


def test_amr_3d_beats_uniform():
    """Adaptive 3D red-green reaches a lower total estimated error than
    uniform refinement at comparable (or fewer) elements (VERDICT item 9
    acceptance)."""
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.refine import (error_estimate_p1, mark_elements,
                                         refine_mesh_3d, refine_uniform)
    from feddlib_tpu.solvers.krylov import cg

    def solve_on(mesh):
        dom = Domain(mesh)
        K = ops.assemble_laplace(dom)
        f = lambda x: jnp.exp(-60 * jnp.sum((x - 0.3) ** 2))
        b = ops.assemble_rhs(dom, f, degree=4)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        return np.asarray(cg(Kb.matvec, bb, tol=1e-10, maxiter=3000).x)

    fnp = lambda x: float(np.exp(-60 * np.sum((x - 0.3) ** 2)))
    mesh = build_structured_mesh(3, 4)
    # two adaptive cycles
    cur = mesh
    for _ in range(2):
        u = solve_on(cur)
        eta = error_estimate_p1(cur, u, fnp)
        cur = refine_mesh_3d(cur, mark_elements(eta, "Doerfler", 0.6))
    u_ad = solve_on(cur)
    eta_ad = np.sqrt((error_estimate_p1(cur, u_ad, fnp) ** 2).sum())
    # one uniform cycle (8x elements)
    uni = refine_uniform(mesh)
    u_un = solve_on(uni)
    eta_un = np.sqrt((error_estimate_p1(uni, u_un, fnp) ** 2).sum())
    assert cur.n_elements < uni.n_elements
    assert eta_ad < eta_un, (eta_ad, eta_un, cur.n_elements, uni.n_elements)


def test_amr_distributed_loop():
    """AMR under 'Use Distributed Solve': 2 adaptive cycles re-partition
    the refined mesh and rebuild all plans; the estimated error decays
    monotonically, and the refinement history is IDENTICAL to the serial
    loop (the replicated-mesh closure is partition-count independent —
    MeshUnstructuredRefinement_decl.hpp:90-99 reconciliation parity)."""
    from feddlib_tpu.solvers.refinement import adaptive_solve_cycles
    from feddlib_tpu.utils.config import ParameterList

    mesh = build_structured_mesh(2, 6)

    def f(x):
        return jnp.exp(-100 * ((x[0] - 0.5) ** 2 + (x[1] - 0.5) ** 2))

    def f_np(x):
        return float(np.exp(-100 * ((x[0] - .5) ** 2 + (x[1] - .5) ** 2)))

    base = {"Preconditioner Type": "SchwarzOneLevel", "Subdomains": 4,
            "Convergence Tolerance": 1e-10, "Maximum Iterations": 2000}
    hist = {}
    for mode in ("serial", "dist", "dist_amr"):
        pl = ParameterList("P")
        opts = dict(base)
        if mode != "serial":
            opts.update({"Use Distributed Solve": True, "Devices": 4,
                         "Use Device Pipeline": True})
        if mode == "dist_amr":
            # fully distributed AMR: per-part estimate + allreduce marking
            # + per-part refine with tagged-edge reconciliation
            opts["Use Distributed AMR"] = True
        for k, v in opts.items():
            pl[k] = v
        hist[mode] = adaptive_solve_cycles(mesh, f, cycles=3, theta=0.6,
                                           params=pl, source_np=f_np)
    for h in hist.values():
        assert h[1]["eta"] < h[0]["eta"]
        assert h[2]["eta"] < h[1]["eta"]
        assert h[2]["n_elements"] > h[0]["n_elements"]
    # identical refinement history across all three backends
    for mode in ("dist", "dist_amr"):
        assert [c["n_elements"] for c in hist[mode]] == \
            [c["n_elements"] for c in hist["serial"]], mode
        for a, b in zip(hist[mode], hist["serial"]):
            assert np.isclose(a["eta"], b["eta"], rtol=1e-8)


def test_distributed_estimate_matches_serial():
    """Per-part estimation (owned elements + one ghost layer, the ∇u
    exchange of the jump terms) concatenates to EXACTLY the serial
    estimator — no replicated-element estimate at n_parts>1."""
    import jax.numpy as jnp
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.mesh.refine import (error_estimate_p1,
                                         estimate_distributed)
    from feddlib_tpu.mesh.structured import build_structured_mesh

    mesh = build_structured_mesh(2, 12)
    dom = Domain(mesh)
    rng = np.random.default_rng(0)
    u = rng.standard_normal(mesh.n_points)

    def f(x):
        return float(np.sin(x[0]) + x[1])

    eta_ser = error_estimate_p1(mesh, u, f)
    for n_parts in (3, 5):
        part = MeshPartition(mesh, n_parts)
        eta_parts = estimate_distributed(mesh, part, u, f)
        for p in range(n_parts):
            np.testing.assert_allclose(
                eta_parts[p], eta_ser[np.asarray(part.elem_ids[p])],
                rtol=1e-12, atol=1e-14)


def test_distributed_mark_matches_serial():
    """Distributed marking uses only allreduce-style scalars: Maximum is
    exact; Doerfler's bisected threshold reproduces the serial marked set
    on generic (non-tied) indicator values."""
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.mesh.refine import mark_distributed, mark_elements
    from feddlib_tpu.mesh.structured import build_structured_mesh

    mesh = build_structured_mesh(2, 10)
    rng = np.random.default_rng(1)
    eta = rng.random(mesh.n_elements)
    part = MeshPartition(mesh, 4)
    eids = [np.asarray(part.elem_ids[p]) for p in range(4)]
    for strategy in ("Maximum", "Doerfler"):
        ser = mark_elements(eta, strategy=strategy, theta=0.5)
        parts = mark_distributed([eta[e] for e in eids],
                                 strategy=strategy, theta=0.5)
        got = np.zeros(mesh.n_elements, bool)
        for p in range(4):
            got[eids[p]] = parts[p]
        assert np.array_equal(got, ser), strategy


def _canon_hash(mesh):
    """Geometry-canonical mesh hash: sorted element corner coordinates
    (numbering- and orientation-insensitive)."""
    import hashlib

    v = np.round(mesh.points[mesh.elements], 12)  # [E, 3, 2]
    v = v.reshape(len(v), -1, 2)
    # canonical per-element vertex order, then canonical element order
    key = np.array([sorted(map(tuple, e)) for e in v]).reshape(len(v), -1)
    order = np.lexsort(key.T[::-1])
    return hashlib.sha1(key[order].tobytes()).hexdigest()


@pytest.mark.parametrize("blue", [True, False])
def test_distributed_refine_partition_invariant(blue):
    """Per-part refinement with cross-part tagged-edge reconciliation
    produces the SAME refined geometry at every partition count, equal to
    the serial refine (reference tagged-edge reconciliation,
    MeshUnstructuredRefinement_decl.hpp:90-99)."""
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.mesh.refine import (refine_distributed_2d,
                                         refine_mesh_2d)
    from feddlib_tpu.mesh.structured import build_structured_mesh

    mesh = build_structured_mesh(2, 8)
    rng = np.random.default_rng(2)
    marked = rng.random(mesh.n_elements) < 0.25

    ser = refine_mesh_2d(mesh, np.flatnonzero(marked), blue=blue)
    h_ser = _canon_hash(ser)
    for n_parts in (1, 4, 7):
        part = MeshPartition(mesh, n_parts)
        mp = [marked[np.asarray(part.elem_ids[p])]
              for p in range(n_parts)]
        ref, exchanged = refine_distributed_2d(mesh, part, mp, blue=blue)
        assert _canon_hash(ref) == h_ser, n_parts
        if n_parts > 1:
            # reconciliation moved only O(cut) tags
            assert sum(exchanged) < mesh.n_elements
    # positive areas everywhere (orientation fix)
    p = ref.points[ref.elements]
    d = ((p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
         - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0]))
    assert (d > 0).all()
