import numpy as np
import pytest

from feddlib_tpu.mesh.io import read_mesh, write_mesh
from feddlib_tpu.mesh.p2 import build_p2_mesh
from feddlib_tpu.mesh.structured import build_structured_mesh

from conftest import reference_mesh


def test_read_square():
    m = read_mesh(reference_mesh("square.mesh"))
    assert m.dim == 2
    assert m.n_points == 29
    assert m.n_elements > 0
    assert m.elements.max() < m.n_points
    # boundary nodes carry nonzero flags in this mesh
    assert (m.point_flags > 0).any()


def test_read_cube():
    m = read_mesh(reference_mesh("cube_131.mesh"))
    assert m.dim == 3
    assert m.n_points == 131
    # positively oriented volume sums to cube volume
    p = m.points[m.elements]
    vols = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 6.0
    assert np.isclose(vols.sum(), 1.0, rtol=1e-6)


def test_structured_2d():
    m = build_structured_mesh(2, 4)
    assert m.n_points == 25
    assert m.n_elements == 32
    p = m.points[m.elements]
    areas = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 2.0
    assert np.isclose(areas.sum(), 1.0)
    assert (m.point_flags == 1).sum() == 16  # boundary nodes of 5x5 grid


def test_structured_3d():
    m = build_structured_mesh(3, 3)
    assert m.n_points == 64
    assert m.n_elements == 27 * 6
    p = m.points[m.elements]
    vols = np.linalg.det(p[:, 1:] - p[:, :1]) / 6.0
    assert (vols > 0).all()  # orientation enforced
    assert np.isclose(vols.sum(), 1.0)
    # boundary facet count of a 3-cube: 6 faces * 9 quads * 2 tris
    assert len(m.surfaces) == 108


def test_p2_mesh_2d():
    m1 = build_structured_mesh(2, 2)
    m2 = build_p2_mesh(m1)
    edges, _ = m1.unique_edges()
    assert m2.n_points == m1.n_points + len(edges)
    assert m2.elements.shape[1] == 6
    # midpoints are true edge midpoints
    mid = m2.points[m1.n_points:]
    expect = 0.5 * (m1.points[m2.p2_edges[:, 0]] + m1.points[m2.p2_edges[:, 1]])
    np.testing.assert_allclose(mid, expect)
    # boundary midpoint flags inherited from surfaces
    on_b = np.isclose(mid[:, 0], 0) | np.isclose(mid[:, 0], 1) | \
        np.isclose(mid[:, 1], 0) | np.isclose(mid[:, 1], 1)
    assert (m2.point_flags[m1.n_points:][on_b] == 1).all()
    assert (m2.point_flags[m1.n_points:][~on_b] == 0).all()


def test_p2_mesh_3d():
    m1 = build_structured_mesh(3, 2)
    m2 = build_p2_mesh(m1)
    assert m2.elements.shape[1] == 10
    edges, _ = m1.unique_edges()
    assert m2.n_points == m1.n_points + len(edges)


def test_dual_graph():
    m = build_structured_mesh(2, 2)
    indptr, indices = m.dual_graph()
    # interior diagonal edges: each quad's two triangles are adjacent
    deg = np.diff(indptr)
    assert deg.max() <= 3
    assert deg.min() >= 1
    # symmetry
    import scipy.sparse as sps

    A = sps.csr_matrix((np.ones(len(indices)), indices, indptr),
                       shape=(m.n_elements, m.n_elements))
    assert (A != A.T).nnz == 0


def test_surface_to_element():
    m = build_structured_mesh(2, 3)
    s2e = m.surface_to_element_map()
    assert (s2e >= 0).all()
    for s, e in zip(m.surfaces, s2e):
        assert set(s).issubset(set(m.elements[e]))


def test_write_roundtrip(tmp_path):
    m = build_structured_mesh(2, 3)
    path = str(tmp_path / "t.mesh")
    write_mesh(m, path)
    m2 = read_mesh(path)
    np.testing.assert_allclose(m.points, m2.points)
    np.testing.assert_array_equal(m.elements, m2.elements)
    np.testing.assert_array_equal(m.point_flags, m2.point_flags)


def test_backward_facing_step():
    from feddlib_tpu.mesh.structured import build_backward_facing_step

    m = build_backward_facing_step(2, h=0.1)
    p = m.points[m.elements]
    areas = np.abs(np.linalg.det(p[:, 1:] - p[:, :1])) / 2
    assert np.isclose(areas.sum(), 3.5)  # duct 0.5 + channel 3.0
    edges, ee = m.unique_edges()
    cnt = np.zeros(len(edges), dtype=int)
    np.add.at(cnt, ee.ravel(), 1)
    assert set(np.unique(cnt)) == {1, 2}  # conforming glue
    assert (m.point_flags[np.isclose(m.points[:, 0], 0.0)] == 2).all()
    assert (m.point_flags[np.isclose(m.points[:, 0], 4.0)] == 3).all()


def test_rcm_mesh_reorder_preserves_solution():
    """reorder='rcm' renumbers nodes (banded patterns for the TPU SpMV
    formats) without changing the FE problem: solution values at matching
    coordinates are identical."""
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.mesh import reorder_mesh_rcm
    from feddlib_tpu.solvers.krylov import cg

    def solve(dom):
        K = ops.assemble_laplace(dom)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        return np.asarray(cg(Kb.matvec, bb, tol=1e-12, maxiter=2000).x)

    dom0 = Domain.from_file(reference_mesh("cube_131.mesh"))
    dom1 = Domain.from_file(reference_mesh("cube_131.mesh"), reorder="rcm")
    _, perm = reorder_mesh_rcm(dom0.mesh)
    u0 = solve(dom0)
    u1 = solve(dom1)
    # same solution at the permuted positions
    np.testing.assert_allclose(u1, u0[perm], atol=1e-10)
    # bandwidth actually reduced
    def bandwidth(m):
        el = m.elements
        return int((el.max(axis=1) - el.min(axis=1)).max())
    assert bandwidth(dom1.mesh) < bandwidth(dom0.mesh)
