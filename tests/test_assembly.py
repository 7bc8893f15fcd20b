import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.block import BlockVector
from feddlib_tpu.solvers.krylov import cg

from conftest import reference_mesh


@pytest.mark.parametrize("dim,fe", [(2, "P1"), (2, "P2"), (3, "P1"), (3, "P2")])
def test_stiffness_properties(dim, fe):
    dom = Domain.structured(dim, 3 if dim == 2 else 2, fe_type=fe)
    K = ops.assemble_laplace(dom)
    Kd = np.asarray(K.to_scipy().todense())
    # symmetry + zero row sums (constants in the kernel)
    np.testing.assert_allclose(Kd, Kd.T, atol=1e-12)
    np.testing.assert_allclose(Kd.sum(axis=1), 0.0, atol=1e-12)


@pytest.mark.parametrize("dim,fe", [(2, "P1"), (2, "P2"), (3, "P1"), (3, "P2")])
def test_mass_total(dim, fe):
    dom = Domain.structured(dim, 3 if dim == 2 else 2, fe_type=fe)
    M = ops.assemble_mass(dom)
    total = float(jnp.sum(M.data))
    assert np.isclose(total, 1.0, atol=1e-12)  # measure of the unit domain


def test_laplace_exact_linear():
    """Discrete Laplace reproduces a linear harmonic solution exactly."""
    dom = Domain.structured(2, 5)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: x[0] + 2 * x[1], 1, 0, dom, "Dirichlet", 1)
    Kb, rhs = bcb.apply_symmetric(K, jnp.zeros(dom.n_nodes), 0)
    res = cg(Kb.matvec, rhs, tol=1e-12, maxiter=500)
    exact = dom.mesh.points[:, 0] + 2 * dom.mesh.points[:, 1]
    np.testing.assert_allclose(np.asarray(res.x), exact, atol=1e-9)


@pytest.mark.parametrize("fe,rate", [("P1", 2.0), ("P2", 3.0)])
def test_poisson_convergence(fe, rate):
    """-Δu = f with u = sin(πx)sin(πy): L2 error rate h^(p+1)."""
    errs = []
    for n in (4, 8, 16):
        dom = Domain.structured(2, n, fe_type=fe)
        K = ops.assemble_laplace(dom)
        f = lambda x: 2 * jnp.pi ** 2 * jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])
        b = ops.assemble_rhs(dom, f, degree=6)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        res = cg(Kb.matvec, bb, tol=1e-12, maxiter=2000)
        exact = np.sin(np.pi * dom.mesh.points[:, 0]) * np.sin(
            np.pi * dom.mesh.points[:, 1])
        # nodal max error as L2 proxy (mass-weighted)
        M = ops.assemble_mass(dom)
        e = np.asarray(res.x) - exact
        errs.append(float(np.sqrt(e @ np.asarray(M.matvec(jnp.asarray(e))))))
    order1 = np.log2(errs[0] / errs[1])
    order2 = np.log2(errs[1] / errs[2])
    assert order2 > rate - 0.35, (errs, order1, order2)


def test_poisson_unstructured_square():
    """2D Poisson on the reference square.mesh (BASELINE config #1 shape)."""
    dom = Domain.from_file(reference_mesh("square.mesh"))
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    for flag in (1, 2, 3, 4):
        bcb.add_bc(lambda x, t: x[0] * 1.0, flag, 0, dom, "Dirichlet", 1)
    Kb, rhs = bcb.apply_symmetric(K, jnp.zeros(dom.n_nodes), 0)
    res = cg(Kb.matvec, rhs, tol=1e-10, maxiter=500)
    # u = x is harmonic and linear → reproduced exactly
    np.testing.assert_allclose(np.asarray(res.x), dom.mesh.points[:, 0],
                               atol=1e-8)
    assert res.converged


def test_elasticity_rigid_body():
    """Elasticity stiffness annihilates rigid-body modes (translations +
    rotation)."""
    dom = Domain.structured(2, 3)
    mu, lam = ops.lame_parameters(E=1.0, nu=0.3)
    K = ops.assemble_lin_elasticity(dom, mu, lam)
    pts = dom.mesh.points
    n = dom.n_nodes
    tx = np.zeros(2 * n)
    tx[0::2] = 1.0
    ty = np.zeros(2 * n)
    ty[1::2] = 1.0
    rot = np.zeros(2 * n)
    rot[0::2] = -pts[:, 1]
    rot[1::2] = pts[:, 0]
    for v in (tx, ty, rot):
        r = np.asarray(K.matvec(jnp.asarray(v)))
        assert np.abs(r).max() < 1e-12


def test_divergence_constant_field():
    """B applied to a constant velocity field vanishes (div const = 0)."""
    dom_p = Domain.structured(2, 3)
    dom_u = dom_p.p2_domain()
    B, BT = ops.assemble_divergence(dom_u, dom_p)
    u = np.zeros(dom_u.n_dofs(2))
    u[0::2] = 3.0
    u[1::2] = -2.0
    r = np.asarray(B.matvec(jnp.asarray(u)))
    assert np.abs(r).max() < 1e-12
    assert B.shape == (dom_p.n_nodes, dom_u.n_dofs(2))
    assert BT.shape == (dom_u.n_dofs(2), dom_p.n_nodes)


def test_advection_skew():
    """For div-free u and zero-boundary fields, N(u) is skew-symmetric-ish:
    check N(u) acting on constants gives 0."""
    dom = Domain.structured(2, 3, fe_type="P2")
    u = np.zeros(dom.n_dofs(2))
    u[0::2] = 1.0  # constant velocity
    N = ops.assemble_advection(dom, jnp.asarray(u))
    c = np.zeros(dom.n_dofs(2))
    c[0::2] = 1.0
    c[1::2] = 2.0
    r = np.asarray(N.matvec(jnp.asarray(c)))
    assert np.abs(r).max() < 1e-12  # gradient of a constant field


def test_surface_rhs_total():
    """∫_Γ 1 over flag-1 boundary equals its length (unit square: 4)."""
    dom = Domain.structured(2, 4)
    g = ops.assemble_surface_rhs(dom, lambda x: 1.0, flag=1)
    assert np.isclose(float(jnp.sum(g)), 4.0, atol=1e-12)


def test_mass_p2_total():
    dom = Domain.structured(2, 3, fe_type="P2")
    M = ops.assemble_mass(dom, dofs_per_node=2)
    total = float(jnp.sum(M.data))
    assert np.isclose(total, 2.0, atol=1e-12)  # 2 components × area 1


def test_fast_assembly_matches_classic():
    """Element-last TPU kernels (fe/fast_assembly.py) produce the SAME CSR
    matrix as the classic element-major einsum path, for P1/P2 in 2D/3D,
    and the triple-f32 scatter equals segment_sum to summation-order
    roundoff."""
    import os

    import jax.numpy as jnp

    from feddlib_tpu.fe import fast_assembly as fa
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.csr import assemble_csr_data_tri

    os.environ["FEDD_FAST_ASSEMBLY"] = "1"
    try:
        for dim, ft in [(2, "P1"), (2, "P2"), (3, "P1"), (3, "P2")]:
            dom = (Domain.structured(dim, 5) if ft == "P1"
                   else Domain.structured(dim, 5).p2_domain())
            Kf = fa.assemble_fast(dom, "laplace")
            Mf = fa.assemble_fast(dom, "mass")
            os.environ["FEDD_FAST_ASSEMBLY"] = "0"
            dom2 = (Domain.structured(dim, 5) if ft == "P1"
                    else Domain.structured(dim, 5).p2_domain())
            Kc = ops.assemble_laplace(dom2)
            Mc = ops.assemble_mass(dom2)
            os.environ["FEDD_FAST_ASSEMBLY"] = "1"
            assert abs(Kf.to_scipy() - Kc.to_scipy()).max() < 1e-13
            assert abs(Mf.to_scipy() - Mc.to_scipy()).max() < 1e-14
    finally:
        os.environ.pop("FEDD_FAST_ASSEMBLY", None)

    # triple-f32 scatter correctness against segment_sum
    dom = Domain.structured(3, 6)
    pat = fa.pattern_abe(dom, 1)
    pos, Dp = pat.duplication_plan()
    assert pos is not None
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.standard_normal(len(pat.coo_slots)))
    a = np.asarray(assemble_csr_data_tri(flat, pos, pat.nnz, Dp))
    import jax

    b = np.asarray(jax.ops.segment_sum(
        flat, jnp.asarray(pat.coo_slots.astype(np.int32)),
        num_segments=pat.nnz))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_fast_advection_matches_classic():
    """Element-last N(u)/W(u) kernels (rebuilt every Newton/time iteration
    — the hottest reassembly) equal the classic path."""
    import os

    import jax.numpy as jnp

    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain

    os.environ["FEDD_FAST_ASSEMBLY"] = "1"
    try:
        for dim in (2, 3):
            dom = Domain.structured(dim, 4).p2_domain()
            u = jnp.asarray(np.random.default_rng(1).standard_normal(
                dom.n_dofs(dim)))
            Nf = ops.assemble_advection(dom, u)
            Wf = ops.assemble_advection_in_u(dom, u)
            os.environ["FEDD_FAST_ASSEMBLY"] = "0"
            Nc = ops.assemble_advection(dom, u)
            Wc = ops.assemble_advection_in_u(dom, u)
            os.environ["FEDD_FAST_ASSEMBLY"] = "1"
            assert abs(Nf.to_scipy() - Nc.to_scipy()).max() < 1e-13
            assert abs(Wf.to_scipy() - Wc.to_scipy()).max() < 1e-13
    finally:
        os.environ.pop("FEDD_FAST_ASSEMBLY", None)


def test_host_assembler_matches_fe_path():
    """bench.py builds its SpMV input operators with the host (numpy)
    assembler to avoid remote-compile harness overhead; it must produce
    exactly the operator the device FE path + BCBuilder produce."""
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.fe.host_assembly import host_poisson_dirichlet

    for dim, n in [(2, 7), (3, 5)]:
        dom = Domain.structured(dim, n)
        K = ops.assemble_laplace(dom)
        bcb = BCBuilder()
        bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
        b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        Kh, bh = host_poisson_dirichlet(dom)
        sp = Kb.to_scipy()
        # pattern-exact: SpMV benches must stream the same slot count
        assert Kh.nnz == sp.nnz
        assert np.array_equal(Kh.indices, sp.indices)
        assert np.array_equal(Kh.indptr, sp.indptr)
        assert np.abs(Kh.data - sp.data).max() < 1e-12
        np.testing.assert_allclose(np.asarray(bb), bh, atol=1e-13)
