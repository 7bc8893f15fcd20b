import jax.numpy as jnp
import numpy as np
import pytest

from feddlib_tpu.solvers.krylov import cg, gmres


@pytest.fixture
def spd_system():
    rng = np.random.default_rng(42)
    n = 60
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    d = np.linspace(1, 50, n)
    A = Q @ np.diag(d) @ Q.T
    x_true = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(x_true), jnp.asarray(A @ x_true)


def test_cg(spd_system):
    A, x_true, b = spd_system
    res = cg(lambda v: A @ v, b, tol=1e-10, maxiter=500)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true),
                               atol=1e-7)


def test_cg_preconditioned(spd_system):
    A, x_true, b = spd_system
    Dinv = 1.0 / jnp.diag(A)
    res = cg(lambda v: A @ v, b, M=lambda v: Dinv * v, tol=1e-10, maxiter=500)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-7)


def test_gmres_nonsymmetric():
    rng = np.random.default_rng(1)
    n = 50
    A = np.eye(n) * 5 + 0.5 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, b, tol=1e-10, restart=60, maxiter=200)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-6)


def test_gmres_restarted():
    rng = np.random.default_rng(2)
    n = 50
    A = np.eye(n) * 10 + rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    res = gmres(lambda v: Aj @ v, b, tol=1e-8, restart=15, maxiter=300)
    assert res.converged
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-5)


def test_gmres_right_preconditioned():
    rng = np.random.default_rng(3)
    n = 40
    A = np.diag(np.linspace(1, 100, n)) + 0.1 * rng.standard_normal((n, n))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(A @ x_true)
    Aj = jnp.asarray(A)
    Dinv = jnp.asarray(1.0 / np.diag(A))
    res_p = gmres(lambda v: Aj @ v, b, M=lambda v: Dinv * v, tol=1e-10,
                  restart=40, maxiter=200)
    res_n = gmres(lambda v: Aj @ v, b, tol=1e-10, restart=40, maxiter=200)
    assert res_p.converged
    assert res_p.iters <= res_n.iters
    np.testing.assert_allclose(np.asarray(res_p.x), x_true, atol=1e-6)


def test_gmres_iteration_exactness():
    """GMRES converges in at most rank(A) iterations for well-separated
    eigenvalues — sanity that the Arnoldi/Givens plumbing is right."""
    A = jnp.asarray(np.diag([1.0, 2.0, 3.0, 4.0, 5.0]))
    b = jnp.ones(5)
    res = gmres(lambda v: A @ v, b, tol=1e-12, restart=10, maxiter=50)
    assert res.converged
    assert res.iters <= 5


def test_residual_history_recording():
    """record_history returns the per-iteration Belos-style relres log:
    history[0] = 1 (zero initial guess), history[-1] == final relres, and
    it is monotone for CG on SPD systems at tight tolerance."""
    import numpy as np
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.solvers.krylov import cg, gmres, solve_jit

    dom = Domain.structured(2, 10)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    Kb, bb = bcb.apply_symmetric(
        K, ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0]), 0)
    for res in (cg(Kb.matvec, bb, tol=1e-10, maxiter=500,
                   record_history=True),
                gmres(Kb.matvec, bb, tol=1e-10, maxiter=500,
                      record_history=True)):
        assert res.history is not None
        assert len(res.history) == res.iters + 1
        assert np.isclose(res.history[0], 1.0)
        assert np.isclose(res.history[-1], res.relres, rtol=1e-10)
        assert np.all(np.isfinite(res.history))
    # jit-argument program path
    A_fn, A_ops = Kb.operator()
    r = solve_jit("gmres", A_fn, A_ops, bb, tol=1e-8, maxiter=300,
                  record_history=True)
    assert len(r.history) == r.iters + 1
    # GMRES true-residual log decreases monotonically
    assert np.all(np.diff(r.history) <= 1e-12)
