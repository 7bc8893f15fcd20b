"""DIA format: detection, exact apply, reassembly, spill, rejection.

The DIA operator fills the Tpetra CrsMatrix::apply role (reference
feddlib/core/LinearAlgebra/Matrix_decl.hpp:116-120) for banded operators;
auto_spmv must fall back to SELL for unstructured patterns.
"""
import numpy as np
import jax.numpy as jnp
import scipy.sparse as sps

from feddlib_tpu.bc import BCBuilder
from feddlib_tpu.fe import ops
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.dia import DiaMatrix, auto_spmv
from feddlib_tpu.la.sell import SellMatrix


def _structured_operator(n=8):
    dom = Domain.structured(3, n)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, _ = bcb.apply_symmetric(K, b, 0)
    return Kb


def test_dia_detects_structured_stencil_and_matches_csr():
    Kb = _structured_operator(8)
    A = DiaMatrix.from_csr(Kb, dtype=jnp.float32)
    assert A is not None
    assert len(A.offsets) <= 15  # 3D P1 tet stencil
    assert A.spill_rows is None  # full coverage
    sp = Kb.to_scipy().tocsr()
    x = np.random.RandomState(0).rand(sp.shape[0]).astype(np.float32)
    y = np.asarray(A.matvec(jnp.asarray(x)))
    y_ref = sp @ x.astype(np.float64)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-6


def test_dia_with_data_reassembly():
    Kb = _structured_operator(6)
    sp = Kb.to_scipy().tocsr()
    A = DiaMatrix.from_csr(Kb, dtype=jnp.float32)
    rng = np.random.RandomState(1)
    new_data = rng.rand(sp.nnz).astype(np.float32)
    A2 = A.with_data(jnp.asarray(new_data))
    sp2 = sps.csr_matrix((new_data, sp.indices, sp.indptr), shape=sp.shape)
    x = rng.rand(sp.shape[0]).astype(np.float32)
    y = np.asarray(A2.matvec(jnp.asarray(x)))
    y_ref = sp2 @ x
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5


def test_dia_spill_is_exact():
    # banded matrix + a few far off-band entries -> spill path
    n = 300
    rng = np.random.RandomState(2)
    main = sps.diags([rng.rand(n - 1), 2 + rng.rand(n), rng.rand(n - 1)],
                     [-1, 0, 1], format="csr")
    far = sps.csr_matrix(
        (rng.rand(5), (np.arange(5), np.arange(5) * 37 + 100)), (n, n))
    sp = (main + far).tocsr()
    A = DiaMatrix.from_csr(sp, dtype=jnp.float32, coverage=0.9,
                           max_offsets=3)
    assert A is not None and A.spill_rows is not None
    x = rng.rand(n).astype(np.float32)
    y = np.asarray(A.matvec(jnp.asarray(x)))
    y_ref = sp @ x
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-6


def test_auto_spmv_rejects_unstructured_and_uses_sell():
    # unstructured scalar: no plain DIA; RCM split (round 5) or SELL
    from feddlib_tpu.la.dia import SplitDiaMatrix

    dom = Domain.from_file("/root/reference/meshes/cube_131.mesh")
    K = ops.assemble_laplace(dom)
    A = auto_spmv(K, dtype=jnp.float32)
    assert isinstance(A, (SplitDiaMatrix, SellMatrix))
    assert not isinstance(A, DiaMatrix)
    sp = K.to_scipy().tocsr()
    x = np.random.RandomState(3).rand(sp.shape[0]).astype(np.float32)
    y = np.asarray(A.matvec(jnp.asarray(x)))
    y_ref = sp @ x.astype(np.float64)
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-5


def test_auto_spmv_picks_dia_for_structured():
    Kb = _structured_operator(6)
    assert isinstance(auto_spmv(Kb), DiaMatrix)


def test_dia_rectangular_rejected():
    sp = sps.random(40, 60, density=0.2, format="csr",
                    random_state=np.random.RandomState(4))
    assert DiaMatrix.from_csr(sp) is None


def test_block_dia_matches_csr_elasticity():
    """Block-DIA (vector-field gather-free format) equals the CSR apply on
    2D/3D linear elasticity, including with_data reassembly."""
    from feddlib_tpu.la.dia import BlockDiaMatrix

    for dim, n in [(2, 10), (3, 5)]:
        dom = Domain.structured(dim, n)
        K = ops.assemble_lin_elasticity(dom, 37.0, 11.0)
        B = BlockDiaMatrix.from_csr(K, dim, dtype=jnp.float64,
                                    max_bytes_per_nnz=16.0)
        assert B is not None and B.spill_rows is None
        x = np.random.RandomState(0).rand(K.shape[0])
        y_ref = np.asarray(K.matvec(jnp.asarray(x)))
        y = np.asarray(B.matvec(jnp.asarray(x)))
        assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-14
        B2 = B.with_data(K.data * 2.0)
        y2 = np.asarray(B2.matvec(jnp.asarray(x)))
        assert np.abs(y2 - 2 * y_ref).max() / np.abs(y_ref).max() < 1e-14


def test_auto_spmv_picks_block_dia_for_vector_fields():
    from feddlib_tpu.la.dia import BlockDiaMatrix

    dom = Domain.structured(3, 5)
    K = ops.assemble_lin_elasticity(dom, 1.0, 1.0)
    A = auto_spmv(K, dtype=jnp.float32, dofs_per_node=3)
    assert isinstance(A, BlockDiaMatrix)
    # scalar callers are unaffected
    assert isinstance(auto_spmv(_structured_operator(6)), DiaMatrix)


def test_host_elasticity_matches_fe_path():
    from feddlib_tpu.fe.host_assembly import host_lin_elasticity_p1

    for dim, n in [(2, 8), (3, 4)]:
        dom = Domain.structured(dim, n)
        K = ops.assemble_lin_elasticity(dom, 37.0, 11.0).to_scipy().tocsr()
        K.sort_indices()
        Kh = host_lin_elasticity_p1(dom, 37.0, 11.0)
        Kh.sort_indices()
        assert K.nnz == Kh.nnz
        assert np.array_equal(K.indices, Kh.indices)
        assert np.abs(K.data - Kh.data).max() < 1e-12


def test_split_dia_matches_csr_scalar_unstructured():
    """SplitDiaMatrix (RCM-banded DIA + SELL residue) equals the CSR
    apply on an unstructured scalar operator, including with_data."""
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.dia import SplitDiaMatrix

    dom = Domain.from_file("/root/reference/meshes/cube3.mesh")
    K = ops.assemble_laplace(dom)
    S = SplitDiaMatrix.from_csr(K, dtype=jnp.float64, min_dia_share=0.1)
    assert S is not None and S.dia_share > 0.1
    sp = K.to_scipy().tocsr()
    x = np.random.default_rng(0).standard_normal(K.shape[0])
    y_ref = sp @ x
    y = np.asarray(S.matvec(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-13
    S2 = S.with_data(K.data * 2.5)
    y2 = np.asarray(S2.matvec(jnp.asarray(x)))
    assert np.abs(y2 - 2.5 * y_ref).max() / np.abs(y_ref).max() < 1e-13
    # permuted-space operator: conjugation identity
    yp = np.asarray(S.from_permuted(
        S.permuted_operator()[0](S.permuted_operator()[1],
                                 S.to_permuted(jnp.asarray(x)))))
    assert np.abs(yp - y_ref).max() / np.abs(y_ref).max() < 1e-13


def test_split_dia_matches_csr_vector_unstructured():
    """Vector-field split (block-DIA + block-SELL residue, planar
    internals) equals the CSR apply on unstructured 3D elasticity."""
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.dia import SplitDiaMatrix

    dom = Domain.from_file("/root/reference/meshes/cube3.mesh")
    K = ops.assemble_lin_elasticity(dom, 37.0, 11.0)
    S = SplitDiaMatrix.from_csr(K, dtype=jnp.float64, dofs_per_node=3,
                                min_dia_share=0.1)
    assert S is not None and S.dia_share > 0.1
    sp = K.to_scipy().tocsr()
    x = np.random.default_rng(1).standard_normal(K.shape[0])
    y_ref = sp @ x
    y = np.asarray(S.matvec(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() / np.abs(y_ref).max() < 1e-13
    S2 = S.with_data(K.data * 3.0)
    y2 = np.asarray(S2.matvec(jnp.asarray(x)))
    assert np.abs(y2 - 3.0 * y_ref).max() / np.abs(y_ref).max() < 1e-13
