"""Host (numpy/scipy) assembly of canonical operators for benchmark and
setup paths that must not pay a device compile.

The device element kernels (fe/assembly.py, fe/fast_assembly.py) are the
production assembly path and the thing bench.py *measures*; this module
exists so that benchmark *inputs* (the SpMV operators) can be constructed
without waiting on a remote XLA compile — on tunneled TPU backends a cold
compile of the 1.5M-element assembly chain costs minutes, which is pure
harness overhead.  Entries are identical (to f64 roundoff) to
ops.assemble_laplace + BCBuilder.apply_symmetric, asserted in
tests/test_assembly.py.

Reference: FE::assemblyLaplace (feddlib/core/FE/FE_def.hpp:604) and
BCBuilder row/column elimination (BCBuilder_def.hpp:620).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sps


def _det_inv(B: np.ndarray):
    """Vectorized closed-form det+inverse of [E, d, d] for d in (2, 3) —
    ~10x faster than np.linalg on millions of tiny matrices."""
    d = B.shape[1]
    if d == 2:
        a, b = B[:, 0, 0], B[:, 0, 1]
        c, e = B[:, 1, 0], B[:, 1, 1]
        det = a * e - b * c
        inv = np.empty_like(B)
        inv[:, 0, 0], inv[:, 0, 1] = e, -b
        inv[:, 1, 0], inv[:, 1, 1] = -c, a
        inv /= det[:, None, None]
        return det, inv
    a = B
    c00 = a[:, 1, 1] * a[:, 2, 2] - a[:, 1, 2] * a[:, 2, 1]
    c01 = a[:, 1, 2] * a[:, 2, 0] - a[:, 1, 0] * a[:, 2, 2]
    c02 = a[:, 1, 0] * a[:, 2, 1] - a[:, 1, 1] * a[:, 2, 0]
    det = a[:, 0, 0] * c00 + a[:, 0, 1] * c01 + a[:, 0, 2] * c02
    inv = np.empty_like(B)
    inv[:, 0, 0] = c00
    inv[:, 1, 0] = c01
    inv[:, 2, 0] = c02
    inv[:, 0, 1] = a[:, 0, 2] * a[:, 2, 1] - a[:, 0, 1] * a[:, 2, 2]
    inv[:, 1, 1] = a[:, 0, 0] * a[:, 2, 2] - a[:, 0, 2] * a[:, 2, 0]
    inv[:, 2, 1] = a[:, 0, 1] * a[:, 2, 0] - a[:, 0, 0] * a[:, 2, 1]
    inv[:, 0, 2] = a[:, 0, 1] * a[:, 1, 2] - a[:, 0, 2] * a[:, 1, 1]
    inv[:, 1, 2] = a[:, 0, 2] * a[:, 1, 0] - a[:, 0, 0] * a[:, 1, 2]
    inv[:, 2, 2] = a[:, 0, 0] * a[:, 1, 1] - a[:, 0, 1] * a[:, 1, 0]
    inv /= det[:, None, None]
    return det, inv


def host_laplace_p1(dom) -> sps.csr_matrix:
    """Scalar P1 stiffness on a simplex mesh, assembled with numpy."""
    m = dom.mesh
    if m.fe_type != "P1":
        raise ValueError("host assembler supports P1 simplices only")
    pts = m.points
    el = m.elements
    dim = m.dim
    X = pts[el]                              # [E, dim+1, dim]
    B = X[:, 1:] - X[:, :1]                  # rows = edge vectors x_i - x_0
    det, Binv = _det_inv(B)
    vol = np.abs(det) / (2.0 if dim == 2 else 6.0)
    # x = x0 + B^T λ  =>  ∇λ_i = column i of B^{-1} (i = 1..dim)
    g = np.transpose(Binv, (0, 2, 1))        # g[e, i-1, :] = ∇λ_i
    g0 = -g.sum(axis=1, keepdims=True)       # ∇λ_0 = -Σ ∇λ_i
    G = np.concatenate([g0, g], axis=1)      # [E, dim+1, dim]
    Ke = np.einsum("ead,ebd->eab", G, G) * vol[:, None, None]
    nv = el.shape[1]
    rows = np.repeat(el, nv, axis=1).ravel()
    cols = np.tile(el, (1, nv)).ravel()
    K = sps.coo_matrix((Ke.ravel(), (rows, cols)),
                       shape=(m.n_points, m.n_points)).tocsr()
    K.sum_duplicates()
    return K


def host_lin_elasticity_p1(dom, mu: float, lam: float) -> sps.csr_matrix:
    """P1 linear elasticity 2μ∫ε(u):ε(v) + λ∫div u div v with NodeWise
    (interleaved) dof ordering — numpy twin of ops.assemble_lin_elasticity
    (reference FE::assemblyLinElasXDim, FE_def.hpp:2739)."""
    m = dom.mesh
    if m.fe_type != "P1":
        raise ValueError("host assembler supports P1 simplices only")
    pts, el, dim = m.points, m.elements, m.dim
    X = pts[el]
    B = X[:, 1:] - X[:, :1]
    det, Binv = _det_inv(B)
    vol = np.abs(det) / (2.0 if dim == 2 else 6.0)
    g = np.transpose(Binv, (0, 2, 1))
    G = np.concatenate([-g.sum(axis=1, keepdims=True), g], axis=1)
    gg = np.einsum("ead,ebd->eab", G, G)           # g_a·g_b
    # K[e, a, i, b, j] = vol (μ(δ_ij g_a·g_b + g_a[j] g_b[i]) + λ g_a[i] g_b[j])
    eye = np.eye(dim)
    Ke = (mu * (np.einsum("eab,ij->eaibj", gg, eye)
                + np.einsum("eaj,ebi->eaibj", G, G))
          + lam * np.einsum("eai,ebj->eaibj", G, G))
    Ke *= vol[:, None, None, None, None]
    nv = el.shape[1]
    dofs = (el[:, :, None] * dim + np.arange(dim)).reshape(-1, nv * dim)
    rows = np.repeat(dofs, nv * dim, axis=1).ravel()
    cols = np.tile(dofs, (1, nv * dim)).ravel()
    n = m.n_points * dim
    K = sps.coo_matrix(
        (Ke.reshape(len(el), nv * dim, nv * dim).ravel(), (rows, cols)),
        shape=(n, n)).tocsr()
    K.sum_duplicates()
    return K


def host_rhs_const(dom, value: float = 1.0) -> np.ndarray:
    """RHS for a constant source: b_a = Σ_e value·|e|/(dim+1)."""
    m = dom.mesh
    pts, el = m.points, m.elements
    X = pts[el]
    B = X[:, 1:] - X[:, :1]
    det = _det_inv(B)[0]
    vol = np.abs(det) / (2.0 if m.dim == 2 else 6.0)
    contrib = value * vol / el.shape[1]
    b = np.zeros(m.n_points)
    np.add.at(b, el.ravel(), np.repeat(contrib, el.shape[1]))
    return b


def host_dirichlet_symmetric(K: sps.csr_matrix, b: np.ndarray,
                             mask: np.ndarray, values: np.ndarray = None):
    """Symmetric Dirichlet elimination on host: zero rows AND columns of
    masked dofs, unit diagonal, lift boundary data into the RHS — the
    BCBuilder.apply_symmetric semantics.  Entries are zeroed IN PLACE so
    the sparsity pattern stays exactly the FE pattern (eliminated slots
    remain as explicit zeros, as the device path keeps them — SpMV
    benchmarks must stream the same slot count either way)."""
    n = K.shape[0]
    g = np.zeros(n) if values is None else np.where(mask, values, 0.0)
    new_b = b - K @ g
    new_b[mask] = g[mask]
    Kb = K.copy()
    Kb.sort_indices()
    row_of = np.repeat(np.arange(n), np.diff(Kb.indptr))
    in_r = mask[row_of]
    in_c = mask[Kb.indices]
    is_diag = Kb.indices == row_of
    Kb.data[(in_r | in_c) & ~(is_diag & in_r)] = 0.0
    Kb.data[in_r & is_diag] = 1.0
    return Kb, new_b


def host_poisson_dirichlet(dom, flag: int = 1, source: float = 1.0):
    """Convenience: P1 Poisson operator + RHS with homogeneous Dirichlet on
    nodes of the given boundary flag.  Returns (scipy CSR, numpy rhs)."""
    K = host_laplace_p1(dom)
    b = host_rhs_const(dom, source)
    mask = np.asarray(dom.mesh.point_flags) == flag
    return host_dirichlet_symmetric(K, b, mask)
