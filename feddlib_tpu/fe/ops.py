"""Global assembly operations: Domain(s) → CsrMatrix / vectors.

The convenience layer over feddlib_tpu.fe.assembly that mirrors the
reference's FE-factory entry points (FE_decl.hpp:41): each function builds
(or reuses) the scatter pattern for its operator and runs the batched element
kernel + segment-sum scatter.  Patterns are cached on the Domain, so
reassembly (Newton, time loops) is a pure device computation.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import assembly as asm
from feddlib_tpu.fe.domain import Domain
from feddlib_tpu.la.csr import CsrMatrix



# Assembly is chunked over elements: TPU tiling pads the small trailing dims
# of element-matrix tensors ([E, nb, nb] → lanes of 128), so materializing
# all elements at once wastes up to 32x HBM.  Each chunk runs kernel + post +
# flatten inside ONE jit (cached per operator key) so only 1-D buffers ever
# materialize in HBM.
_CHUNK = 32768
_fused_cache: dict = {}


def _fused_kernel(key, kernel, post):
    f = _fused_cache.get(key)
    if f is None:
        import jax

        def flat(vc, *extra):
            out = kernel(vc, *extra)
            if post is not None:
                out = post(out)
            return out.reshape(-1)

        f = jax.jit(flat)
        _fused_cache[key] = f
    return f


def _assemble_chunked(pattern, key, kernel, vert_coords, *extra,
                      post=None) -> CsrMatrix:
    """key must uniquely identify (operator, dim, fe_type, coefficients) —
    it is the jit-cache key for the fused kernel."""
    fused = _fused_kernel(key, kernel, post)
    E = vert_coords.shape[0]
    vals = []
    for s in range(0, E, _CHUNK):
        vals.append(fused(vert_coords[s:s + _CHUNK],
                          *(a[s:s + _CHUNK] for a in extra)))
    flat = vals[0] if len(vals) == 1 else jnp.concatenate(vals)
    m = CsrMatrix(pattern)
    m.assemble(flat)
    return m

def _square_pattern(domain: Domain, dofs_per_node: int):
    def build():
        dofs = domain.elem_dofs(dofs_per_node)
        n = domain.n_dofs(dofs_per_node)
        return asm.scatter_pattern(dofs, dofs, n, n)

    return domain.pattern(("square", dofs_per_node), build)


def assemble_laplace(domain: Domain) -> CsrMatrix:
    """Scalar Laplace stiffness (FE::assemblyLaplace, FE_def.hpp:604).
    Dispatches to the isoparametric quad/hex kernels for Q spaces
    (FE::getPhi/getDPhi Q-branches, FE_def.hpp:6730/6846) and to the
    element-last TPU fast path (fe/fast_assembly.py) on accelerators."""
    from feddlib_tpu.fe import fast_assembly as fa

    if (not domain.is_hex and fa.use_fast()
            and fa.supported(domain.dim, domain.fe_type)):
        return fa.assemble_fast(domain, "laplace")
    if domain.is_hex:
        from feddlib_tpu.fe.hex import hex_elem_laplace

        kernel = lambda vc: hex_elem_laplace(vc, domain.dim, domain.fe_type)
    else:
        kernel = lambda vc: asm.elem_laplace(vc, domain.dim, domain.fe_type)
    return _assemble_chunked(
        _square_pattern(domain, 1),
        ("laplace", domain.dim, domain.fe_type),
        kernel, domain.vert_coords())


def assemble_laplace_vec(domain: Domain, viscosity: float = 1.0) -> CsrMatrix:
    """Vector Laplace (FE::assemblyLaplaceVecField, FE_def.hpp:670)."""
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("laplace_vec", domain.dim, domain.fe_type, viscosity),
        lambda vc: asm.elem_laplace_vec(vc, domain.dim, domain.fe_type,
                                        viscosity),
        domain.vert_coords(), post=asm.vectorize_elem_mat)


def assemble_mass(domain: Domain, dofs_per_node: int = 1) -> CsrMatrix:
    """Mass matrix, scalar or vector (FE::assemblyMass, FE_def.hpp:454)."""
    eye = jnp.eye(dofs_per_node, dtype=jnp.float64)

    def post(M):
        if dofs_per_node > 1:
            return asm.vectorize_elem_mat(jnp.einsum("eab,ij->eabij", M, eye))
        return M

    from feddlib_tpu.fe import fast_assembly as fa

    if (dofs_per_node == 1 and not domain.is_hex and fa.use_fast()
            and fa.supported(domain.dim, domain.fe_type)):
        return fa.assemble_fast(domain, "mass")
    if domain.is_hex:
        from feddlib_tpu.fe.hex import hex_elem_mass

        kernel = lambda vc: hex_elem_mass(vc, domain.dim, domain.fe_type)
    else:
        kernel = lambda vc: asm.elem_mass(vc, domain.dim, domain.fe_type)
    return _assemble_chunked(
        _square_pattern(domain, dofs_per_node),
        ("mass", domain.dim, domain.fe_type, dofs_per_node),
        kernel, domain.vert_coords(), post=post)


def assemble_stress(domain: Domain, viscosity: float = 1.0) -> CsrMatrix:
    """Symmetric-gradient stress form 2μ ∫ε(u):ε(v)
    (FE::assemblyStress, FE_def.hpp:2407)."""
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("stress", domain.dim, domain.fe_type, viscosity),
        lambda vc: asm.elem_stress_sym(vc, domain.dim, domain.fe_type,
                                       viscosity),
        domain.vert_coords(), post=asm.vectorize_elem_mat)


def assemble_lin_elasticity(domain: Domain, mu: float, lam: float) -> CsrMatrix:
    """2μ ε(u):ε(v) + λ div u div v (FE::assemblyLinElasXDim,
    FE_def.hpp:2739).  λ, μ from (E, ν) as in LinElas_def.hpp:84-91."""
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("linelas", domain.dim, domain.fe_type, mu, lam),
        lambda vc: asm.elem_lin_elasticity(vc, domain.dim, domain.fe_type,
                                           mu, lam),
        domain.vert_coords(), post=asm.vectorize_elem_mat)


def lame_parameters(E: float, nu: float):
    mu = E / (2.0 * (1.0 + nu))
    lam = nu * E / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def u_elem_values(domain: Domain, u: jnp.ndarray) -> jnp.ndarray:
    """Nodal vector field u [n_nodes*dim] (NodeWise) → per-element values
    [E, nb, dim] — the reference's repeated-form u_rep_
    (NavierStokes_decl.hpp:102)."""
    dim = domain.dim
    un = u.reshape(domain.n_nodes, dim)
    return un[domain.elem_nodes()]


def assemble_advection(domain: Domain, u: jnp.ndarray) -> CsrMatrix:
    """N(u): (u·∇)u convection block, expanded to vector dofs
    (FE::assemblyAdvectionVecField, FE_def.hpp:1685)."""
    from feddlib_tpu.fe import fast_assembly as fa

    ue = u_elem_values(domain, u)
    if fa.use_fast() and fa.supported(domain.dim, domain.fe_type):
        return fa.assemble_advection_fast(domain, ue)
    eye = jnp.eye(domain.dim, dtype=jnp.float64)
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("advection", domain.dim, domain.fe_type),
        lambda vc, uc: asm.elem_advection(vc, uc, domain.dim, domain.fe_type),
        domain.vert_coords(), ue,
        post=lambda N: asm.vectorize_elem_mat(
            jnp.einsum("eab,ij->eabij", N, eye)))


def assemble_ale_divergence(domain: Domain, w: jnp.ndarray) -> CsrMatrix:
    """ALE additional convection ∫ (∇·w) u·v with w the discrete mesh
    velocity (FE::assemblyAdditionalConvection, FE_def.hpp:3044).  The
    caller scales by −density, as the reference's FSI does
    (FSI_def.hpp:500-504: P_->scale(density); P_->scale(-1.0))."""
    we = u_elem_values(domain, w)
    eye = jnp.eye(domain.dim, dtype=jnp.float64)
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("ale_div", domain.dim, domain.fe_type),
        lambda vc, wc: asm.elem_ale_divergence(vc, wc, domain.dim,
                                               domain.fe_type),
        domain.vert_coords(), we,
        post=lambda D: asm.vectorize_elem_mat(
            jnp.einsum("eab,ij->eabij", D, eye)))


def assemble_advection_in_u(domain: Domain, u: jnp.ndarray) -> CsrMatrix:
    """W(u): Newton linearisation (∇u)·δu
    (FE::assemblyAdvectionInUVecField, FE_def.hpp:1839)."""
    from feddlib_tpu.fe import fast_assembly as fa

    ue = u_elem_values(domain, u)
    if fa.use_fast() and fa.supported(domain.dim, domain.fe_type):
        return fa.assemble_advection_in_u_fast(domain, ue)
    return _assemble_chunked(
        _square_pattern(domain, domain.dim),
        ("advection_in_u", domain.dim, domain.fe_type),
        lambda vc, uc: asm.elem_advection_in_u(vc, uc, domain.dim,
                                               domain.fe_type),
        domain.vert_coords(), ue, post=asm.vectorize_elem_mat)


def assemble_divergence(dom_u: Domain, dom_p: Domain):
    """Mixed divergence blocks B (p-rows × u-cols) and Bᵀ
    (FE::assemblyDivAndDivT, FE_def.hpp:1932).  dom_u and dom_p must share
    the element ordering (P2-from-P1 preserves it)."""
    dim = dom_u.dim
    aligned = (dom_u.mesh is dom_p.mesh
               or (dom_u.parent_p1 is not None
                   and dom_u.parent_p1.mesh is dom_p.mesh)
               or (dom_p.parent_p1 is not None
                   and dom_p.parent_p1.mesh is dom_u.mesh)
               or (dom_u.parent_p1 is not None and dom_p.parent_p1 is not None
                   and dom_u.parent_p1.mesh is dom_p.parent_p1.mesh))
    if not aligned:
        raise ValueError(
            "mixed-space assembly requires domains sharing one mesh "
            "(build the P2 space with dom_p.p2_domain())")

    def build():
        rows = dom_p.elem_dofs(1)
        cols = dom_u.elem_dofs(dim)
        return asm.scatter_pattern(rows, cols, dom_p.n_dofs(1),
                                   dom_u.n_dofs(dim))

    pat = dom_p.pattern(("div", id(dom_u)), build)
    B = _assemble_chunked(
        pat,
        ("div", dim, dom_u.fe_type, dom_p.fe_type),
        lambda vc: asm.elem_divergence(vc, dim, dom_u.fe_type, dom_p.fe_type),
        dom_u.vert_coords())
    BT = B.transpose()
    return B, BT


def assemble_hex_laplace_vec(domain: Domain, viscosity: float = 1.0
                             ) -> CsrMatrix:
    """Vector Laplace on Q-family hex meshes (identity expansion of the
    scalar hex stiffness — FE::assemblyLaplaceVecField for Q spaces)."""
    from feddlib_tpu.fe.hex import hex_elem_laplace

    dim = domain.dim
    eye = jnp.eye(dim, dtype=jnp.float64)
    return _assemble_chunked(
        _square_pattern(domain, dim),
        ("hex_laplace_vec", dim, domain.fe_type, viscosity),
        lambda vc: hex_elem_laplace(vc, dim, domain.fe_type) * viscosity,
        domain.vert_coords(),
        post=lambda K: asm.vectorize_elem_mat(
            jnp.einsum("eab,ij->eabij", K, eye)))


def assemble_divergence_p1disc(dom_u: Domain):
    """Mixed divergence blocks B (P1-disc pressure rows × Qk velocity
    cols) and Bᵀ — the reference's Q2/P1-disc pairing
    (FE::assemblyDivAndDivT P1-disc branch, FE_def.hpp:1967-1969).
    Pressure dofs are element-local: gid = e·(dim+1)+a."""
    from feddlib_tpu.fe.hex import hex_elem_divergence_p1disc

    dim = dom_u.dim
    E = dom_u.n_elements
    n_p = E * (dim + 1)
    rows = (np.arange(E)[:, None] * (dim + 1)
            + np.arange(dim + 1)[None, :])  # [E, dim+1]
    cols = dom_u.elem_dofs(dim)

    def build():
        return asm.scatter_pattern(rows, cols, n_p, dom_u.n_dofs(dim))

    pat = dom_u.pattern(("div_p1disc", dim), build)
    B = _assemble_chunked(
        pat, ("div_p1disc", dim, dom_u.fe_type),
        lambda vc: hex_elem_divergence_p1disc(vc, dim, dom_u.fe_type),
        dom_u.vert_coords(),
        post=lambda Bm: Bm.reshape(Bm.shape[0], Bm.shape[1], -1))
    return B, B.transpose()


def assemble_mass_p1disc(dom_u: Domain) -> CsrMatrix:
    """P1-disc pressure mass matrix (block-diagonal, element-local dofs) —
    the pressure-mass Schur approximation for Q2/P1-disc block
    preconditioners."""
    from feddlib_tpu.fe.hex import hex_elem_mass_p1disc

    dim = dom_u.dim
    E = dom_u.n_elements
    n_p = E * (dim + 1)
    rows = (np.arange(E)[:, None] * (dim + 1)
            + np.arange(dim + 1)[None, :])

    def build():
        return asm.scatter_pattern(rows, rows, n_p, n_p)

    pat = dom_u.pattern(("mass_p1disc", dim), build)
    return _assemble_chunked(
        pat, ("mass_p1disc", dim, dom_u.fe_type),
        lambda vc: hex_elem_mass_p1disc(vc, dim),
        dom_u.vert_coords())


def assemble_bd_stabilization(dom_p: Domain) -> CsrMatrix:
    """Bochev–Dohrmann P1-P1 pressure stabilization block C
    (FE::assemblyBDStabilization, FE_def.hpp:2151)."""
    return _assemble_chunked(
        _square_pattern(dom_p, 1),
        ("bd_stab", dom_p.dim, dom_p.fe_type),
        lambda vc: asm.elem_bd_stabilization(vc, dom_p.dim, dom_p.fe_type),
        dom_p.vert_coords())


def assemble_rhs(domain: Domain, f: Callable, dofs_per_node: int = 1,
                 degree: Optional[int] = None) -> jnp.ndarray:
    """Volume source term (FE::assemblyRHS, FE_def.hpp:4694).
    f(x) → scalar (dofs_per_node=1) or [dofs_per_node]."""
    if domain.is_hex:
        from feddlib_tpu.fe.hex import hex_elem_rhs

        vec = hex_elem_rhs(domain.vert_coords(), domain.dim, domain.fe_type,
                           lambda x: jnp.asarray(f(x), jnp.float64),
                           n_comp=dofs_per_node)
    else:
        vec = asm.elem_rhs(domain.vert_coords(), domain.dim, domain.fe_type,
                           f, degree=degree, n_comp=dofs_per_node)
    return asm.assemble_vector(domain.elem_nodes(), vec,
                               domain.n_dofs(dofs_per_node))


def assemble_surface_rhs(domain: Domain, g: Callable, flag: int,
                         dofs_per_node: int = 1, degree: int = 3) -> jnp.ndarray:
    """Neumann boundary load over surfaces with the given flag
    (FE::assemblySurfaceIntegral, FE_def.hpp:4511; BCBuilder 'Neumann')."""
    mesh = domain.mesh
    if mesh.surfaces is None:
        raise ValueError("mesh has no surface entities")
    sel = mesh.surface_flags == flag
    surf = mesh.surfaces[sel]
    out = jnp.zeros(domain.n_dofs(dofs_per_node), jnp.float64)
    if len(surf) == 0:
        return out
    nverts = domain.dim  # vertices of the surface simplex
    coords = jnp.asarray(mesh.points[surf[:, :nverts]], jnp.float64)
    vec = asm.elem_surface_rhs(coords, domain.dim, domain.fe_type, g,
                               degree=degree)
    return asm.assemble_vector(surf, vec, domain.n_dofs(dofs_per_node))
