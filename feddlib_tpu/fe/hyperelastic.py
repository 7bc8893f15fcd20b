"""Hyperelastic element kernels via automatic differentiation.

The reference ships AceGen/Mathematica-generated closed-form tangents and
stresses (Neo-Hooke `nh3d` FE_def.hpp:6969, Mooney-Rivlin `mr3d` :7259,
St.Venant–Kirchhoff `stvk3d` :7559 / `stvk2d`, driven by
FE::assemblyNonLinearElasticity).  TPU-natively, AceGen is replaced by JAX
autodiff: we write the strain-energy density W(F) once and obtain

    internal force  R_e = ∂E_e/∂d      (jax.grad)
    tangent         K_e = ∂²E_e/∂d²    (jax.hessian, forward-over-reverse)

batched over all elements with vmap — exact to machine precision, no code
generation step, and XLA fuses the per-element 30×30 Hessians into batched
MXU work.  Total-Lagrangian kinematics: F = I + Σ_a d_a ⊗ ∇X φ_a.

Material forms (parameters E, ν → μ, λ as in the reference,
NonLinElasticity_def.hpp:84-103):
- StVK:         W = λ/2 tr(E)² + μ E:E,  E = (FᵀF − I)/2
- Neo-Hooke:    W = μ/2 (I₁ − d) − μ ln J + λ/2 (ln J)²
- Mooney-Rivlin:W = C₁(Ī₁ − 3) + C₂(Ī₂ − 3) + κ/2 (J − 1)²
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import reference as ref
from feddlib_tpu.fe.assembly import small_det, small_inv

f64 = jnp.float64


# -- strain energy densities -------------------------------------------------

def stvk_energy(F, mu, lam):
    dim = F.shape[-1]
    E = 0.5 * (F.T @ F - jnp.eye(dim, dtype=F.dtype))
    return 0.5 * lam * jnp.trace(E) ** 2 + mu * jnp.sum(E * E)


def neo_hooke_energy(F, mu, lam):
    dim = F.shape[-1]
    J = small_det(F)
    lnJ = jnp.log(J)
    I1 = jnp.sum(F * F)
    return 0.5 * mu * (I1 - dim) - mu * lnJ + 0.5 * lam * lnJ ** 2


def mooney_rivlin_energy(F, c1, c2, kappa):
    J = small_det(F)
    C = F.T @ F
    I1 = jnp.trace(C)
    I2 = 0.5 * (I1 ** 2 - jnp.sum(C * C))
    Jm23 = J ** (-2.0 / 3.0)
    I1b = Jm23 * I1
    I2b = Jm23 ** 2 * I2
    return c1 * (I1b - 3.0) + c2 * (I2b - 3.0) + 0.5 * kappa * (J - 1.0) ** 2


_MATERIALS = {
    "StVK": stvk_energy,
    "Neo-Hooke": neo_hooke_energy,
    "Mooney-Rivlin": mooney_rivlin_energy,
}


def material_energy(name: str) -> Callable:
    if name not in _MATERIALS:
        raise ValueError(f"unknown material {name!r}; have {list(_MATERIALS)}")
    return _MATERIALS[name]


# -- element energy / residual / tangent -------------------------------------


def _element_energy_fn(dim: int, fe_type: str, energy: Callable, params):
    """Returns E_e(d_elem, Binv, absdetB) for a single element, with basis
    tables baked in; quadrature degree follows the reference's choice for
    nonlinear kinematics (2(p−1)+2)."""
    deg = {"P1": 2, "P2": 4}[fe_type]
    qp, qw = ref.quadrature(dim, deg)
    dphi = jnp.asarray(ref.eval_grad_phi(dim, fe_type, qp), f64)  # [nq,nb,dim]
    qw = jnp.asarray(qw, f64)
    eye = jnp.eye(dim, dtype=f64)

    def elem_energy(d_elem, Binv, adet):
        # physical gradients: ∇X φ_a = Binvᵀ ∇ξ φ_a  → [nq, nb, dim]
        g = jnp.einsum("dk,qbd->qbk", Binv, dphi)
        # F_q = I + Σ_a d_a ⊗ g_a
        Fq = eye[None] + jnp.einsum("bi,qbk->qik", d_elem, g)
        Wq = jax.vmap(lambda F: energy(F, *params))(Fq)
        return jnp.sum(qw * Wq) * adet

    return elem_energy


@partial(jax.jit, static_argnames=("dim", "fe_type", "material"))
def elem_hyper_residual_tangent(vert_coords, d_elem, dim, fe_type, material,
                                params):
    """Batched internal forces and consistent tangents.

    vert_coords [E, dim+1, dim]; d_elem [E, nb, dim] nodal displacements.
    Returns (R [E, nb*dim], K [E, nb*dim, nb*dim]) with NodeWise dof order.
    """
    energy = material_energy(material)
    elem_energy = _element_energy_fn(dim, fe_type, energy, params)
    p0 = vert_coords[:, :1, :]
    B = jnp.swapaxes(vert_coords[:, 1:, :] - p0, 1, 2)
    detB = small_det(B)
    Binv = small_inv(B, detB)
    adet = jnp.abs(detB)

    def per_elem(d, Bi, ad):
        nbd = d.size
        flat = d.reshape(-1)
        f = lambda df: elem_energy(df.reshape(d.shape), Bi, ad)
        R = jax.grad(f)(flat)
        K = jax.hessian(f)(flat)
        return R, K

    return jax.vmap(per_elem)(d_elem, Binv, adet)


@partial(jax.jit, static_argnames=("dim", "fe_type", "material"))
def elem_hyper_energy(vert_coords, d_elem, dim, fe_type, material, params):
    """Total strain energy per element [E] (diagnostics)."""
    energy = material_energy(material)
    elem_energy = _element_energy_fn(dim, fe_type, energy, params)
    p0 = vert_coords[:, :1, :]
    B = jnp.swapaxes(vert_coords[:, 1:, :] - p0, 1, 2)
    detB = small_det(B)
    Binv = small_inv(B, detB)
    return jax.vmap(elem_energy)(d_elem, Binv, jnp.abs(detB))
