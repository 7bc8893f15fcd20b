"""Block preconditioners for saddle-point systems — the Teko /
PrecBlock2x2 equivalents (reference: problems/Solver/PrecBlock2x2_decl.hpp:38
diagonal/triangular with pressure-Schur approximation; Teko path with nested
FROSch velocity/pressure inverses + pressure mass matrix,
Preconditioner_def.hpp:692, :1098).

Operators act on the MERGED monolithic vector (u ++ p) so they can drive the
same GMRES as the monolithic Schwarz path.  The velocity inverse Ã⁻¹ and
pressure Schur inverse S̃⁻¹ are pluggable applies — typically a Schwarz
apply on A and a scaled pressure-mass Jacobi/Schwarz (S ≈ −(1/ν) Mp for
Stokes)."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from feddlib_tpu.la.block import BlockMatrix
from feddlib_tpu.la.csr import CsrMatrix


class BlockDiagonalPreconditioner:
    """z = diag(Ã⁻¹, S̃⁻¹) r."""

    def __init__(self, n_u: int, inv_A: Callable, inv_S: Callable):
        self.n_u = n_u
        self.inv_A = inv_A
        self.inv_S = inv_S

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        ru, rp = r[: self.n_u], r[self.n_u:]
        return jnp.concatenate([self.inv_A(ru), self.inv_S(rp)])

    __call__ = apply


class BlockTriangularPreconditioner:
    """Upper-triangular: z_p = S̃⁻¹ r_p;  z_u = Ã⁻¹ (r_u − Bᵀ z_p)
    (reference PrecBlock2x2 'Triangular')."""

    def __init__(self, n_u: int, inv_A: Callable, inv_S: Callable,
                 BT: CsrMatrix):
        self.n_u = n_u
        self.inv_A = inv_A
        self.inv_S = inv_S
        self.BT = BT

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        ru, rp = r[: self.n_u], r[self.n_u:]
        zp = self.inv_S(rp)
        zu = self.inv_A(ru - self.BT.matvec(zp))
        return jnp.concatenate([zu, zp])

    __call__ = apply


class SimplePreconditioner:
    """SIMPLE(-C) block factorization (Teko-style, reference
    Preconditioner_def.hpp:1098):
        predictor: u* = Ã⁻¹ r_u
        corrector: δp = S̃⁻¹ (r_p − B u*),  S̃ ≈ B diag(A)⁻¹ Bᵀ
        update:    u  = u* − α diag(A)⁻¹ Bᵀ δp,  p = α δp
    """

    def __init__(self, n_u: int, inv_A: Callable, inv_S: Callable,
                 B: CsrMatrix, BT: CsrMatrix, diagA_inv: jnp.ndarray,
                 alpha: float = 1.0):
        self.n_u = n_u
        self.inv_A = inv_A
        self.inv_S = inv_S
        self.B = B
        self.BT = BT
        self.dAi = diagA_inv
        self.alpha = alpha

    def apply(self, r: jnp.ndarray) -> jnp.ndarray:
        ru, rp = r[: self.n_u], r[self.n_u:]
        u_star = self.inv_A(ru)
        dp = self.inv_S(rp - self.B.matvec(u_star))
        u = u_star - self.alpha * self.dAi * self.BT.matvec(dp)
        return jnp.concatenate([u, self.alpha * dp])

    __call__ = apply


def pressure_mass_inverse(Mp: CsrMatrix, viscosity: float = 1.0,
                          lumped: bool = True) -> Callable:
    """S̃⁻¹ ≈ −ν Mp⁻¹ style pressure Schur inverse (sign folded into the
    caller's convention; here returns +(1/ν)·lumped-mass⁻¹ apply)."""
    if lumped:
        d = Mp.matvec(jnp.ones(Mp.shape[0]))  # row-sum lumping
        dinv = jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)
        return lambda r: viscosity * dinv * r
    diag = Mp.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag == 0, 1.0, diag), 0.0)
    return lambda r: viscosity * dinv * r


def schur_diag_inverse(A: CsrMatrix, B: CsrMatrix, BT: CsrMatrix) -> Callable:
    """SIMPLE Schur: S̃ = B diag(A)⁻¹ Bᵀ, inverted by Jacobi on its
    diagonal (cheap, assembly-free apply)."""
    dA = A.diagonal()
    dAi = jnp.where(dA != 0, 1.0 / jnp.where(dA == 0, 1.0, dA), 0.0)

    # diag(S̃) computed exactly: S_ii = Σ_k B_ik² / A_kk
    import numpy as np

    Bs = B.to_scipy()
    dS = np.asarray((Bs.multiply(Bs)) @ np.asarray(dAi))
    dS = jnp.asarray(dS)
    dSi = jnp.where(dS != 0, 1.0 / jnp.where(dS == 0, 1.0, dS), 1.0)
    return lambda r: dSi * r
