"""Mixed-precision iterative refinement — f64 accuracy at f32 (MXU) speed.

Measured on v5e: the MXU streams f32 dense blocks at ~266 GB/s but f64
matmuls fall to software emulation (~12 GB/s), and XLA gathers are serial
(~15 ns/elem) in any dtype.  The reference's accuracy bar is f64 at rel.
residual 1e-8 (DefaultTypeDefs.hpp:6; SURVEY.md §7 hard part 4).  The
TPU-native resolution is classical iterative refinement:

    x = 0
    repeat:  r = b − A x        (f64, ONE gather-SpMV per pass)
             d ≈ A⁻¹ r          (f32 preconditioned Krylov on dense blocks)
             x = x + d          (f64)
    until ‖r‖/‖b‖ ≤ 1e-8

Each pass contracts the error by the inner solve tolerance (~1e-6), so 2-3
passes reach 1e-8 as long as κ(A) ≲ 1e7 — with the cheap inner iterations
running entirely on the MXU."""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp

from feddlib_tpu.solvers.krylov import KrylovResult


def iterative_refinement(A64: Callable, inner_solve: Callable,
                         b: jnp.ndarray, tol: float = 1e-8,
                         max_passes: int = 8,
                         x0: Optional[jnp.ndarray] = None) -> KrylovResult:
    """A64: f64 matvec.  inner_solve(r32) → approximate correction in f32
    (returns an f32 array; converted and accumulated in f64)."""
    b = b.astype(jnp.float64)
    x = jnp.zeros_like(b) if x0 is None else x0.astype(jnp.float64)
    bnorm = jnp.linalg.norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    total_inner = 0
    r = b - A64(x)
    rel = float(jnp.linalg.norm(r) / bnorm)
    passes = 0
    while rel > tol and passes < max_passes:
        scale = jnp.linalg.norm(r)
        scale = jnp.where(scale == 0, 1.0, scale)
        d = inner_solve((r / scale).astype(jnp.float32))
        if isinstance(d, KrylovResult):
            total_inner += d.iters
            d = d.x
        x = x + d.astype(jnp.float64) * scale
        r = b - A64(x)
        rel = float(jnp.linalg.norm(r) / bnorm)
        passes += 1
    res = KrylovResult(x, total_inner, rel, rel <= tol)
    res.passes = passes
    return res
