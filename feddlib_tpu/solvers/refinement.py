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


def adaptive_solve_cycles(mesh0, source, cycles: int, theta: float = 0.5,
                          strategy: str = "Doerfler", params=None,
                          source_np=None, bc_flags=(1,)):
    """Adaptive Poisson loop — the laplaceAdaptive driver parity
    (reference problems/tests/laplaceAdaptive;
    MeshUnstructuredRefinement_decl.hpp:90-99): per cycle

        solve → estimate (P1 jump estimator) → mark (Dörfler/Maximum)
        → refine (conforming closure) → RE-PARTITION → rebuild plans
        → continue solving.

    The refinement runs on the host-replicated mesh, so the tagged-edge
    closure is deterministic REGARDLESS of the partition count (the
    cross-rank reconciliation the reference performs on its distributed
    mesh is consistent by construction here); each cycle builds a fresh
    problem on the refined mesh, so the distributed paths ('Use
    Distributed Solve' / 'Use Device Pipeline') re-partition and rebuild
    every communication/assembly plan.

    With 'Use Distributed AMR' (2D P1), estimation runs PER PART on owned
    elements + one ghost layer, marking uses only allreduce-style scalars,
    and refinement is per-part with cross-part tagged-edge reconciliation
    (mesh/refine.py estimate_distributed/mark_distributed/
    refine_distributed_2d — the reference's distributed AMR,
    MeshUnstructuredRefinement_decl.hpp:90-99); no host-replicated
    estimate/refine step remains.

    Returns a history list of dicts (n_elements, eta, iters)."""
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.refine import adapt, error_estimate_p1
    from feddlib_tpu.problems.laplace import Laplace

    dist_amr = bool(params.get("Use Distributed AMR", False)) \
        if params is not None else False
    mesh = mesh0
    history = []
    f_np = source_np or source
    for c in range(cycles):
        dom = Domain(mesh)
        prob = Laplace(dom, parameter_list=params)
        prob.assemble()
        prob.assemble_source(source)
        for flag in bc_flags:
            prob.add_bc(lambda x, t: 0.0, flag, 0)
        iters = prob.solve()
        u = np.asarray(prob.solution[0])
        if dist_amr and mesh.dim == 2:
            import jax as _jax

            from feddlib_tpu.mesh.partition import MeshPartition
            from feddlib_tpu.mesh.refine import (estimate_distributed,
                                                 mark_distributed,
                                                 refine_distributed_2d)

            n_parts = int(params.get("Devices", len(_jax.devices())))
            part = MeshPartition(mesh, n_parts)
            eta_parts = estimate_distributed(mesh, part, u, f_np)
            eta_sq = sum(float((e ** 2).sum()) for e in eta_parts)  # psum
            history.append(dict(n_elements=mesh.n_elements,
                                eta=float(np.sqrt(eta_sq)), iters=iters))
            if c < cycles - 1:
                marks = mark_distributed(eta_parts, strategy=strategy,
                                         theta=theta)
                mesh, _ = refine_distributed_2d(mesh, part, marks)
            continue
        eta = error_estimate_p1(mesh, u, f_np)
        history.append(dict(n_elements=mesh.n_elements,
                            eta=float(np.sqrt((eta ** 2).sum())),
                            iters=iters))
        if c < cycles - 1:
            mesh, _ = adapt(mesh, u, f_np, strategy=strategy, theta=theta)
    return history


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
