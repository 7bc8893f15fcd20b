#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.md north star): SpMV throughput (nnz/s) on a 3D P1
Poisson matrix.  Timing is honest: N chained matvecs (power iteration)
inside ONE jitted `lax.fori_loop`, timed at two loop lengths and
differenced — immune to async-dispatch artifacts and fixed overheads.
`vs_baseline` is achieved / HBM-bandwidth roofline for the kernel (the
reference publishes no numbers, BASELINE.md); CG-to-1e-8 on a smaller cube
is the correctness anchor.
"""

import json
import time

import numpy as np


def _build_poisson(n):
    import jax.numpy as jnp

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain

    dom = Domain.structured(3, n)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    return dom, Kb, bb


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)

    from feddlib_tpu.solvers.krylov import cg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    n = 64 if on_tpu else 12  # 275k dofs, 4.0M nnz on TPU
    dom, Kb, bb = _build_poisson(n)
    nnz = Kb.nnz
    ell_cols, ell_data = Kb.ell_arrays()  # [K, N] transposed planes
    ell_data = ell_data.block_until_ready()

    @jax.jit
    def spmv_chain(data, cols, x, steps):
        def body(i, x):
            y = jnp.sum(data * x[cols], axis=0)
            return y * lax.rsqrt(jnp.vdot(y, y))

        return lax.fori_loop(0, steps, body, x)

    x = jnp.ones(dom.n_nodes, jnp.float64)
    x = x / jnp.linalg.norm(x)
    spmv_chain(ell_data, ell_cols, x, 2).block_until_ready()  # compile

    n_lo, n_hi = (10, 210) if on_tpu else (2, 12)

    def timed(steps):
        t0 = time.perf_counter()
        spmv_chain(ell_data, ell_cols, x, steps).block_until_ready()
        return time.perf_counter() - t0

    t_lo = min(timed(n_lo) for _ in range(3))
    t_hi = min(timed(n_hi) for _ in range(3))
    dt = (t_hi - t_lo) / (n_hi - n_lo)
    nnz_per_s = nnz / dt

    # bandwidth roofline for this kernel (f64): per nnz slot read
    # 8B value + 4B col + 8B gathered x; + output write per row
    slots = ell_data.size
    bytes_per_pass = slots * (8 + 4 + 8) + dom.n_nodes * 8 * 2
    hbm_gbps = 819e9 if on_tpu else 50e9  # v5e ≈ 819 GB/s
    roofline_nnz_s = nnz / (bytes_per_pass / hbm_gbps)
    vs = nnz_per_s / roofline_nnz_s

    # correctness anchor: Schwarz-free CG to 1e-8 on a smaller cube (keeps
    # the while_loop compile cheap through the remote-compile tunnel)
    dom2, Kb2, bb2 = _build_poisson(24 if on_tpu else 8)
    t0 = time.perf_counter()
    res = cg(Kb2.matvec, bb2, tol=1e-8, maxiter=2000)
    cg_s = time.perf_counter() - t0

    print(json.dumps({
        "metric": "spmv_nnz_per_s_f64",
        "value": round(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
        "extra": {
            "device": str(dev),
            "n_dofs": dom.n_nodes,
            "nnz": nnz,
            "spmv_us": round(dt * 1e6, 1),
            "gnnz_per_s": round(nnz_per_s / 1e9, 3),
            "cg_dofs": dom2.n_nodes,
            "cg_iters_to_1e-8": res.iters,
            "cg_converged": bool(res.converged),
            "cg_total_s": round(cg_s, 2),
        },
    }))


if __name__ == "__main__":
    main()
