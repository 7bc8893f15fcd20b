#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline (BASELINE.md north star): SpMV throughput (nnz/s) through the
row-distributed ELL kernel on a 3D P1 Poisson matrix, plus Schwarz-CG
iteration counts as correctness anchors.  `vs_baseline` is achieved / the
HBM bandwidth roofline for the kernel (speed-of-light fraction), since the
reference publishes no throughput numbers (BASELINE.md).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_enable_x64", True)

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.solvers.krylov import cg

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    # 3D Poisson on a structured cube — ~275k dofs, ~4.1M nnz
    n = 64 if on_tpu else 12
    dom = Domain.structured(3, n)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    nnz = Kb.nnz

    x = jnp.ones(dom.n_nodes, jnp.float64)
    matvec = Kb.matvec  # inner kernel is jitted; ELL plan passed as args
    y = matvec(x).block_until_ready()  # compile + warmup

    reps = 200 if on_tpu else 5
    t0 = time.perf_counter()
    for _ in range(reps):
        y = matvec(x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    nnz_per_s = nnz / dt

    # bandwidth roofline for the padded-ELL kernel (f64):
    # per padded slot: 8B value + 4B col idx + 8B gathered x; K-padded rows
    ell_cols, ell_data = Kb.ell_arrays()
    slots = ell_data.size
    bytes_per_pass = slots * (8 + 4 + 8) + dom.n_nodes * 8
    hbm_gbps = 819e9 if on_tpu else 50e9  # v5e ≈ 819 GB/s
    roofline_nnz_s = nnz / (bytes_per_pass / hbm_gbps)
    vs = nnz_per_s / roofline_nnz_s

    # correctness anchor: CG converges to 1e-8
    res = cg(matvec, bb, tol=1e-8, maxiter=3000)

    print(json.dumps({
        "metric": "spmv_nnz_per_s_f64",
        "value": round(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
        "extra": {
            "device": str(dev),
            "n_dofs": dom.n_nodes,
            "nnz": nnz,
            "ell_padding_overhead": round(slots / nnz, 3),
            "spmv_ms": round(dt * 1e3, 3),
            "cg_iters_to_1e-8": res.iters,
            "cg_converged": res.converged,
        },
    }))


if __name__ == "__main__":
    main()
