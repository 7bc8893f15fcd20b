#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: SpMV throughput on a 3D P1 Poisson operator via the TPU-native
dense row-cluster path (feddlib_tpu.la.dense_blocks) in f32 — the format
every hot solver iteration uses on TPU.  Accuracy is delivered by
mixed-precision iterative refinement (f64 residuals + f32 inner Krylov,
feddlib_tpu.solvers.refinement), reported as the correctness anchor at the
reference's 1e-8 tolerance.

Timing method: N chained applies inside ONE jitted fori_loop with operator
data passed as ARGUMENTS (constants baked into remote compiles are both
slow and size-limited), two loop lengths differenced, completion forced by
a value fetch (async dispatch makes `block_until_ready` unreliable through
the axon tunnel).  `vs_baseline` = achieved fraction of the HBM streaming
roofline for the dense blocks.
"""

import json
import time

import numpy as np


def main():
    import sys

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache absorbs the remote-compile latency
        jax.config.update("jax_compilation_cache_dir", ".bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t_start = time.time()

    def note(msg):
        print(f"[bench {time.time()-t_start:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.dense_blocks import DenseBlockSchwarz, DenseBlockSpMV
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.solvers.krylov import gmres, solve_jit
    from feddlib_tpu.solvers.refinement import iterative_refinement

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    n = 40 if on_tpu else 10  # 69k dofs / 1.0M nnz on TPU
    note(f"device {dev}")
    dom = Domain.structured(3, n)
    K = ops.assemble_laplace(dom)
    bcb = BCBuilder()
    bcb.add_bc(lambda x, t: 0.0, 1, 0, dom, "Dirichlet", 1)
    b = ops.assemble_rhs(dom, lambda x: 1.0 + 0 * x[0])
    Kb, bb = bcb.apply_symmetric(K, b, 0)
    nnz = Kb.nnz

    note(f"assembled n={dom.n_nodes} nnz={nnz}")
    n_clusters = 256 if on_tpu else 8
    part = MeshPartition(dom.mesh, n_clusters)
    cluster = part.unique_map.owner_of()
    db32 = DenseBlockSpMV.from_csr(Kb, cluster, dtype=jnp.float32)

    from feddlib_tpu.la.dense_blocks import _batched_gemv, _gather_ghosts

    @jax.jit
    def chain(blocks, ghost_idx, ghost_rows, ghost_onehot, xp, steps):
        P, R = blocks.shape[0], blocks.shape[1]

        def body(i, x):
            x_own = x.reshape(P, R)
            ghosts = _gather_ghosts(ghost_idx, ghost_rows, ghost_onehot, x)
            xs = jnp.concatenate([x_own, ghosts], axis=1)
            y = _batched_gemv(blocks, xs).reshape(-1)
            return y * lax.rsqrt(jnp.vdot(y, y) + 1e-30)

        return lax.fori_loop(0, steps, body, xp)

    note(f"dense blocks P={db32.P} R={db32.R} G={db32.G}")
    xp = db32.to_padded(jnp.ones(dom.n_nodes, jnp.float32))
    gargs = (db32.blocks, db32.ghost_idx, db32.ghost_rows, db32.ghost_onehot)
    r = chain(*gargs, xp, 2)
    _ = float(jnp.asarray(r).ravel()[0])  # compile + sync
    note("spmv chain compiled")

    lo, hi = (3, 43) if on_tpu else (2, 8)

    def run(steps):
        t0 = time.perf_counter()
        rr = chain(*gargs, xp, steps)
        _ = float(jnp.asarray(rr).ravel()[0])
        return time.perf_counter() - t0

    t_lo = min(run(lo) for _ in range(3))
    t_hi = min(run(hi) for _ in range(3))
    dt = max((t_hi - t_lo) / (hi - lo), 1e-9)
    nnz_per_s = nnz / dt

    bytes_per_pass = db32.blocks.size * 4 \
        + db32.ghost_onehot.size * 4 + db32.ghost_rows.size * (128 * 4 + 4) \
        + db32.blocks.shape[0] * db32.blocks.shape[1] * 4 * 2
    hbm_gbps = 819e9 if on_tpu else 50e9
    vs = (nnz / dt) / (nnz / (bytes_per_pass / hbm_gbps))

    # secondary metric: batched FE assembly throughput — the
    # insertGlobalValues→fillComplete hot path (SURVEY §3.1 HOT LOOP #1),
    # measured on the production fast path: element-last kernels +
    # triple-f32 exact scatter (fe/fast_assembly.py)
    from feddlib_tpu.fe import fast_assembly as fa
    from feddlib_tpu.la.csr import assemble_csr_data, assemble_csr_data_tri

    pat = fa.pattern_abe(dom, 1)
    plan = pat.duplication_plan()
    vc = dom.vert_coords()

    @jax.jit
    def asm_chain(vcoords, steps):
        def body(i, acc):
            # acc-dependent perturbation defeats loop-invariant hoisting
            flat = fa.elem_laplace_flat_T(vcoords * (1.0 + acc * 1e-30),
                                          3, "P1")
            if on_tpu and plan[0] is not None:
                data = assemble_csr_data_tri(flat, plan[0], pat.nnz, plan[1])
            else:
                data = assemble_csr_data(
                    flat, jnp.asarray(pat.coo_slots.astype(np.int32)),
                    pat.nnz)
            return acc + data[0] * 1e-30

        return lax.fori_loop(0, steps, body, 0.0)

    _ = float(asm_chain(vc, 2))
    note("assembly chain compiled")

    def arun(steps):
        t0 = time.perf_counter()
        _ = float(asm_chain(vc, steps))
        return time.perf_counter() - t0

    alo, ahi = (2, 12) if on_tpu else (2, 5)
    a_lo = min(arun(alo) for _ in range(3))
    a_hi = min(arun(ahi) for _ in range(3))
    a_dt = max((a_hi - a_lo) / (ahi - alo), 1e-9)
    elems_per_s = dom.n_elements / a_dt
    note(f"assembly {a_dt*1e3:.2f} ms / {dom.n_elements} elems")

    # correctness anchor: mixed-precision IR to the reference tolerance 1e-8.
    # The whole inner Krylov loop runs in PADDED cluster space: the SpMV and
    # the overlap-1 restricted-Schwarz apply share the fast halo exchange
    # and skip all permutation gathers (pad lanes are zero, so dots agree).
    prec32 = DenseBlockSchwarz(Kb, db32)
    A_fn, A_ops = db32.padded_operator()
    M_fn, M_ops = prec32.padded_operator()

    def inner(r32):
        res = solve_jit("gmres", A_fn, A_ops, db32.to_padded(r32),
                        M_fn=M_fn, M_ops=M_ops,
                        tol=1e-6, maxiter=150, restart=80)
        res.x = db32.from_padded(res.x)
        return res

    note("starting IR anchor")
    t0 = time.perf_counter()
    res = iterative_refinement(Kb.matvec, inner, bb, tol=1e-8)
    ir_s = time.perf_counter() - t0
    note("IR done")

    print(json.dumps({
        "metric": "dense_block_spmv_nnz_per_s_f32",
        "value": round(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
        "extra": {
            "device": str(dev),
            "n_dofs": dom.n_nodes,
            "nnz": nnz,
            "spmv_ms": round(dt * 1e3, 3),
            "clusters": int(db32.P),
            "dense_overhead_x": round(db32.blocks.size / nnz, 1),
            "ir_converged_1e-8": bool(res.converged),
            "ir_passes": res.passes,
            "ir_inner_iters": res.iters,
            "ir_relres": float(res.relres),
            "ir_total_s": round(ir_s, 2),
            "assembly_elems_per_s": round(elems_per_s),
            "assembly_ms": round(a_dt * 1e3, 3),
        },
    }))


if __name__ == "__main__":
    main()
