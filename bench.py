#!/usr/bin/env python
"""Benchmark driver — prints ONE JSON line with the headline metric.

Headline: SpMV throughput on a 3D P1 Poisson operator (275k dofs /
4.0M nnz) via the AUTO-SELECTED TPU format (feddlib_tpu.la.dia.auto_spmv)
in f32 — DIA (gather-free diagonal streaming) for banded/structured
operators, windowed sliced-ELL otherwise.  `vs_baseline` = achieved
fraction of the CHIP's sparse speed-of-light (8 B/nnz — 4B value + 4B
index — at the 819 GB/s v5e HBM stream), per the round-1 verdict's
reporting prescription; DIA streams ~4.6 B/nnz, so vs_baseline > 1 means
the format beats the byte-minimal *indexed* roofline.

Extras (in priority order, each gated on a wall-clock budget — the
persistent XLA cache does NOT deduplicate remote axon compiles across
processes, so every section pays its compile every run; the JSON line is
ALWAYS printed with whatever sections fit):
  1. block-DIA on the 3D P1 linear-elasticity operator (8.9M nnz, planar
     [d, nn] vectors)
  2. the north-star chain M(A(x)) — padded SELL SpMV + padded two-level
     (dense-block Schwarz + GDSW coarse) — and the mixed-precision IR
     accuracy anchor at 1e-8
  3. windowed sliced-ELL (general-format) on the headline operator
  4. batched FE assembly throughput (device element kernels + Pallas
     plan-matrix scatter)

Timing method: N chained applies inside ONE jitted fori_loop with operator
data passed as ARGUMENTS (constants baked into remote compiles are both
slow and size-limited), two loop lengths differenced, completion forced by
a value fetch (async dispatch makes `block_until_ready` unreliable through
the axon tunnel).

Benchmark INPUT operators are assembled on the host (fe/host_assembly.py,
asserted equal to the device FE path in tests) — a cold remote compile of
the 1.5M-element device assembly chain costs ~3 min of pure harness
overhead; the device assembly path itself is still measured as its own
metric (section 4).
"""

import json
import os
import time

import numpy as np

BUDGET_S = float(os.environ.get("FEDD_BENCH_BUDGET_S", 720))


def main():
    import sys

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_enable_x64", True)
    try:  # persistent compile cache (helps within-process re-traces)
        jax.config.update("jax_compilation_cache_dir", ".bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    t_start = time.time()

    def note(msg):
        print(f"[bench {time.time()-t_start:6.1f}s] {msg}", file=sys.stderr,
              flush=True)

    def have_time(est_s):
        return (time.time() - t_start) + est_s < BUDGET_S

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.fe.host_assembly import (host_lin_elasticity_p1,
                                              host_poisson_dirichlet)
    from feddlib_tpu.la.csr import CsrMatrix
    from feddlib_tpu.la.dense_blocks import DenseBlockSpMV
    from feddlib_tpu.la.dia import auto_spmv
    from feddlib_tpu.la.sell import PaddedSplitSpMV, SellMatrix
    from feddlib_tpu.mesh.partition import MeshPartition
    from feddlib_tpu.solvers.krylov import solve_jit
    from feddlib_tpu.solvers.refinement import iterative_refinement

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"

    n = 40 if on_tpu else 10  # 69k dofs / 1.0M nnz on TPU
    note(f"device {dev}")
    dom = Domain.structured(3, n)
    Kb_sp, bb_np = host_poisson_dirichlet(dom)
    Kb = CsrMatrix.from_scipy(Kb_sp)
    bb = jnp.asarray(bb_np)
    nnz = Kb.nnz
    note(f"assembled n={dom.n_nodes} nnz={nnz}")

    # headline operator: larger (275k dofs / 4.0M nnz) so streaming, not
    # launch overhead, is what gets measured
    nh = 64 if on_tpu else 12
    dom_h = Domain.structured(3, nh)
    Khb, _ = host_poisson_dirichlet(dom_h)
    nnz_h = Khb.nnz
    note(f"headline operator n={dom_h.n_nodes} nnz={nnz_h}")

    compile_s = {}
    repeat_stats = {}

    def time_chain(fn, opnds, nx, lo, hi, label=None):
        @jax.jit
        def chain(opnds, x0, steps):
            def body(i, xx):
                yy = fn(opnds, xx)
                return yy * lax.rsqrt(jnp.vdot(yy, yy).astype(jnp.float32)
                                      + 1e-30)
            return lax.fori_loop(0, steps, body, x0)

        x0 = jnp.ones(nx, jnp.float32)  # nx: int or shape tuple
        t0 = time.perf_counter()
        r = chain(opnds, x0, 2)
        _ = float(jnp.asarray(r).ravel()[0])  # compile + sync
        if label:  # compile time reported separately — it contaminates
            compile_s[label] = round(time.perf_counter() - t0, 2)
        # wide loop-length difference: the axon tunnel adds ~ms fetch
        # jitter, so the extra applies must dominate it

        def run(steps):
            t0 = time.perf_counter()
            rr = chain(opnds, x0, steps)
            _ = float(jnp.asarray(rr).ravel()[0])
            return time.perf_counter() - t0

        # >=3 repeats each; report min AND median per-apply so a
        # round-over-round move is classifiable as noise vs regression
        # (round-4 weak item 7: 169->154 Gnnz/s was unclassifiable)
        lo_s = sorted(run(lo) for _ in range(3))
        hi_s = sorted(run(hi) for _ in range(3))
        dt_min = max((hi_s[0] - lo_s[0]) / (hi - lo), 1e-9)
        dt_med = max((hi_s[1] - lo_s[1]) / (hi - lo), 1e-9)
        if label:
            repeat_stats[label] = {
                "repeats": 3, "per_apply_ms_min": round(dt_min * 1e3, 4),
                "per_apply_ms_median": round(dt_med * 1e3, 4),
                "spread_pct": round(100.0 * (dt_med - dt_min)
                                    / max(dt_min, 1e-12), 1)}
        return dt_min

    hbm_gbps = 819e9 if on_tpu else 50e9
    sol_nnz_per_s = hbm_gbps / 8.0  # chip sparse speed-of-light at 8 B/nnz
    extra = {"device": str(dev), "chip_sol_nnz_per_s": round(sol_nnz_per_s),
             "budget_s": BUDGET_S, "skipped": []}

    # ---- headline: auto-format SpMV (DIA on this banded operator) ----------
    Ah = auto_spmv(Khb, dtype=jnp.float32)
    fmt = type(Ah).__name__
    bytes_per_nnz = Ah.hbm_bytes_per_apply() / nnz_h
    note(f"auto format {fmt} bytes/nnz={bytes_per_nnz:.2f}"
         + (f" n_offsets={len(Ah.offsets)}" if hasattr(Ah, "offsets") else ""))
    fn_h, ops_h = Ah.operator()
    dt = time_chain(fn_h, ops_h, dom_h.n_nodes,
                    *((5, 1205) if on_tpu else (2, 30)), label="headline")
    nnz_per_s = nnz_h / dt
    vs = nnz_per_s / sol_nnz_per_s
    note(f"{fmt} spmv {dt*1e3:.3f} ms = {nnz_per_s/1e9:.2f} Gnnz/s "
         f"({vs*100:.1f}% of chip speed-of-light)")
    extra.update({
        "format": fmt, "n_dofs": dom_h.n_nodes, "nnz": nnz_h,
        "spmv_ms": round(dt * 1e3, 3),
        "bytes_per_nnz": round(bytes_per_nnz, 2),
        "dense_overhead_x": round(bytes_per_nnz / 8.0, 2),
        "dia_offsets": len(Ah.offsets) if hasattr(Ah, "offsets") else 0,
    })

    # ---- extra 1: block-DIA on 3D P1 linear elasticity ---------------------
    if have_time(100 if on_tpu else 20):
        Ke = host_lin_elasticity_p1(dom, mu=1.0, lam=1.0)
        Be = auto_spmv(Ke, dtype=jnp.float32, dofs_per_node=3)
        fmt_e = type(Be).__name__
        e_bpn = Be.hbm_bytes_per_apply() / Ke.nnz
        note(f"elasticity auto format {fmt_e} n={Ke.shape[0]} nnz={Ke.nnz} "
             f"bytes/nnz={e_bpn:.2f}")
        # planar [d, nn] vectors: the interleave relayout costs more than
        # the apply itself (la/dia.py layout note)
        if hasattr(Be, "planar_operator"):
            fn_e, ops_e = Be.planar_operator()
            nx_e = (3, Ke.shape[0] // 3)
        else:
            fn_e, ops_e = Be.operator()
            nx_e = Ke.shape[0]
        dt_e = time_chain(fn_e, ops_e, nx_e,
                          *((5, 1205) if on_tpu else (2, 30)),
                          label="elasticity")
        e_nnz_per_s = Ke.nnz / dt_e
        note(f"{fmt_e} elasticity spmv {dt_e*1e3:.3f} ms = "
             f"{e_nnz_per_s/1e9:.2f} Gnnz/s "
             f"({e_nnz_per_s/sol_nnz_per_s*100:.1f}% of chip "
             f"speed-of-light)")
        extra.update({
            "elasticity_format": fmt_e, "elasticity_nnz": Ke.nnz,
            "elasticity_nnz_per_s": round(e_nnz_per_s),
            "elasticity_spmv_ms": round(dt_e * 1e3, 3),
            "elasticity_bytes_per_nnz": round(e_bpn, 2),
        })
    else:
        extra["skipped"].append("elasticity")

    # ---- extra 2: north-star M(A(x)) chain + mixed-precision IR anchor -----
    if have_time(130 if on_tpu else 15):
        n_clusters = 512 if on_tpu else 8
        t_setup = time.perf_counter()
        part = MeshPartition(dom.mesh, n_clusters)
        t_part = time.perf_counter() - t_setup
        # row clusters from count-median point RCB: balanced to ±1, so the
        # padded size R (= the [P,R,W] level-1 stream AND the padded vector
        # length) carries no arbitration imbalance (was 1.5x)
        from feddlib_tpu.mesh.partition import partition_points

        t0 = time.perf_counter()
        cluster = partition_points(dom.mesh.points, n_clusters)
        db32 = DenseBlockSpMV.from_csr(Kb, cluster, dtype=jnp.float32)
        t_blocks = time.perf_counter() - t0
        t0 = time.perf_counter()
        Ap32 = PaddedSplitSpMV(Kb, db32, dtype=jnp.float32)
        t_sellp = time.perf_counter() - t0
        note(f"padded fused SELL E={Ap32.Ac.E} K={Ap32.Ac.K}")
        A_fn, A_ops = Ap32.operator()
        # production preconditioner: padded-space TWO-LEVEL Schwarz
        # (restricted dense-block level 1 with the bf16 inverse store +
        # GDSW coarse, ADDITIVE level combination — the reference baseline
        # config, parametersPrec.xml TwoLevel=true additive;
        # precond/cluster_coarse.py)
        from feddlib_tpu.precond.cluster_coarse import PaddedTwoLevelSchwarz

        mask_d = np.asarray(dom.mesh.point_flags) == 1
        t0 = time.perf_counter()
        prec32 = PaddedTwoLevelSchwarz(Kb, part, db32,
                                       dirichlet_mask=mask_d,
                                       level_combination="Additive",
                                       l1_store_dtype=jnp.bfloat16,
                                       coarse_store_dtype=jnp.bfloat16,
                                       A_padded_op=(A_fn, A_ops))
        t_prec = time.perf_counter() - t0
        setup_s = time.perf_counter() - t_setup
        note(f"two-level Schwarz: nc={prec32.n_coarse} "
             f"c={prec32.coarse.c} setup={setup_s:.1f}s "
             f"(partition {t_part:.1f} + blocks {t_blocks:.1f} + "
             f"padded-sell {t_sellp:.1f} + level1+coarse {t_prec:.1f})")
        M_fn, M_ops = prec32.padded_operator()

        # north star (BASELINE.json "SpMV+Schwarz-apply nnz/s/chip"):
        # the per-GMRES-iteration work of SURVEY §3.5 minus the DGKS dots
        def ma_fn(packed, x):
            a_ops, m_ops = packed
            return M_fn(m_ops, A_fn(a_ops, x))

        dt_ma = time_chain(ma_fn, (A_ops, M_ops), db32.P * db32.R,
                           *((5, 105) if on_tpu else (2, 6)), label="chain")
        ma_nnz_per_s = nnz / dt_ma
        note(f"SpMV+two-level-Schwarz apply {dt_ma*1e3:.3f} ms = "
             f"{ma_nnz_per_s/1e9:.2f} Gnnz/s effective "
             f"(P={db32.P} R={db32.R} W={db32.R+db32.G})")

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
        # setup compile-vs-compute split (round-4 weak item 3): a SECOND
        # build in-process reuses every compiled program, so its wall
        # time is the COMPUTE component; cold − warm ≈ compile+transfer.
        # The cold preconditioner is freed FIRST — holding two full
        # two-level structures pushes this 2-core harness host into
        # memory pressure and pollutes the host-side (GDSW) phase.
        warm = {}
        if have_time(120 if on_tpu else 10):
            import gc

            prec_timings = dict(prec32.timings)
            nc_dim = prec32.n_coarse
            del M_fn, M_ops, prec32, inner
            gc.collect()
            t0 = time.perf_counter()
            db_w = DenseBlockSpMV.from_csr(Kb, cluster, dtype=jnp.float32)
            warm["blocks"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            Ap_w = PaddedSplitSpMV(Kb, db_w, dtype=jnp.float32)
            warm["padded_sell"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            prec_w = PaddedTwoLevelSchwarz(Kb, part, db_w,
                                           dirichlet_mask=mask_d,
                                           level_combination="Additive",
                                           l1_store_dtype=jnp.bfloat16,
                                           coarse_store_dtype=jnp.bfloat16,
                                           A_padded_op=(A_fn, A_ops))
            warm["level1"] = prec_w.timings["level1_s"]
            warm["gdsw"] = prec_w.timings["gdsw_s"]
            warm["coarse_layout"] = prec_w.timings["coarse_layout_s"]
            warm["total"] = sum(warm.values())
            note(f"WARM setup (compute component): "
                 + " ".join(f"{k}={v:.1f}s" for k, v in warm.items()))
            del prec_w, db_w, Ap_w
            gc.collect()
        extra.update({
            "spmv_schwarz_apply_ms": round(dt_ma * 1e3, 3),
            "spmv_schwarz_nnz_per_s": round(ma_nnz_per_s),
            "schwarz_clusters": db32.P,
            "schwarz_levels": 2,
            "schwarz_setup_s": round(setup_s, 2),
            "setup_partition_s": round(t_part, 2),
            "setup_blocks_s": round(t_blocks, 2),
            "setup_padded_sell_s": round(t_sellp, 2),
            "setup_level1_s": round(prec_timings["level1_s"], 2),
            "setup_gdsw_s": round(prec_timings["gdsw_s"], 2),
            "setup_coarse_layout_s": round(
                prec_timings["coarse_layout_s"], 2),
            "level_combination": "Additive",
            "l1_store": "bf16",
            "coarse_dim": nc_dim,
            "ir_converged_1e-8": bool(res.converged),
            "ir_passes": res.passes,
            "ir_inner_iters": res.iters,
            "ir_relres": float(res.relres),
            "ir_total_s": round(ir_s, 2),
            "setup_warm_s": {k: round(v, 2) for k, v in warm.items()},
        })
    else:
        extra["skipped"].append("two_level_ir")

    # ---- extra 3b: UNSTRUCTURED SpMV — RCM-banded DIA+SELL split -----------
    # (round-4 verdict item 3: unstructured meshes are the reference's
    # normal case; format answer, not kernel tuning)
    if have_time(180 if on_tpu else 25):
        from feddlib_tpu.la.dia import SplitDiaMatrix
        from feddlib_tpu.mesh.refine import refine_uniform

        dom_u0 = Domain.from_file("/root/reference/meshes/cube4.mesh")
        mesh_u = refine_uniform(dom_u0.mesh) if on_tpu else dom_u0.mesh
        dom_u = Domain(mesh_u)
        Ku = host_lin_elasticity_p1(dom_u, mu=1.0, lam=1.0)
        note(f"unstructured operator n={Ku.shape[0]} nnz={Ku.nnz} "
             f"({mesh_u.n_points} nodes)")
        t0 = time.perf_counter()
        Su = SplitDiaMatrix.from_csr(Ku, dtype=jnp.float32, dofs_per_node=3,
                                     min_occupancy=0.3, min_dia_share=0.05)
        t_su = time.perf_counter() - t0
        if Su is not None:
            fn_u, ops_u = Su.permuted_operator()
            dt_u = time_chain(fn_u, ops_u, (3, Su.nn),
                              *((5, 205) if on_tpu else (2, 6)),
                              label="unstructured")
            u_nnz_per_s = Ku.nnz / dt_u
            note(f"unstructured split spmv {dt_u*1e3:.3f} ms = "
                 f"{u_nnz_per_s/1e9:.2f} Gnnz/s (dia share "
                 f"{Su.dia_share:.2f}, setup {t_su:.1f}s)")
            extra.update({
                "unstructured_nnz": Ku.nnz,
                "unstructured_nnz_per_s": round(u_nnz_per_s),
                "unstructured_spmv_ms": round(dt_u * 1e3, 3),
                "unstructured_dia_share": round(Su.dia_share, 3),
                "unstructured_bytes_per_nnz": round(
                    Su.hbm_bytes_per_apply() / Ku.nnz, 2),
                "unstructured_format": "SplitDiaMatrix",
            })
    else:
        extra["skipped"].append("unstructured")

    # ---- extra 3: general-format windowed sliced-ELL -----------------------
    if have_time(45 if on_tpu else 10):
        A32 = SellMatrix.from_csr(Khb, dtype=jnp.float32)
        spill = 0 if A32.spill_rows is None else int(A32.spill_rows.size)
        sell_bpn = A32.hbm_bytes_per_apply() / nnz_h
        note(f"SELL E={A32.E} K={A32.K} chunks={A32.vals.shape[0]} "
             f"spill={spill} bytes/nnz={sell_bpn:.2f}")
        fn_s, ops_s = A32.operator()
        dt_s = time_chain(fn_s, ops_s, dom_h.n_nodes,
                          *((5, 205) if on_tpu else (2, 12)), label="sell")
        sell_nnz_per_s = nnz_h / dt_s
        note(f"SELL spmv {dt_s*1e3:.3f} ms = "
             f"{sell_nnz_per_s/1e9:.2f} Gnnz/s "
             f"({sell_nnz_per_s/sol_nnz_per_s*100:.1f}% of chip "
             f"speed-of-light)")
        extra.update({
            "sell_nnz_per_s": round(sell_nnz_per_s),
            "sell_spmv_ms": round(dt_s * 1e3, 3),
            "sell_bytes_per_nnz": round(sell_bpn, 2),
            "sell_E": A32.E, "sell_K": A32.K, "spill_nnz": spill,
        })
    else:
        extra["skipped"].append("sell")

    # ---- extra 4: batched FE assembly throughput ---------------------------
    if have_time(185 if on_tpu else 20):
        from feddlib_tpu.fe import fast_assembly as fa
        from feddlib_tpu.la.csr import (assemble_csr_data,
                                        assemble_csr_data_tri)

        pat = fa.pattern_abe(dom, 1)
        plan = pat.duplication_plan()
        vc = dom.vert_coords()
        # Pallas scatter-assembly: the COO→CSR reduction as a windowed-SELL
        # SpMV of the 0/1 plan matrix (f32 — the mixed-precision production
        # path) instead of the serial XLA scatter
        sell_plans = (fa.sell_assembly_plans(pat, dom.n_elements)
                      if on_tpu else None)
        sell_ops = fa.sell_assembly_ops(sell_plans) if sell_plans else None

        @jax.jit
        def asm_chain(vcoords, sops, steps):
            def body(i, acc):
                # acc-dependent perturbation defeats loop-invariant hoisting
                flat = fa.elem_laplace_flat_T(
                    vcoords * (1.0 + acc * 1e-30), 3, "P1")
                if sell_plans is not None:
                    data = fa.sell_assemble(sell_plans,
                                            flat.astype(jnp.float32),
                                            ops_list=sops)
                elif plan[0] is not None:
                    data = assemble_csr_data_tri(flat, plan[0], pat.nnz,
                                                 plan[1])
                else:
                    data = assemble_csr_data(
                        flat, jnp.asarray(pat.coo_slots.astype(np.int32)),
                        pat.nnz)
                return acc + data[0] * 1e-30

            return lax.fori_loop(0, steps, body, 0.0)

        _ = float(asm_chain(vc, sell_ops, 2))
        note("assembly chain compiled")

        def arun(steps):
            t0 = time.perf_counter()
            _ = float(asm_chain(vc, sell_ops, steps))
            return time.perf_counter() - t0

        alo, ahi = (2, 12) if on_tpu else (2, 5)
        a_lo = min(arun(alo) for _ in range(3))
        a_hi = min(arun(ahi) for _ in range(3))
        a_dt = max((a_hi - a_lo) / (ahi - alo), 1e-9)
        elems_per_s = dom.n_elements / a_dt
        note(f"assembly {a_dt*1e3:.2f} ms / {dom.n_elements} elems")
        extra.update({
            "assembly_elems_per_s": round(elems_per_s),
            "assembly_ms": round(a_dt * 1e3, 3),
        })
    else:
        extra["skipped"].append("assembly")

    extra["compile_s"] = compile_s
    extra["repeat_stats"] = repeat_stats
    print(json.dumps({
        "metric": "spmv_nnz_per_s_f32_auto",
        "value": round(nnz_per_s),
        "unit": "nnz/s",
        "vs_baseline": round(vs, 4),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
