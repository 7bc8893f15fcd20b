#!/usr/bin/env python
"""Adaptive Laplace driver — the laplaceAdaptive test analog (reference
problems/tests/laplaceAdaptive): solve → estimate → mark (Doerfler/Maximum)
→ refine (red/green or bisection) cycles with ParaView output per cycle.

  python drivers/laplace_adaptive.py --cpu --cycles 4 --theta 0.6
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--dim", type=int, default=2, choices=[2, 3],
                    help="3 uses the face-jump estimator + bisection")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--theta", type=float, default=0.6)
    ap.add_argument("--strategy", default="Doerfler",
                    choices=["Doerfler", "Maximum", "Uniform"])
    ap.add_argument("--method", default="redgreen",
                    choices=["redgreen", "bisection"])
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.bc import BCBuilder
    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.io import read_mesh
    from feddlib_tpu.mesh.refine import adapt, error_estimate_p1
    from feddlib_tpu.mesh.structured import build_structured_mesh
    from feddlib_tpu.solvers.krylov import cg

    mesh = (read_mesh(args.mesh) if args.mesh
            else build_structured_mesh(args.dim, args.n))
    if mesh.dim == 3 and args.method == "redgreen":
        args.method = "bisection"  # 3D adaptive path

    def r2(x):
        return sum((x[d] - 0.5) ** 2 for d in range(mesh.dim))

    fj = lambda x: jnp.exp(-100 * r2(x))
    fnp = lambda x: float(np.exp(-100 * r2(x)))

    def solve_on(mesh):
        dom = Domain(mesh)
        K = ops.assemble_laplace(dom)
        b = ops.assemble_rhs(dom, fj, degree=4)
        bcb = BCBuilder()
        for fl in sorted(set(mesh.point_flags[(mesh.point_flags > 0)
                                              & (mesh.point_flags < 10)])):
            bcb.add_bc(lambda x, t: 0.0, int(fl), 0, dom, "Dirichlet", 1)
        Kb, bb = bcb.apply_symmetric(K, b, 0)
        res = cg(Kb.matvec, bb, tol=1e-10, maxiter=5000)
        return dom, np.asarray(res.x)

    for cycle in range(args.cycles):
        dom, u = solve_on(mesh)
        eta = error_estimate_p1(mesh, u, fnp)
        total = float(np.sqrt((eta ** 2).sum()))
        print(f"cycle {cycle}: elems={mesh.n_elements:6d}  "
              f"eta={total:.4e}  u_max={u.max():.6f}")
        if args.out:
            from feddlib_tpu.io.exporter import ExporterParaView

            exp = ExporterParaView(dom, f"{args.out}_{cycle}")
            exp.add_variable("u", 1)
            exp.save(0.0, {"u": u})
            exp.close()
        if cycle + 1 < args.cycles:
            mesh, _ = adapt(mesh, u, fnp, strategy=args.strategy,
                            theta=args.theta, method=args.method)
    return 0


if __name__ == "__main__":
    sys.exit(main())
