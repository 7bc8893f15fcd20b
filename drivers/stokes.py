#!/usr/bin/env python
"""Stokes driver — the feddlib_tpu analog of the reference's
problems/tests/stokes/main.cpp: channel / backward-facing-step flow with a
parabolic inflow (BC Type 'parabolic', main.cpp inflowParabolic2D/3D),
Taylor-Hood P2/P1 (or stabilized P1/P1), Schwarz-preconditioned GMRES or a
block preconditioner, ParaView export of u and p.

Reference BC flags (structured BFS / bundled meshes): 1 = walls (zero
Dirichlet), 2 = inflow (parabolic profile), 3 = outflow (natural), 4 =
obstacle (zero, 'parabolic_benchmark').

Example with the reference's committed configs:
  python drivers/stokes.py \
      --problemfile /root/reference/feddlib/problems/tests/stokes/parametersProblem.xml \
      --precfile    /root/reference/feddlib/problems/tests/stokes/parametersPrec.xml \
      --solverfile  /root/reference/feddlib/problems/tests/stokes/parametersSolver.xml
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    ap.add_argument("--mesh", default=None, help=".mesh file (else BFS)")
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--h", type=float, default=0.125, help="BFS mesh size")
    ap.add_argument("--fe", default="P2", choices=["P2", "P1"],
                    help="velocity space (P1 adds BD stabilization)")
    ap.add_argument("--subdomains", type=int, default=4)
    ap.add_argument("--max-velocity", type=float, default=None)
    ap.add_argument("--out", default=None, help="ParaView output prefix")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.structured import build_backward_facing_step
    from feddlib_tpu.problems import Stokes
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.reference_compat import load_reference_configs

    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl["Subdomains"] = args.subdomains
    pl.setdefault("Preconditioner Type", "SchwarzOneLevel")
    dim = int(pl.get("Dimension", args.dim))
    vmax = (args.max_velocity if args.max_velocity is not None
            else float(pl.get("MaxVelocity", 1.0)))

    with timers.timer("mesh"):
        if args.mesh:
            dom_p = Domain.from_file(args.mesh, fe_type="P1")
        else:
            dom_p = Domain(build_backward_facing_step(dim, h=args.h))
        dom_u = dom_p.p2_domain() if args.fe == "P2" else dom_p
    print(f"velocity: {dom_u}\npressure: {dom_p}")

    prob = Stokes(dom_u, dom_p, parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()

    # parabolic inflow on flag 2: profile over the inflow span, zero walls
    pts = dom_u.mesh.points
    inflow_pts = pts[dom_u.mesh.point_flags == 2]
    if len(inflow_pts) == 0:
        raise SystemExit("mesh has no inflow nodes (flag 2)")
    y0, y1 = inflow_pts[:, 1].min(), inflow_pts[:, 1].max()
    if dim == 3:
        z0, z1 = inflow_pts[:, 2].min(), inflow_pts[:, 2].max()

    def inflow(x, t):
        prof = 4.0 * (x[1] - y0) * (y1 - x[1]) / (y1 - y0) ** 2
        if dim == 3:
            prof = prof * 4.0 * (x[2] - z0) * (z1 - x[2]) / (z1 - z0) ** 2
        u = jnp.zeros(dim).at[0].set(vmax * prof)
        return u

    prob.add_bc(lambda x, t: jnp.zeros(dim), 1, 0)
    prob.add_bc(inflow, 2, 0)
    prob.add_bc(lambda x, t: jnp.zeros(dim), 4, 0)  # obstacle, if flagged
    prob.set_boundaries_rhs()
    with timers.timer("solve"):
        iters = prob.solve()
    print(f"GMRES iterations: {iters}  relres: {prob.last_relres:.3e}")

    u = np.asarray(prob.solution[0]).reshape(-1, dim)
    p = np.asarray(prob.solution[1])
    Bu = np.asarray(prob.system.get_block(1, 0).matvec(prob.solution[0]))
    print(f"max |u| = {np.abs(u).max():.4f}   max |div u| (weak) = "
          f"{np.abs(Bu).max():.2e}   p range [{p.min():.3f}, {p.max():.3f}]")

    if args.out:
        from feddlib_tpu.io.exporter import ExporterParaView

        exp_u = ExporterParaView(dom_u, args.out + "_velocity")
        exp_u.add_variable("u", dim)
        exp_u.save(0.0, {"u": u.reshape(-1)})
        exp_u.close()
        exp_p = ExporterParaView(dom_p, args.out + "_pressure")
        exp_p.add_variable("p", 1)
        exp_p.save(0.0, {"p": p})
        exp_p.close()
        print(f"wrote {args.out}_velocity/_pressure .h5/.xmf")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
