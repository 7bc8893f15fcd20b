#!/usr/bin/env python
"""FSI driver — the feddlib_tpu analog of the reference's
problems/tests/fsi/main.cpp: monolithic fluid-structure interaction with
geometry-explicit (GE) or geometry-implicit (GI) coupling, FaCSI or
monolithic-Schwarz preconditioning, Newmark solid + BDF fluid, and the
Turek tip-displacement observable.

Reference flag convention (main.cpp:619-621 'Zusammenfassung der Flags'):
  fluid/geometry: 1 = wall, 2 = inflow, 3 = outflow, 4 = obstacle,
                  5 = interface (2D)
  structure:      1 = clamped (left side), 5 = interface (2D)

Two scenarios:
  (default)      conforming two-box fluid-over-elastic-slab (structured,
                 CPU-friendly smoke / regression scenario)
  --mesh-fluid / --mesh-solid   the Turek FSI meshes
                 (/root/reference/meshes/dfg_fsi_fluid_h004.mesh +
                 dfg_fsi_solid_h004.mesh), parabolic inflow with
                 MeanVelocity, tip displacement at A = (0.6, 0.2)
                 (FSI_def.hpp:135 tip-point lookup).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])

IFACE_BOX = 9     # two-box scenario interface flag
IFACE_TUREK = 5   # reference dfg_fsi mesh interface flag


def _tube(n):
    """Artery-like channel with an elastic wall — the fsi_artery / Tube2D
    analog (reference main.cpp bcType 'Tube2D'): fluid [0,5]x[0,1] below an
    elastic wall [0,5]x[1,1.2]; pulsed parabolic inflow at x=0, symmetry
    axis at y=0, wall clamped at both ends.  Flags: 2 inflow, 3 outflow,
    6 axis, 1 wall ends (solid), IFACE interface."""
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.structured import (build_structured_mesh,
                                             flag_boxed_boundary)

    L, H, T = 5.0, 1.0, 0.2
    fluid = build_structured_mesh(2, (5 * n, n), lower=[0, 0], upper=[L, H])
    solid = build_structured_mesh(2, (5 * n, max(n // 2, 1)),
                                  lower=[0, H], upper=[L, H + T])
    flag_boxed_boundary(fluid, [0, 0], [L, H],
                        {"x0": 2, "x1": 3, "y0": 6, "y1": IFACE_BOX})
    # interface flag applied LAST so the wall-end corners on y=H match the
    # fluid side (the corner nodes must be interface on BOTH meshes)
    flag_boxed_boundary(solid, [0, H], [L, H + T],
                        {"x0": 1, "x1": 1, "y1": 7, "y0": IFACE_BOX})
    dom_fp, dom_sp = Domain(fluid), Domain(solid)
    return dom_fp.p2_domain(), dom_fp, dom_sp.p2_domain(), IFACE_BOX


def _two_box(n):
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.structured import build_structured_mesh

    fluid = build_structured_mesh(2, (n, n), lower=[0, 0.5], upper=[1, 1])
    solid = build_structured_mesh(2, (n, n), lower=[0, 0], upper=[1, 0.5])
    for mesh in (fluid, solid):
        sel = np.isclose(mesh.points[:, 1], 0.5)
        mesh.point_flags[sel] = IFACE_BOX
        if mesh.surfaces is not None:
            on = np.all(np.isclose(mesh.points[mesh.surfaces][:, :, 1], 0.5),
                        axis=1)
            mesh.surface_flags[on] = IFACE_BOX
    dom_fp, dom_sp = Domain(fluid), Domain(solid)
    return dom_fp.p2_domain(), dom_fp, dom_sp.p2_domain(), IFACE_BOX


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    ap.add_argument("--mesh-fluid", default=None)
    ap.add_argument("--mesh-solid", default=None)
    ap.add_argument("--n", type=int, default=4, help="two-box cells")
    ap.add_argument("--scenario", default="box", choices=["box", "tube"],
                    help="box: lid-driven two-box; tube: artery-like "
                         "pulsed channel with elastic wall (fsi_artery)")
    ap.add_argument("--t-end", type=float, default=0.06)
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--mode", default="GE", choices=["GE", "GI"])
    ap.add_argument("--prec", default=None,
                    help="FaCSI | SchwarzOneLevel | Jacobi")
    ap.add_argument("--mean-velocity", type=float, default=None)
    ap.add_argument("--out", default=None, help="observable txt prefix")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems.fsi import FSI
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.reference_compat import load_reference_configs

    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl["dt"] = args.dt
    pl.setdefault("Maximum Iterations", 8000)
    pl.setdefault("Convergence Tolerance", 1e-9)
    pl.setdefault("MaxNonLinIts", 12)
    if args.prec:
        pl["Preconditioner Type"] = args.prec
    pl.setdefault("Preconditioner Type", "FaCSI")

    turek = bool(args.mesh_fluid)
    with timers.timer("mesh"):
        if turek:
            dom_fp = Domain.from_file(args.mesh_fluid, fe_type="P1")
            dom_sp = Domain.from_file(args.mesh_solid, fe_type="P1")
            dom_u, dom_p = dom_fp.p2_domain(), dom_fp
            dom_d = dom_sp.p2_domain()
            iface = IFACE_TUREK
            # Turek FSI2-ish defaults (parametersProblem.xml)
            pl.setdefault("Viscosity", 1e-3)
            pl.setdefault("Density Fluid", 1e-3)
            pl.setdefault("Density Solid", 1e-3)
            pl.setdefault("E", 1.4e3)
            pl.setdefault("Poisson Ratio", 0.4)
        elif args.scenario == "tube":
            dom_u, dom_p, dom_d, iface = _tube(args.n)
            pl.setdefault("Viscosity", 0.03)
            pl.setdefault("E", 100.0)
            pl.setdefault("Poisson Ratio", 0.3)
            pl["Geometry Boundary Flags"] = (2, 3, 6)
        else:
            dom_u, dom_p, dom_d, iface = _two_box(args.n)
            pl.setdefault("Viscosity", 0.1)
            pl.setdefault("E", 50.0)
            pl.setdefault("Poisson Ratio", 0.3)
    print(f"fluid u: {dom_u}\nfluid p: {dom_p}\nsolid d: {dom_d}")

    prob = FSI(dom_u, dom_p, dom_d, [iface], parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()

    if turek:
        vbar = (args.mean_velocity if args.mean_velocity is not None
                else float(pl.get("MeanVelocity", 0.2)))
        H = 0.41

        def inflow(x, t):
            ux = 1.5 * vbar * 4.0 * x[1] * (H - x[1]) / H ** 2
            return jnp.array([ux, 0.0])

        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 0)   # walls
        prob.add_bc(inflow, 2, 0)                       # inflow
        prob.add_bc(lambda x, t: jnp.zeros(2), 4, 0)   # cylinder
        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 2)   # solid clamped
        tip_point = [0.6, 0.2]                          # Turek point A
    elif args.scenario == "tube":
        def pulse(x, t):  # pulsed parabolic inflow (artery pressure pulse)
            amp = 0.5 * (1.0 - jnp.cos(2 * jnp.pi * t / 0.4))
            prof = x[1] * (2.0 - x[1])  # parabolic over [0, 1], max at axis
            return jnp.array([amp * prof, 0.0])

        prob.add_bc(pulse, 2, 0)                           # inflow
        prob.bc_builder.add_bc(lambda x, t: 0.0, 6, 0,     # symmetry axis
                               prob.variables[0][0], "Dirichlet_Y", 2)
        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 2)       # wall ends
        tip_point = [2.5, 1.0]                             # wall midpoint
    else:
        def lid(x, t):
            on_lid = jnp.isclose(x[1], 1.0)
            return jnp.where(on_lid, jnp.array([0.5, 0.0]), jnp.zeros(2))

        prob.add_bc(lid, 1, 0)
        prob.add_bc(lambda x, t: jnp.zeros(2), 1, 2)
        tip_point = [0.5, 0.5]

    history = []

    def observer(t, _sol):
        tip = np.asarray(prob.tip_displacement(tip_point))
        history.append((t, *tip))
        print(f"  t={t:.4f}  tip=({tip[0]: .5e}, {tip[1]: .5e})")

    with timers.timer("advance"):
        if args.mode == "GE":
            prob.advance(t_end=args.t_end, observer=observer)
        else:
            prob.advance_gi(t_end=args.t_end, observer=observer)

    d = np.asarray(prob.solution[2])
    lam = np.asarray(prob.solution[3])
    assert np.isfinite(d).all(), "solid displacement diverged"
    print(f"max |d| = {np.abs(d).max():.5e}   max |lambda| = "
          f"{np.abs(lam).max():.5e}")

    if args.out:
        from feddlib_tpu.io.exporter import ExporterTxt

        ext = ExporterTxt(args.out + "_tip.txt")
        for row in history:
            ext.write(*row)
        ext.close()
        print(f"wrote {args.out}_tip.txt")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
