#!/usr/bin/env python
"""Steady Navier–Stokes DFG/Turek–Hron benchmark driver — the analog of the
reference's problems/tests/steadyNavierStokes/main.cpp (partialCFD BC set,
main.cpp:317-320): parabolic inflow (flag 2), no-slip walls (1), cylinder
(4) and beam (5), natural outflow (3), P2/P1 Taylor–Hood, Newton +
Schwarz-GMRES.  Reports drag/lift on the cylinder+beam — the Turek–Hron
CFD1 observables (benchmark values at Umean=0.2: c_d·ρU²L/2 → drag 14.29,
lift 1.119).

  python drivers/navier_stokes.py --cpu \
    --mesh /root/reference/meshes/dfg_fsi_fluid_h004.mesh
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh",
                    default="/root/reference/meshes/dfg_fsi_fluid_h004.mesh")
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    # Turek-Hron CFD units: rho=1000, dynamic viscosity mu=1 (nu=1e-3)
    ap.add_argument("--viscosity", type=float, default=1.0)
    ap.add_argument("--density", type=float, default=1000.0)
    ap.add_argument("--umax", type=float, default=0.3)
    ap.add_argument("--subdomains", type=int, default=8)
    ap.add_argument("--prec", default=None,
                    help="SchwarzOneLevel | SchwarzTwoLevel | Jacobi")
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems import NavierStokes
    from feddlib_tpu.solvers.nonlinear import NonLinearSolver
    from feddlib_tpu.utils.reference_compat import load_reference_configs
    from feddlib_tpu.utils import timers

    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl["Viscosity"] = args.viscosity
    pl["Density"] = args.density
    pl["Subdomains"] = args.subdomains
    if args.prec:
        pl["Preconditioner Type"] = args.prec
    if "Preconditioner Type" not in pl:
        pl["Preconditioner Type"] = "SchwarzOneLevel"
    if "Maximum Iterations" not in pl:
        pl["Maximum Iterations"] = 4000
    if "Convergence Tolerance" not in pl:
        pl["Convergence Tolerance"] = 1e-8

    with timers.timer("mesh"):
        dom_p = Domain.from_file(args.mesh, fe_type="P1")
        dom_u = dom_p.p2_domain()
    dim = dom_u.dim
    print(f"velocity: {dom_u}   pressure: {dom_p}")

    prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()

    H = 0.41
    umax = float(pl.get("MaxVelocity", args.umax))

    if dim == 2:
        def inflow(x, t):
            uy = 4.0 * umax * x[1] * (H - x[1]) / (H * H)
            return jnp.array([uy, 0.0])
    else:
        def inflow(x, t):  # DFG 3D parabolic profile (main.cpp inflow3D)
            ux = (16.0 * umax * x[1] * x[2] * (H - x[1]) * (H - x[2])
                  / H ** 4)
            return jnp.array([ux, 0.0, 0.0])

    zero = lambda x, t: jnp.zeros(dim)
    prob.add_bc(zero, 1, 0)       # walls
    prob.add_bc(inflow, 2, 0)     # inflow
    prob.add_bc(zero, 4, 0)       # cylinder
    if dim == 2:
        prob.add_bc(zero, 5, 0)   # beam (Turek-Hron meshes)
    # flag 3 (outflow): natural — do-nothing

    solver = NonLinearSolver("Newton")
    with timers.timer("solve"):
        its = solver.solve(prob)
    print(f"Newton its: {its}  criterion: {solver.final_criterion:.2e}  "
          f"GMRES per step: {solver.linear_iters}")

    if dim == 2:
        F = prob.surface_forces([4, 5])
        print(f"forces on cylinder+beam: Fx={F[0]:.6f} Fy={F[1]:.6f}")
        print(f"drag={F[0]:.4f} lift={F[1]:.4f}  "
              f"(Turek-Hron CFD1 reference: drag 14.29, lift 1.119)")
    else:
        u_mean = 4.0 / 9.0 * umax
        F = prob.surface_forces([4])
        cd = 2 * F[0] / (prob.density * u_mean ** 2 * 0.1 * H)
        cl = 2 * F[1] / (prob.density * u_mean ** 2 * 0.1 * H)
        print(f"forces on cylinder: F={np.asarray(F)}")
        print(f"cd={cd:.4f} cl={cl:.5f}  "
              f"(DFG 3D-1Z published: cd 6.18533, cl 0.00940)")

    if args.out:
        from feddlib_tpu.io.exporter import ExporterParaView

        exp = ExporterParaView(dom_u, args.out)
        exp.add_variable("u", 2)
        exp.save(0.0, {"u": np.asarray(prob.solution[0])})
        exp.close()
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
