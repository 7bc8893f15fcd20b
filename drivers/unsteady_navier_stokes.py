#!/usr/bin/env python
"""Unsteady Navier–Stokes driver — the unsteadyNavierStokes test analog
(reference problems/tests/unsteadyNavierStokes): DFG cylinder channel,
BDF2 in time with either semi-implicit convection (Extrapolation,
reference reAssemble('Extrapolation')) or full Newton per step; drag/lift
time series exported via ExporterTxt.

  python drivers/unsteady_navier_stokes.py --cpu --t-end 0.1 --dt 0.02
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh",
                    default="/root/reference/meshes/dfg_fsi_fluid_h004.mesh")
    ap.add_argument("--viscosity", type=float, default=1.0)
    ap.add_argument("--density", type=float, default=1000.0)
    ap.add_argument("--umax", type=float, default=0.3)
    ap.add_argument("--dt", type=float, default=0.02)
    ap.add_argument("--t-end", type=float, default=0.1)
    ap.add_argument("--scheme", default="extrapolation",
                    choices=["extrapolation", "newton"])
    ap.add_argument("--out", default=None, help="drag/lift txt path")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.io.exporter import ExporterTxt
    from feddlib_tpu.problems import NavierStokes
    from feddlib_tpu.solvers.timestepping import DAESolverInTime, TimeProblem
    from feddlib_tpu.utils.config import ParameterList

    pl = ParameterList("P")
    for k, v in {"Viscosity": args.viscosity, "Density": args.density,
                 "Preconditioner Type": "SchwarzOneLevel",
                 "Subdomains": 8,
                 "Maximum Iterations": 12000,
                 "Convergence Tolerance": 1e-8}.items():
        pl[k] = v

    dom_p = Domain.from_file(args.mesh, fe_type="P1")
    dom_u = dom_p.p2_domain()
    print(f"velocity: {dom_u}   pressure: {dom_p}")
    prob = NavierStokes(dom_u, dom_p, parameter_list=pl)
    prob.assemble()

    H, umax = 0.41, args.umax

    def inflow(x, t):
        return jnp.array([4.0 * umax * x[1] * (H - x[1]) / (H * H), 0.0])

    zero2 = lambda x, t: jnp.zeros(2)
    prob.add_bc(zero2, 1, 0)
    prob.add_bc(inflow, 2, 0)
    prob.add_bc(zero2, 4, 0)
    prob.add_bc(zero2, 5, 0)

    txt = ExporterTxt(args.out) if args.out else None
    u_mean = 2.0 / 3.0 * umax

    def observer(t, sol):
        F = prob.surface_forces([4, 5])
        print(f"  t={t:6.3f}  drag={F[0]:9.4f}  lift={F[1]:8.4f}")
        if txt:
            txt.write(t, float(F[0]), float(F[1]))

    tp = TimeProblem(prob, time_step_def=[1, 0])
    drv = DAESolverInTime(tp, args.dt, args.t_end, observer=observer)
    if args.scheme == "extrapolation":
        drv.advance_navier_stokes_extrapolation(order=2)
    else:
        drv.advance_nonlinear_bdf(order=2)
    if txt:
        txt.close()
    u = np.asarray(prob.solution[0])
    assert np.isfinite(u).all()
    print("final |u|max:", np.abs(u).max())
    return 0


if __name__ == "__main__":
    sys.exit(main())
