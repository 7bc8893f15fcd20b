#!/usr/bin/env python
"""3D elasticity performance/parity driver — the steadyLinElas(_Perf) analog
(reference problems/tests/steadyLinElas_Perf/: 3D timing driver).

Clamped cube under gravity-like load; linear or hyperelastic material;
GDSW two-level Schwarz with elasticity null space (translations+rotations).

  python drivers/elasticity.py --cpu --n 8 --material linear
  python drivers/elasticity.py --cpu --n 6 --material Neo-Hooke
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--dim", type=int, default=3)
    ap.add_argument("--fe", default="P1", choices=["P1", "P2"])
    ap.add_argument("--material", default="linear",
                    choices=["linear", "StVK", "Neo-Hooke", "Mooney-Rivlin"])
    ap.add_argument("--E", type=float, default=1.0)
    ap.add_argument("--nu", type=float, default=0.3)
    ap.add_argument("--subdomains", type=int, default=8)
    ap.add_argument("--prec", default="SchwarzTwoLevel")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.mesh.structured import flag_boxed_boundary
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.config import ParameterList

    pl = ParameterList("P")
    for k, v in {"E": args.E, "Poisson Ratio": args.nu,
                 "Preconditioner Type": args.prec,
                 "Subdomains": args.subdomains,
                 "Null Space Type": "elasticity",
                 "Maximum Iterations": 6000,
                 "Convergence Tolerance": 1e-8,
                 "Material Model": args.material}.items():
        pl[k] = v

    with timers.timer("mesh"):
        dom = Domain.structured(args.dim, args.n, fe_type=args.fe)
        lo = [0.0] * args.dim
        hi = [1.0] * args.dim
        flags = {"x0": 2}  # clamp the x=0 face, rest free
        flag_boxed_boundary(dom.mesh, lo, hi, flags)
    print(f"domain: {dom}  ({dom.n_dofs(dom.dim)} dofs)")

    dim = dom.dim
    grav = [0.0] * dim
    grav[-1] = -0.1

    if args.material == "linear":
        from feddlib_tpu.problems import LinElas

        prob = LinElas(dom, parameter_list=pl)
        with timers.timer("assemble"):
            prob.assemble()
            prob.assemble_source(lambda x: jnp.array(grav))
        prob.add_bc(lambda x, t: jnp.zeros(dim), 2, 0)
        prob.set_boundaries_rhs()
        with timers.timer("solve"):
            iters = prob.solve()
        print(f"GMRES iterations: {iters}  relres: {prob.last_relres:.3e}")
    else:
        from feddlib_tpu.problems.nonlin_elasticity import NonLinElasticity
        from feddlib_tpu.solvers.nonlinear import NonLinearSolver

        prob = NonLinElasticity(dom, parameter_list=pl)
        with timers.timer("assemble"):
            prob.assemble()
        prob.add_bc(lambda x, t: jnp.zeros(dim), 2, 0)
        solver = NonLinearSolver("Newton")
        with timers.timer("solve"):
            # incremental loading: finite-strain statics needs the load
            # ramped so Newton stays in the convergence basin
            for lf in (0.25, 0.5, 0.75, 1.0):
                prob.assemble_source(
                    lambda x, lf=lf: lf * jnp.array(grav))
                its = solver.solve(prob)
                print(f"  load {lf:4.2f}: Newton its={its} "
                      f"crit={solver.final_criterion:.2e}")

    d = np.asarray(prob.solution[0]).reshape(-1, dim)
    print(f"max |displacement|: {np.abs(d).max():.5f}  "
          f"tip sag: {d[:, -1].min():.5f}")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
