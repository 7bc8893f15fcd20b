#!/usr/bin/env python
"""Unsteady linear elasticity driver — the feddlib_tpu analog of the
reference's problems/tests/unsteadyLinElas main: an elastic block clamped
on flag-1 boundary, driven by a time-ramped volume load, integrated with
Newmark (β=1/4, γ=1/2; DAESolverInTime::advanceInTimeLinearNewmark,
DAESolverInTime_def.hpp:519+).  Reports tip displacement and the
kinetic/potential energy split per step.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    ap.add_argument("--mesh", default=None, help=".mesh file (else box)")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--t-end", type=float, default=0.5)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--load", type=float, default=0.1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems import LinElas
    from feddlib_tpu.solvers.timestepping import DAESolverInTime, TimeProblem
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.reference_compat import load_reference_configs

    dim = args.dim
    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl.setdefault("E", 1.0)
    pl.setdefault("Poisson Ratio", 0.3)
    pl.setdefault("Preconditioner Type", "SchwarzOneLevel")
    pl.setdefault("Subdomains", 4)
    pl.setdefault("Maximum Iterations", 6000)
    pl.setdefault("Convergence Tolerance", 1e-10)

    with timers.timer("mesh"):
        dom = (Domain.from_file(args.mesh, fe_type="P2") if args.mesh
               else Domain.structured(dim, args.n, fe_type="P2"))
    print(f"domain: {dom}")

    prob = LinElas(dom, parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()
    prob.add_bc(lambda x, t: jnp.zeros(dim), 1, 0)
    prob.init_vectors()

    load = np.zeros(dim)
    load[-1] = -args.load

    def rhs_func(t):
        from feddlib_tpu.fe import ops
        from feddlib_tpu.la.block import BlockVector

        ramp = min(t / 0.2, 1.0)  # ramp the load over the first 0.2s
        f = ops.assemble_rhs(dom, lambda x: jnp.asarray(load * ramp), dim)
        return BlockVector([f])

    tp = TimeProblem(prob)
    K = prob.system.get_block(0, 0)
    M = tp.mass[0]
    history = []

    def observer(t, sol):
        d = sol[0]
        e_pot = 0.5 * float(jnp.vdot(d, K.matvec(d)))
        history.append((t, float(jnp.abs(d).max()), e_pot))
        print(f"  t={t:.3f}  max|d| = {history[-1][1]:.5e}  "
              f"E_pot = {e_pot:.5e}")

    drv = DAESolverInTime(tp, args.dt, args.t_end, rhs_func=rhs_func,
                          observer=observer)
    with timers.timer("advance"):
        drv.advance_linear_newmark()

    d = np.asarray(prob.solution[0]).reshape(-1, dim)
    v = drv.velocity[0]
    e_kin = 0.5 * float(jnp.vdot(v, M.matvec(v)))
    print(f"final max|d| = {np.abs(d).max():.5e}   E_kin = {e_kin:.4e}")
    assert np.isfinite(d).all()
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
