#!/usr/bin/env python
"""TPM (Biot poroelasticity) driver — the feddlib_tpu analog of the
reference's problems/tests/unsteadyTPM and unsteadyNonLinTPM mains:
Terzaghi-type consolidation of a loaded poroelastic column, linear
(implicit Euler) or finite-strain (NonLinTPM, Newton per step), with
pore-pressure decay reported per step and ParaView export.

Reference: problems/specific/TPM_def.hpp:179 / NonLinTPM_def.hpp:221
(AceGen Biot elements; here autodiff tangents — fe/hyperelastic.py).

BC layout (flag_boxed_boundary): bottom 2 = clamped, top 3 = drained +
downward traction, sides 4 = rollers (Dirichlet_X).
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    ap.add_argument("--n", type=int, default=4, help="cells per side")
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--t-end", type=float, default=0.25)
    ap.add_argument("--dt", type=float, default=0.05)
    ap.add_argument("--load", type=float, default=0.1, help="top traction")
    ap.add_argument("--nonlinear", action="store_true",
                    help="finite-strain NonLinTPM (Newton per step)")
    ap.add_argument("--out", default=None, help="ParaView output prefix")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe import ops
    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.la.block import BlockVector
    from feddlib_tpu.mesh.structured import flag_boxed_boundary
    from feddlib_tpu.problems.tpm import TPM, NonLinTPM
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.reference_compat import load_reference_configs

    dim = args.dim
    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl["dt"] = args.dt
    pl.setdefault("Biot Alpha", 1.0)
    pl.setdefault("Permeability", 1e-2)
    pl.setdefault("Storativity", 1e-3)
    pl.setdefault("E", 1.0)
    pl.setdefault("Poisson Ratio", 0.25)
    pl.setdefault("Preconditioner Type", "Jacobi")
    pl.setdefault("Maximum Iterations", 8000)
    pl.setdefault("Convergence Tolerance", 1e-9)

    with timers.timer("mesh"):
        dom_p = Domain.structured(dim, args.n)
        dom_u = dom_p.p2_domain()
        lo, hi = [0.0] * dim, [1.0] * dim
        faces = {"x0": 4, "x1": 4, "y0": 2, "y1": 3}
        if dim == 3:
            faces.update({"z0": 4, "z1": 4, "y0": 2, "y1": 3})
        for d in (dom_u, dom_p):
            flag_boxed_boundary(d.mesh, lo, hi, faces)
    print(f"u: {dom_u}\np: {dom_p}")

    cls = NonLinTPM if args.nonlinear else TPM
    prob = cls(dom_u, dom_p, parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()

    prob.add_bc(lambda x, t: jnp.zeros(dim), 2, 0)          # clamp bottom
    prob.bc_builder.add_bc(lambda x, t: 0.0, 4, 0, dom_u,    # rollers
                           "Dirichlet_X", dim)
    prob.bc_builder.add_bc(lambda x, t: 0.0, 3, 1, dom_p,    # drained top
                           "Dirichlet", 1)
    traction = np.zeros(dim)
    traction[1] = -args.load
    load = ops.assemble_surface_rhs(
        dom_u, lambda x: jnp.asarray(traction), flag=3, dofs_per_node=dim)
    f_ext = BlockVector([load, jnp.zeros(dom_p.n_nodes)])

    history = []

    def observer(t, sol):
        pmax = float(jnp.max(jnp.abs(sol[1])))
        history.append((t, pmax))
        print(f"  t={t:.3f}  max|p| = {pmax:.5e}")

    with timers.timer("advance"):
        prob.advance(args.t_end, observer=observer, f_ext=f_ext)

    assert history[-1][1] < history[0][1], "no consolidation decay"
    d = np.asarray(prob.solution[0]).reshape(-1, dim)
    print(f"consolidation: max|p| {history[0][1]:.4e} -> "
          f"{history[-1][1]:.4e}; settlement = {d[:, 1].min():.5e}")

    if args.out:
        from feddlib_tpu.io.exporter import ExporterParaView

        exp = ExporterParaView(dom_u, args.out + "_u")
        exp.add_variable("d", dim)
        exp.save(args.t_end, {"d": d.reshape(-1)})
        exp.close()
        exp = ExporterParaView(dom_p, args.out + "_p")
        exp.add_variable("p", 1)
        exp.save(args.t_end, {"p": np.asarray(prob.solution[1])})
        exp.close()
        print(f"wrote {args.out}_u/_p .h5/.xmf")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
