#!/usr/bin/env python
"""Laplace driver — the feddlib_tpu analog of the reference's
problems/tests/laplace/main.cpp: reads the SAME XML parameter files
(--problemfile/--precfile/--solverfile), builds or reads a mesh, assembles,
applies zero-Dirichlet BCs, solves with Schwarz-preconditioned GMRES, and
exports ParaView output.

Example (using the reference's committed configs verbatim):
  python drivers/laplace.py \
      --problemfile /root/reference/feddlib/problems/tests/laplace/parametersProblem.xml \
      --precfile    /root/reference/feddlib/problems/tests/laplace/parametersPrec.xml \
      --solverfile  /root/reference/feddlib/problems/tests/laplace/parametersSolver.xml \
      --mesh /root/reference/meshes/square.mesh --out /tmp/laplace
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problemfile", default=None)
    ap.add_argument("--precfile", default=None)
    ap.add_argument("--solverfile", default=None)
    ap.add_argument("--mesh", default=None, help=".mesh file (else structured)")
    ap.add_argument("--n", type=int, default=16, help="structured cells")
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--fe", default="P1", choices=["P1", "P2"])
    ap.add_argument("--subdomains", type=int, default=4)
    ap.add_argument("--out", default=None, help="ParaView output prefix")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--distributed", action="store_true",
                    help="solve over the JAX device mesh "
                         "('Use Distributed Solve')")
    ap.add_argument("--pipeline", action="store_true",
                    help="device-resident distributed assembly+solve "
                         "('Use Device Pipeline'; implies --distributed)")
    ap.add_argument("--devices", type=int, default=None)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems import Laplace
    from feddlib_tpu.utils.reference_compat import load_reference_configs
    from feddlib_tpu.utils import timers

    pl = load_reference_configs(args.problemfile, args.precfile,
                                args.solverfile)
    pl["Subdomains"] = args.subdomains
    if "Preconditioner Type" not in pl:
        pl["Preconditioner Type"] = "SchwarzOneLevel"
    if args.distributed or args.pipeline:
        pl["Use Distributed Solve"] = True
        pl["Use Device Pipeline"] = bool(args.pipeline)
        if args.devices:
            pl["Devices"] = args.devices

    with timers.timer("mesh"):
        if args.mesh:
            dom = Domain.from_file(args.mesh, fe_type=args.fe)
        else:
            dom = Domain.structured(args.dim, args.n, fe_type=args.fe)
    print(f"domain: {dom}")

    prob = Laplace(dom, parameter_list=pl)
    with timers.timer("assemble"):
        prob.assemble()
        prob.assemble_source(lambda x: 1.0 + 0 * x[0])
    # boundary flags 1..9 get zero Dirichlet; ≥10 marks interior/volume
    # nodes in the reference meshes (e.g. square.mesh flag 10)
    flags = sorted(set(dom.mesh.point_flags[(dom.mesh.point_flags > 0)
                                            & (dom.mesh.point_flags < 10)]))
    for flag in flags:
        prob.add_bc(lambda x, t: 0.0, int(flag), 0)
    prob.set_boundaries_rhs()
    with timers.timer("solve"):
        iters = prob.solve()
    print(f"GMRES iterations: {iters}  relres: {prob.last_relres:.3e}")

    if args.out:
        from feddlib_tpu.io.exporter import ExporterParaView

        exp = ExporterParaView(dom, args.out)
        exp.add_variable("u", 1)
        exp.save(0.0, {"u": np.asarray(prob.solution[0])})
        exp.close()
        print(f"wrote {args.out}.h5 / {args.out}.xmf")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
