#!/usr/bin/env python
"""Geometry (mesh-motion) driver — the feddlib_tpu analog of the
reference's problems/tests/geometry main: solve the harmonic-extension /
pseudo-elasticity mesh-motion problem for a prescribed boundary
displacement and verify the moved mesh stays valid (positive element
volumes).  Reference: problems/specific/Geometry_def.hpp:75-93.
"""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/drivers/", 1)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--dim", type=int, default=2)
    ap.add_argument("--model", default="Laplace",
                    choices=["Laplace", "Elasticity"])
    ap.add_argument("--amplitude", type=float, default=0.1)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from feddlib_tpu.fe.domain import Domain
    from feddlib_tpu.problems.geometry import Geometry
    from feddlib_tpu.utils import timers
    from feddlib_tpu.utils.config import ParameterList

    dim = args.dim
    pl = ParameterList("p")
    pl["Model"] = args.model
    pl["Maximum Iterations"] = 6000
    pl["Convergence Tolerance"] = 1e-10

    with timers.timer("mesh"):
        dom = Domain.structured(dim, args.n)
    geo = Geometry(dom, parameter_list=pl)
    with timers.timer("assemble"):
        geo.assemble()

    # prescribed motion: bump the bottom boundary upward (sinusoidal)
    pts = dom.mesh.points
    bottom = np.isclose(pts[:, 1], 0.0)
    idx = np.nonzero(bottom)[0]
    disp = np.zeros((len(idx), dim))
    disp[:, 1] = args.amplitude * np.sin(np.pi * pts[idx, 0])
    with timers.timer("solve"):
        g = geo.solve_motion(idx, disp)

    dom.mesh.save_reference_configuration()
    dom.mesh.move(g)
    nv = dom.mesh.vertices_per_element
    p = dom.mesh.points[dom.mesh.elements[:, :nv]]
    vols = np.linalg.det(p[:, 1:] - p[:, :1])
    print(f"moved mesh: max|g| = {np.abs(g).max():.4f}, "
          f"min |elem vol| = {np.abs(vols).min():.3e} (all positive: "
          f"{(np.abs(vols) > 0).all()})")
    assert (np.abs(vols) > 0).all(), "mesh tangled"

    if args.out:
        from feddlib_tpu.io.exporter import ExporterParaView

        exp = ExporterParaView(dom, args.out)
        exp.add_variable("g", dim)
        exp.save(0.0, {"g": np.asarray(g).reshape(-1)})
        exp.close()
        print(f"wrote {args.out}.h5/.xmf")
    print(timers.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
