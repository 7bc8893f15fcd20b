"""Distributed Krylov solves over the DD device axis.

Compiles one `shard_map` program per (matrix, solver, preconditioner)
combination: local ELL SpMV + halo import (XLA all_gather over ICI) +
psum-reduced dot products, with the whole Krylov `while_loop` inside the
program — zero host round-trips per iteration (the reference pays an MPI
allreduce per dot; here it is one fused ICI collective inside the compiled
loop, SURVEY.md §3.5).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from feddlib_tpu.parallel.spmd import (
    AXIS, DeviceAxis, DistributedCsr, import_ghosts)
from feddlib_tpu.solvers.krylov import cg_loop, gmres_loop


def _shard_map(axis: DeviceAxis, f, in_specs, out_specs):
    try:
        return jax.shard_map(f, mesh=axis.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except TypeError:  # older jax: check_rep instead of check_vma
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=axis.mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)


class DistributedSolver:
    """Bundles a DistributedCsr + device axis into solve methods.

    `precond` is an optional factory: called inside shard_map as
    precond(local_ctx) → callable M(r_own)->z_own, where local_ctx carries
    the local matrix slices.  Defaults: identity / Jacobi.
    """

    def __init__(self, dmat: DistributedCsr, axis: Optional[DeviceAxis] = None):
        self.dmat = dmat
        self.axis = axis or DeviceAxis.make(dmat.n_dev)
        if self.axis.n_dev != dmat.n_dev:
            raise ValueError("device axis size != matrix partition count")
        self._cache = {}

    # extra per-device operands a preconditioner needs: list of [ndev, ...]
    # arrays appended to the shard_map inputs.
    def _solve_fn(self, method: str, tol: float, maxiter: int, restart: int,
                  prec_build, prec_args_specs, n_prec_args: int):
        key = (method, tol, maxiter, restart,
               None if prec_build is None else id(prec_build), n_prec_args)
        if key in self._cache:
            return self._cache[key]
        plan = self.dmat.plan
        imp = plan.importer()
        exp = plan.exporter()

        def prog(b, x0, ell_data, ell_cols, halo_in, halo_out, mask,
                 *prec_args):
            b, x0 = b[0], x0[0]
            ed, ec = ell_data[0], ell_cols[0]
            hi = jax.tree.map(lambda a: a[0], halo_in)
            ho = jax.tree.map(lambda a: a[0], halo_out)
            mk = mask[0]
            local_prec = [a[0] for a in prec_args]

            def A(x):
                x_col = imp(x, hi)
                return jnp.sum(ed * x_col[ec], axis=0)

            if prec_build is None:
                M = lambda r: r
            else:
                M = prec_build(local_prec,
                               (ed, ec, mk, lambda x: imp(x, hi),
                                lambda y: exp(y, ho)))

            if method == "cg":
                x, it, rel = cg_loop(A, M, b, x0, tol, maxiter, axis_name=AXIS)
            else:
                x, it, rel = gmres_loop(A, M, b, x0, tol, restart, maxiter,
                                        axis_name=AXIS)
            return x[None], it, rel

        halo_spec = P(AXIS)  # pytree-prefix spec broadcast over the rounds
        in_specs = ([P(AXIS)] * 4 + [halo_spec, halo_spec, P(AXIS)]
                    + [P(AXIS)] * n_prec_args)
        out_specs = (P(AXIS), P(), P())
        f = jax.jit(_shard_map(self.axis, prog, tuple(in_specs), out_specs))
        self._cache[key] = f
        return f

    def solve(self, b_dist: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
              method: str = "cg", tol: float = 1e-8, maxiter: int = 1000,
              restart: int = 100, precond=None):
        """b_dist [n_dev, N_o] stacked owned RHS → (x_dist, iters, relres).

        precond: None | "jacobi" | (build_fn, [arrays ndev-stacked])."""
        dm = self.dmat
        x0 = jnp.zeros_like(b_dist) if x0 is None else x0
        if precond is None:
            build, arrs = None, []
        elif precond == "jacobi":
            build, arrs = _jacobi_build, [_jacobi_diag(dm)]
        else:
            build, arrs = precond
        f = self._solve_fn(method, tol, maxiter, restart, build,
                           None, len(arrs))
        x, it, rel = f(b_dist, x0, dm.ell_data, dm.ell_cols,
                       dm.plan.import_arrays, dm.plan.export_arrays,
                       dm.plan.owned_mask, *arrs)
        return x, int(it), float(rel)


def _jacobi_diag(dm: DistributedCsr) -> jnp.ndarray:
    """[n_dev, N_o] inverse diagonal (0 on padding)."""
    N_o = dm.plan.N_o
    # local diagonal: column-map local id of owned row i is i itself
    diag_idx = jnp.arange(N_o)[None, None, :]
    is_diag = dm.ell_cols == diag_idx  # [ndev, K, N_o]
    d = jnp.sum(jnp.where(is_diag, dm.ell_data, 0.0), axis=1)
    return jnp.where(d != 0, 1.0 / jnp.where(d == 0, 1.0, d), 0.0)


def _jacobi_build(prec_arrays, local_ctx):
    (dinv,) = prec_arrays

    def M(r):
        return dinv * r

    return M
