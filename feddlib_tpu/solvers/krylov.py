"""Krylov solvers — CG and restarted GMRES as jittable XLA programs.

Replaces Belos (Block GMRES / CG, reference: LinearSolver_def.hpp:72-135,
solver XMLs with Block GMRES, tol 1e-8, ≤100 iters, DGKS orthogonalisation).
Everything runs on device inside `lax.while_loop`s.

Distributed execution: pass `axis_name` when calling from inside a
`shard_map` over a device mesh — every inner product / norm is then a local
contraction followed by a `lax.psum` over the mesh axis (the analog of the
reference's dot-product allreduce, SURVEY.md §3.5 step 4).  Vectors are the
local (owned, zero-padded) shards; `A`/`M` are local operators that do their
own halo exchange.

Conventions:
- `A`, `M` are callables x→y (LinearOperator protocol; the Thyra equivalent).
- Preconditioning is RIGHT by default (monitored residual = true residual).
- f64 accumulation throughout — iteration-count parity with the reference at
  tol 1e-8 requires it (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp
from jax import lax


@dataclass
class KrylovResult:
    x: jnp.ndarray
    iters: int
    relres: float
    converged: bool
    # per-iteration relative residuals [iters+1] (index 0 = initial), only
    # when requested with record_history=True — the Belos iteration log
    # (reference: LinearSolver_def.hpp:106-109 Belos ostream) as data
    history: Optional["jnp.ndarray"] = None

    def __iter__(self):  # allow x, info unpacking
        yield self.x
        yield self

    def print_history(self, label: str = "Krylov", every: int = 1,
                      file=None) -> None:
        """Belos-style iteration log (OutputFrequency = `every`)."""
        import sys

        f = file or sys.stdout
        if self.history is None:
            print(f"{label}: no history recorded", file=f)
            return
        import numpy as np

        h = np.asarray(self.history)
        for k, v in enumerate(h):
            if k % every == 0 or k == len(h) - 1:
                print(f"{label} Iter {k:4d}: ||r||/||b|| = {v:.6e}", file=f)


def _identity(x):
    return x


# ---------------------------------------------------------------------------
# jitted solver programs with operator data as ARGUMENTS
# ---------------------------------------------------------------------------
# Closing a jitted Krylov loop over device matrices embeds them as trace
# constants — on remote-compile backends (the axon TPU tunnel) the constants
# are serialized into every compile request (multi-minute compiles, HTTP 413
# at ~GB sizes).  `solve_jit` instead takes (A_fn, A_ops): A_fn is a
# module-level PURE function A_fn(ops, x) (hashable → one cached program per
# structure), and the operand pytree flows through as jit arguments.

_program_cache: dict = {}


def solve_jit(kind: str, A_fn, A_ops, b, x0=None, M_fn=None, M_ops=(),
              tol: float = 1e-8, maxiter: int = 1000, restart: int = 100,
              left: bool = False, record_history: bool = False):
    """Run a jit-cached CG/GMRES program.  Returns KrylovResult."""
    import jax

    x0 = jnp.zeros_like(b) if x0 is None else x0
    key = (kind, A_fn, M_fn, float(tol), int(maxiter), int(restart),
           bool(left), bool(record_history))
    run = _program_cache.get(key)
    if run is None:
        if kind == "cg":
            def run(b, x0, A_ops, M_ops):
                A = lambda x: A_fn(A_ops, x)
                M = (lambda x: M_fn(M_ops, x)) if M_fn is not None else _identity
                return cg_loop(A, M, b, x0, tol, maxiter,
                               record=record_history)
        else:
            def run(b, x0, A_ops, M_ops):
                A = lambda x: A_fn(A_ops, x)
                M = (lambda x: M_fn(M_ops, x)) if M_fn is not None else _identity
                return gmres_loop(A, M, b, x0, tol, restart, maxiter, left,
                                  record=record_history)
        run = jax.jit(run)
        _program_cache[key] = run
    out = run(b, x0, A_ops, M_ops)
    x, it, rel = out[:3]
    res = KrylovResult(x, int(it), float(rel), bool(rel <= tol))
    if record_history:
        res.history = _trim_history(out[3], res.iters)
    return res


def _trim_history(hist, iters):
    import numpy as np

    return np.asarray(hist)[: iters + 1]


def _make_reducers(axis_name: Optional[str]):
    if axis_name is None:
        def dot(a, b):
            return jnp.vdot(a, b)
    else:
        def dot(a, b):
            return lax.psum(jnp.vdot(a, b), axis_name)

    def norm(a):
        return jnp.sqrt(dot(a, a))

    return dot, norm


# ---------------------------------------------------------------------------
# CG
# ---------------------------------------------------------------------------


def cg(A: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
       M: Optional[Callable] = None, tol: float = 1e-8,
       maxiter: int = 1000, axis_name: Optional[str] = None,
       record_history: bool = False):
    """Preconditioned conjugate gradients (M ≈ A⁻¹, SPD).

    Returns KrylovResult outside shard_map; inside shard_map (axis_name set)
    returns the raw tuple (x, iters, relres) since KrylovResult construction
    needs concrete values."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    out = cg_loop(A, M, b, x0, tol, maxiter, axis_name,
                  record=record_history)
    if axis_name is not None:
        return out
    x, it, relres = out[:3]
    res = KrylovResult(x, int(it), float(relres), bool(relres <= tol))
    if record_history:
        res.history = _trim_history(out[3], res.iters)
    return res


def cg_loop(A, M, b, x0, tol, maxiter, axis_name=None, record=False):
    dot, norm = _make_reducers(axis_name)
    r0 = b - A(x0)
    z0 = M(r0)
    bnorm = norm(b)
    bnorm = jnp.where(bnorm == 0, 1.0, bnorm)
    rz0 = dot(r0, z0)
    hist0 = (jnp.full(maxiter + 1, jnp.nan, b.dtype)
             .at[0].set(norm(r0) / bnorm) if record else jnp.zeros(1, b.dtype))

    def cond(state):
        x, r, z, p, rz, k, _ = state
        return (norm(r) / bnorm > tol) & (k < maxiter)

    def body(state):
        x, r, z, p, rz, k, hist = state
        Ap = A(p)
        alpha = rz / dot(p, Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        if record:
            hist = hist.at[k + 1].set(norm(r) / bnorm)
        return (x, r, z, p, rz_new, k + 1, hist)

    x, r, z, p, rz, k, hist = lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.array(0), hist0))
    out = (x, k, norm(r) / bnorm)
    return out + (hist,) if record else out


# ---------------------------------------------------------------------------
# restarted GMRES with DGKS reorthogonalisation
# ---------------------------------------------------------------------------


def gmres(A: Callable, b: jnp.ndarray, x0: Optional[jnp.ndarray] = None,
          M: Optional[Callable] = None, tol: float = 1e-8,
          restart: int = 100, maxiter: int = 1000,
          left: bool = False, axis_name: Optional[str] = None,
          record_history: bool = False):
    """Restarted GMRES(m), right-preconditioned by default.

    Orthogonalisation: classical Gram-Schmidt with one DGKS correction pass
    (matches Belos' default "DGKS" in the reference solver XMLs) — CGS2 is
    robust and collective-friendly: two batched (m+1)-dot reductions per
    Arnoldi step instead of j sequential MGS dots."""
    M = M or _identity
    x0 = jnp.zeros_like(b) if x0 is None else x0
    out = gmres_loop(A, M, b, x0, tol, restart, maxiter, left, axis_name,
                     record=record_history)
    if axis_name is not None:
        return out
    x, total, relres = out[:3]
    res = KrylovResult(x, int(total), float(relres), bool(relres <= tol))
    if record_history:
        res.history = _trim_history(out[3], res.iters)
    return res


def gmres_loop(A, M, b, x0, tol, restart, maxiter, left=False, axis_name=None,
               record=False):
    dot, norm = _make_reducers(axis_name)
    if axis_name is None:
        def batched_dots(V, w, mask):
            return (V @ w) * mask
    else:
        def batched_dots(V, w, mask):
            return lax.psum(V @ w, axis_name) * mask

    n = b.shape[0]
    m = min(restart, maxiter)

    bnorm_v = norm(M(b) if left else b)
    bnorm = jnp.where(bnorm_v == 0, 1.0, bnorm_v)

    def residual(x):
        r = b - A(x)
        return M(r) if left else r

    def arnoldi_cycle(x, total, hist):
        r = residual(x)
        beta = norm(r)
        V = jnp.zeros((m + 1, n), b.dtype).at[0].set(
            r / jnp.where(beta == 0, 1.0, beta))
        H = jnp.zeros((m + 1, m), b.dtype)
        cs = jnp.zeros(m, b.dtype)
        sn = jnp.zeros(m, b.dtype)
        g = jnp.zeros(m + 1, b.dtype).at[0].set(beta)

        def cond(state):
            V, H, cs, sn, g, j, res, _ = state
            return (j < m) & (res / bnorm > tol)

        def body(state):
            V, H, cs, sn, g, j, _, hist = state
            v = V[j]
            w = M(v) if not left else v
            w = A(w)
            if left:
                w = M(w)
            # CGS + DGKS correction; mask rows > j (they are zero anyway,
            # the mask guards restart reuse)
            mask = (jnp.arange(m + 1) <= j).astype(b.dtype)
            h1 = batched_dots(V, w, mask)
            w = w - V.T @ h1
            h2 = batched_dots(V, w, mask)
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = norm(w)
            H_col = h.at[j + 1].set(wnorm)
            V = V.at[j + 1].set(w / jnp.where(wnorm == 0, 1.0, wnorm))

            def rot(i, col):
                hi = cs[i] * col[i] + sn[i] * col[i + 1]
                hip = -sn[i] * col[i] + cs[i] * col[i + 1]
                return col.at[i].set(hi).at[i + 1].set(hip)

            H_col = lax.fori_loop(0, j, rot, H_col)
            a_, b_ = H_col[j], H_col[j + 1]
            rnorm = jnp.sqrt(a_ * a_ + b_ * b_)
            safe = jnp.where(rnorm == 0, 1.0, rnorm)
            c_new = jnp.where(rnorm == 0, 1.0, a_ / safe)
            s_new = jnp.where(rnorm == 0, 0.0, b_ / safe)
            H_col = H_col.at[j].set(rnorm).at[j + 1].set(0.0)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            gj = g[j]
            g = g.at[j].set(c_new * gj).at[j + 1].set(-s_new * gj)
            H = H.at[:, j].set(H_col)
            res = jnp.abs(g[j + 1])
            if record:
                hist = hist.at[total + j + 1].set(res / bnorm)
            return (V, H, cs, sn, g, j + 1, res, hist)

        V, H, cs, sn, g, j, res, hist = lax.while_loop(
            cond, body, (V, H, cs, sn, g, jnp.array(0), beta, hist))

        def back(i_, y):
            i = j - 1 - i_
            active = i_ < j
            num = g[i] - jnp.dot(H[i], y)
            yi = jnp.where(active,
                           num / jnp.where(H[i, i] == 0, 1.0, H[i, i]), 0.0)
            return y.at[i].set(yi)

        y = lax.fori_loop(0, m, back, jnp.zeros(m, b.dtype))
        dx = V[:m].T @ y
        if not left:
            dx = M(dx)
        return x + dx, j, res, hist

    x = x0
    total = jnp.array(0)
    res = norm(residual(x0))
    hist0 = (jnp.full(maxiter + 1, jnp.nan, b.dtype).at[0].set(res / bnorm)
             if record else jnp.zeros(1, b.dtype))

    def outer_cond(state):
        x, total, res, _ = state
        return (res / bnorm > tol) & (total < maxiter)

    def outer_body(state):
        x, total, res, hist = state
        x, j, res, hist = arnoldi_cycle(x, total, hist)
        return (x, total + j, res, hist)

    x, total, res, hist = lax.while_loop(outer_cond, outer_body,
                                         (x, total, res, hist0))
    out = (x, total, res / bnorm)
    return out + (hist,) if record else out
