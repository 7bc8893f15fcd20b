"""NonLinearSolver — Newton and fixed-point drivers (reference:
problems/Solver/NonLinearSolver_decl.hpp:43-60; hand-written loops at
NonLinearSolver_def.hpp:274 (FixedPoint) and :334 (Newton)).

Criteria and defaults mirror the reference (NonLinearSolver_def.hpp:285-287,
:345-347): relNonLinTol = 1e-6, MaxNonLinIts = 10, criterion "Residual"
(relative residual ‖F‖/‖F₀‖) or "Update" (‖δ‖).  "Cancel MaxNonLinIts"
raises if the cap is hit (used by tests, :326-328).

Newton step: solve J(u) δ = −F(u), u ← u + δ.  Dirichlet handling follows
the reference's residual convention: F = u − g on constrained dofs and J has
identity rows there, so δ = g − u restores the BC exactly each step.
"""

from __future__ import annotations


class NonLinearSolver:
    def __init__(self, method: str = "Newton"):
        if method not in ("Newton", "FixedPoint"):
            raise ValueError(f"unknown nonlinear method {method!r}")
        self.method = method

    def solve(self, problem, t: float = 0.0) -> int:
        pl = problem.parameter_list
        tol = float(pl.get("relNonLinTol", 1e-6))
        abs_tol = float(pl.get("absNonLinTol", 0.0))
        max_its = int(pl.get("MaxNonLinIts", 10))
        criterion = pl.get("Criterion", "Residual")
        cancel = bool(pl.get("Cancel MaxNonLinIts", False))
        # NOX-style extras (reference NonLinearSolver_def.hpp:71-165:
        # NormUpdate / RelativeNormF / NormWRMS combined with AND/OR)
        use_wrms = bool(pl.get("Use WRMS", False))
        wrms_rtol = float(pl.get("WRMS rtol", 1e-6))
        wrms_atol = float(pl.get("WRMS atol", 1e-8))
        combo = pl.get("Combo", "OR")

        problem.init_vectors()
        # BC-consistent initial guess so ‖F₀‖ is meaningful
        problem.solution = problem.bc_builder.apply_to_rhs(problem.solution, t)

        r = problem.calculate_residual(t)
        norm0 = problem.residual_norm(r)
        if norm0 == 0.0:
            return 0
        import math

        line_search = bool(pl.get("Use Line Search", True))
        its = 0
        crit = 1.0
        converged = False
        self.linear_iters = []
        rnorm_prev = norm0
        while not converged and its < max_its:
            problem.reassemble(self.method)
            delta, lin_its = problem.linear_solver.solve_system(
                problem, r.scale(-1.0))
            self.linear_iters.append(lin_its)
            base = problem.solution
            step = 1.0
            problem.solution = base.axpy(step, delta)
            r = problem.calculate_residual(t)
            rnorm = problem.residual_norm(r)
            if line_search:
                # backtracking: halve the step while the residual is NaN or
                # grew (guards hyperelastic element inversion; a
                # globalization the reference delegates to NOX)
                tries = 0
                while (not math.isfinite(rnorm)
                       or rnorm > 2.0 * rnorm_prev) and tries < 12:
                    step *= 0.5
                    problem.solution = base.axpy(step, delta)
                    r = problem.calculate_residual(t)
                    rnorm = problem.residual_norm(r)
                    tries += 1
            rnorm_prev = rnorm if math.isfinite(rnorm) else rnorm_prev
            its += 1
            if criterion == "Update":
                crit = float(delta.norm2())
                converged = crit <= tol
            else:
                crit = rnorm / norm0
                converged = crit <= tol or (abs_tol > 0 and rnorm <= abs_tol)
            if use_wrms:
                import jax.numpy as jnp

                # ‖δ_i / (atol + rtol·|u_i|)‖_rms ≤ 1  (NOX NormWRMS)
                num = 0.0
                ndof = 0
                for d, u in zip(delta.blocks, problem.solution.blocks):
                    w = d / (wrms_atol + wrms_rtol * jnp.abs(u))
                    num += float(jnp.vdot(w, w))
                    ndof += u.shape[0]
                wrms_ok = (num / max(ndof, 1)) ** 0.5 <= 1.0
                converged = (converged or wrms_ok) if combo == "OR" \
                    else (converged and wrms_ok)
        self.final_criterion = crit
        if cancel and its >= max_its and not converged:
            raise RuntimeError(
                f"Newton hit MaxNonLinIts={max_its} (criterion {crit:.2e})")
        return its
