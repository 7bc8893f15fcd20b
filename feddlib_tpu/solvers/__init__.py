from feddlib_tpu.solvers.krylov import cg, gmres, KrylovResult

__all__ = ["cg", "gmres", "KrylovResult"]
