from feddlib_tpu.problems.base import Problem, NonLinearProblem
from feddlib_tpu.problems.laplace import Laplace
from feddlib_tpu.problems.linelas import LinElas
from feddlib_tpu.problems.stokes import Stokes
from feddlib_tpu.problems.navier_stokes import NavierStokes

__all__ = ["Problem", "NonLinearProblem", "Laplace", "LinElas", "Stokes",
           "NavierStokes"]
