from feddlib_tpu.precond.schwarz import SchwarzPreconditioner, grow_overlap

__all__ = ["SchwarzPreconditioner", "grow_overlap"]
