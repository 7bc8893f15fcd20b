from feddlib_tpu.fe.domain import Domain

__all__ = ["Domain"]
