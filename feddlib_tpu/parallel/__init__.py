from feddlib_tpu.parallel.spmd import (
    DeviceAxis, HaloPlan, DistributedCsr, distribute_vector, collect_vector)

__all__ = ["DeviceAxis", "HaloPlan", "DistributedCsr",
           "distribute_vector", "collect_vector"]
