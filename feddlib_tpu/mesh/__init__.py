from feddlib_tpu.mesh.mesh import Mesh
from feddlib_tpu.mesh.io import read_mesh, write_mesh
from feddlib_tpu.mesh.structured import build_structured_mesh

__all__ = ["Mesh", "read_mesh", "write_mesh", "build_structured_mesh"]
