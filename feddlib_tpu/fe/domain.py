"""Domain — user-facing handle tying mesh + FE space + maps.

Reference: core/FE/Domain_decl.hpp:21 (buildMesh :82, readAndPartitionMesh
:128, buildP2ofP1Domain, vector-field dof maps :90-116).  A Domain wraps one
mesh with one FE discretisation; mixed problems (Stokes u/p) use two Domains
sharing the same P1 parent mesh — the P2 mesh preserves element ordering and
vertex-node ids, so mixed-space element integrals align by element index.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from feddlib_tpu.fe import reference as ref
from feddlib_tpu.mesh.mesh import Mesh
from feddlib_tpu.mesh.io import read_mesh
from feddlib_tpu.mesh.p2 import build_p2_mesh
from feddlib_tpu.mesh.structured import build_structured_mesh


def _check_fe_type(fe_type: str) -> None:
    if fe_type not in ("P1", "P2"):
        raise ValueError(f"unsupported fe_type {fe_type!r} (P1 or P2)")


class Domain:
    def __init__(self, mesh: Mesh, parent_p1: Optional["Domain"] = None):
        self.mesh = mesh
        self.parent_p1 = parent_p1
        self._vert_coords = None
        self._vert_coords_T = None
        self._patterns = {}  # cache: op-key → SparsityPattern

    # -- constructors (reference Domain::buildMesh / readAndPartitionMesh) --
    @classmethod
    def structured(cls, dim: int, n_cells, fe_type: str = "P1", **kw) -> "Domain":
        _check_fe_type(fe_type)
        p1 = cls(build_structured_mesh(dim, n_cells, fe_type="P1", **kw))
        return p1 if fe_type == "P1" else p1.p2_domain()

    @classmethod
    def structured_hex(cls, dim: int, n_cells, fe_type: str = "Q1",
                       **kw) -> "Domain":
        """Structured quad/hex domain (Q1 | Q2 | Q2-20); reference:
        MeshStructured Q-variants, MeshStructured_decl.hpp:71-101."""
        from feddlib_tpu.fe.hex import build_hex_mesh

        if fe_type not in ("Q1", "Q2", "Q2-20"):
            raise ValueError(f"unsupported hex fe_type {fe_type!r}")
        return cls(build_hex_mesh(dim, n_cells, fe_type=fe_type, **kw))

    @classmethod
    def from_file(cls, path: str, fe_type: str = "P1",
                  reorder: str = None) -> "Domain":
        """reorder='rcm' renumbers nodes bandwidth-reducing at load
        (mesh.reorder_mesh_rcm) so downstream operators are banded — the
        TPU SpMV formats (DIA/block-DIA coverage, SELL window spill) are
        functions of the numbering; flags/coordinates/BCs are permuted
        consistently."""
        _check_fe_type(fe_type)
        m = read_mesh(path, fe_type="P1")
        if reorder == "rcm":
            from feddlib_tpu.mesh.mesh import reorder_mesh_rcm

            m, _ = reorder_mesh_rcm(m)
        elif reorder is not None:
            raise ValueError(f"unknown reorder {reorder!r}")
        p1 = cls(m)
        return p1 if fe_type == "P1" else p1.p2_domain()

    def p2_domain(self) -> "Domain":
        """P2 domain from this P1 domain (reference: Domain::buildP2ofP1Domain,
        Domain_def.hpp:335)."""
        if self.fe_type != "P1":
            raise ValueError("p2_domain() requires a P1 domain")
        return Domain(build_p2_mesh(self.mesh), parent_p1=self)

    # -- properties ---------------------------------------------------------
    @property
    def dim(self) -> int:
        return self.mesh.dim

    @property
    def fe_type(self) -> str:
        return self.mesh.fe_type

    @property
    def n_nodes(self) -> int:
        return self.mesh.n_points

    @property
    def n_elements(self) -> int:
        return self.mesh.n_elements

    def n_dofs(self, dofs_per_node: int = 1) -> int:
        return self.n_nodes * dofs_per_node

    # -- assembly inputs ----------------------------------------------------
    def vert_coords(self) -> jnp.ndarray:
        """[E, dim+1, dim] vertex coordinates of each element (geometry is
        always affine-P1, even for P2 spaces).

        Built ON DEVICE by gathering uploaded points through the element
        table: host→device bandwidth is the scarce resource on tunneled TPU
        backends (~7 MB/s measured), so we ship points (n·dim) + int32
        connectivity instead of the E·(dim+1)·dim coordinate tensor."""
        if self._vert_coords is None:
            nv = self.mesh.vertices_per_element
            pts = jnp.asarray(self.mesh.points, jnp.float64)
            conn = jnp.asarray(self.mesh.elements[:, :nv].astype(np.int32))
            self._vert_coords = pts[conn]
        return self._vert_coords

    def vert_coords_T(self) -> jnp.ndarray:
        """[nv*dim, E] element-last vertex coordinates: row v*dim + i is
        coordinate i of local vertex v across all elements.

        The element-FIRST [E, nv, dim] tensor of vert_coords() is hostile
        to TPU tiled layouts — XLA pads the (nv, dim) minor dims to (8,128)
        tiles, a ~32x memory expansion that OOMs the gather at a few
        million elements.  Keeping the huge element axis LAST makes both
        the gather and the cached array stream at ~1x padding, and is the
        layout the element-last kernels (fe/fast_assembly.py) consume
        natively."""
        if self._vert_coords_T is None:
            nv = self.mesh.vertices_per_element
            dim = self.dim
            ptsT = jnp.asarray(np.ascontiguousarray(self.mesh.points.T),
                               jnp.float64)          # [dim, n]
            connT = jnp.asarray(np.ascontiguousarray(
                self.mesh.elements[:, :nv].T.astype(np.int32)))  # [nv, E]
            vcT = ptsT[:, connT]                     # [dim, nv, E]
            self._vert_coords_T = jnp.swapaxes(vcT, 0, 1).reshape(
                nv * dim, -1)                        # [nv*dim, E]
        return self._vert_coords_T

    def invalidate_geometry(self) -> None:
        """Call after mesh motion (ALE) so cached coords are rebuilt."""
        self._vert_coords = None
        self._vert_coords_T = None

    def elem_nodes(self) -> np.ndarray:
        return self.mesh.elements

    def elem_dofs(self, dofs_per_node: int = 1) -> np.ndarray:
        from feddlib_tpu.fe.assembly import vector_dof_ids

        if dofs_per_node == 1:
            return self.mesh.elements
        return vector_dof_ids(self.mesh.elements, dofs_per_node)

    @property
    def is_hex(self) -> bool:
        return self.fe_type.startswith("Q")

    def n_basis(self) -> int:
        if self.is_hex:
            from feddlib_tpu.fe.hex import hex_n_basis

            return hex_n_basis(self.fe_type, self.dim)
        return ref.n_basis(self.dim, self.fe_type)

    # -- pattern cache ------------------------------------------------------
    def pattern(self, key, build):
        pat = self._patterns.get(key)
        if pat is None:
            pat = build()
            self._patterns[key] = pat
        return pat

    def __repr__(self):
        return (f"Domain(dim={self.dim}, {self.fe_type}, "
                f"nodes={self.n_nodes}, elems={self.n_elements})")
