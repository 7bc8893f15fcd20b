"""ParaView export: HDF5 datasets + XDMF index — the ExporterParaView
equivalent (reference: core/General/ExporterParaView_decl.hpp:27-65;
HDF5 via EpetraExt at _def.hpp:569, hand-written XDMF at :601-652).

One HDF5 file holds points, connectivity, and per-timestep variable
datasets; an .xmf XML file indexes them for ParaView.  P2 fields are written
on the P2 nodes with quadratic cell types (Tri_6 / Tet_10), matching the
reference's P2 output path (addVariable at :391).

`ExporterTxt` mirrors the rank-0 text time series used for observables
(drag/lift/tip displacement, ExporterTxt.hpp)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

_TOPOLOGY = {
    (2, "P1"): ("Triangle", 3),
    (2, "P2"): ("Triangle_6", 6),
    (3, "P1"): ("Tetrahedron", 4),
    (3, "P2"): ("Tetrahedron_10", 10),
    # quad/hex (fe/hex.py) — node orderings match VTK/XDMF conventions
    # (corners, then edge midpoints bottom/top/vertical, [center]);
    # 27-node Q2 is written on its corner subgrid (VTK's triquadratic
    # face/center ordering differs from ours — vertex values suffice
    # for visualization)
    (2, "Q1"): ("Quadrilateral", 4),
    (2, "Q2"): ("Quadrilateral_9", 9),
    (3, "Q1"): ("Hexahedron", 8),
    (3, "Q2"): ("Hexahedron", 8),
    (3, "Q2-20"): ("Hexahedron_20", 20),
}


class ExporterParaView:
    def __init__(self, domain, path: str, name: str = "solution",
                 subsample_p1: bool = False):
        """subsample_p1: write a P2 field on the P1 vertex subgrid (the
        reference's P1-map output option for P2 solutions, addVariable
        ExporterParaView_def.hpp:391)."""
        import h5py

        self.domain = domain
        self.name = name
        self.path = path
        self.subsample_p1 = subsample_p1 and domain.fe_type == "P2"
        if self.subsample_p1:
            domain = domain.parent_p1 or domain
            self.domain = domain
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self.h5_path = path + ".h5"
        self.xmf_path = path + ".xmf"
        self.h5 = h5py.File(self.h5_path, "w")
        mesh = domain.mesh
        pts = mesh.points
        if mesh.dim == 2:  # ParaView wants 3-D coordinates
            pts = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
        self.h5.create_dataset("points", data=pts)
        self.topo, self.nodes_per_cell = _TOPOLOGY[(mesh.dim, mesh.fe_type)]
        self.h5.create_dataset("connectivity",
                               data=mesh.elements[:, : self.nodes_per_cell])
        self.variables: List[tuple] = []  # (name, dofs_per_node)
        self.timesteps: List[float] = []

    def add_variable(self, name: str, dofs_per_node: int = 1) -> None:
        self.variables.append((name, dofs_per_node))

    def save(self, time: float, values: dict) -> None:
        """values: {variable name → array [n_nodes*dofs]}; appends one
        timestep (reference: ExporterParaView::save, _def.hpp:421)."""
        step = len(self.timesteps)
        for name, dofs in self.variables:
            v = np.asarray(values[name], dtype=np.float64)
            n = self.domain.n_nodes
            if self.subsample_p1 and v.size > n * dofs:
                # P2 field → keep the leading vertex-node entries
                v = v.reshape(-1, dofs)[:n].ravel()
            if dofs > 1:
                v = v.reshape(n, dofs)
                if dofs == 2:  # pad 2-D vectors to 3 components
                    v = np.concatenate([v, np.zeros((n, 1))], axis=1)
            self.h5.create_dataset(f"{name}_{step}", data=v)
        self.timesteps.append(time)
        self.h5.flush()
        self._write_xmf()

    def _write_xmf(self) -> None:
        mesh = self.domain.mesh
        h5 = os.path.basename(self.h5_path)
        n_pts, n_cells = mesh.n_points, mesh.n_elements
        lines = [
            '<?xml version="1.0" ?>',
            '<!DOCTYPE Xdmf SYSTEM "Xdmf.dtd" []>',
            '<Xdmf Version="2.0">',
            " <Domain>",
            '  <Grid Name="TimeSeries" GridType="Collection" '
            'CollectionType="Temporal">',
        ]
        for step, t in enumerate(self.timesteps):
            lines += [
                f'   <Grid Name="mesh" GridType="Uniform">',
                f'    <Time Value="{t}"/>',
                f'    <Topology TopologyType="{self.topo}" '
                f'NumberOfElements="{n_cells}">',
                f'     <DataItem Dimensions="{n_cells} '
                f'{self.nodes_per_cell}" NumberType="Int" Format="HDF">'
                f"{h5}:/connectivity</DataItem>",
                "    </Topology>",
                '    <Geometry GeometryType="XYZ">',
                f'     <DataItem Dimensions="{n_pts} 3" Format="HDF">'
                f"{h5}:/points</DataItem>",
                "    </Geometry>",
            ]
            for name, dofs in self.variables:
                attr_t = "Scalar" if dofs == 1 else "Vector"
                dims = f"{n_pts}" if dofs == 1 else f"{n_pts} 3"
                lines += [
                    f'    <Attribute Name="{name}" AttributeType="{attr_t}" '
                    'Center="Node">',
                    f'     <DataItem Dimensions="{dims}" Format="HDF">'
                    f"{h5}:/{name}_{step}</DataItem>",
                    "    </Attribute>",
                ]
            lines.append("   </Grid>")
        lines += ["  </Grid>", " </Domain>", "</Xdmf>"]
        with open(self.xmf_path, "w") as f:
            f.write("\n".join(lines))

    def close(self) -> None:
        self.h5.close()


class ExporterTxt:
    """Scalar time-series export (observables: drag/lift/tip displacement;
    reference ExporterTxt)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
        self.f = open(path, "w")

    def write(self, time: float, *values: float) -> None:
        self.f.write("\t".join(f"{v:.12e}" for v in (time, *values)) + "\n")
        self.f.flush()

    def close(self) -> None:
        self.f.close()
