"""Minimal legacy-VTK writer for structured-quad meshes and node fields.

Replaces the reference's meshio dependency (reference: FEANet/mesh.py:119-120
``save_mesh`` writing plate_mesh.vtk with cell_data 'Phase') with a
dependency-free ASCII VTK legacy writer — enough for ParaView inspection of
solution fields, phase maps and residuals.
"""

from __future__ import annotations

import numpy as np


def write_quad_mesh(path: str, n: int, size: float = 2.0,
                    point_data: dict | None = None,
                    cell_data: dict | None = None) -> None:
    """Write the (n+1)^2-node uniform quad mesh on [-size/2, size/2]^2.

    ``point_data``: name -> (n+1, n+1) nodal field;
    ``cell_data``: name -> (n, n) per-element field (e.g. the phase map).
    """
    H = n + 1
    c = np.linspace(-size / 2.0, size / 2.0, H)
    yy, xx = np.meshgrid(c, c, indexing="ij")
    with open(path, "w") as fh:
        fh.write("# vtk DataFile Version 3.0\nmultigrid_feanet_tpu\nASCII\n")
        fh.write("DATASET STRUCTURED_GRID\n")
        fh.write(f"DIMENSIONS {H} {H} 1\n")
        fh.write(f"POINTS {H * H} float\n")
        for i in range(H):
            for j in range(H):
                fh.write(f"{xx[i, j]:.7g} {yy[i, j]:.7g} 0\n")
        if point_data:
            fh.write(f"POINT_DATA {H * H}\n")
            for name, field in point_data.items():
                arr = np.asarray(field).reshape(H, H)
                fh.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
                for i in range(H):
                    for j in range(H):
                        fh.write(f"{arr[i, j]:.7g}\n")
        if cell_data:
            fh.write(f"CELL_DATA {n * n}\n")
            for name, field in cell_data.items():
                arr = np.asarray(field).reshape(n, n)
                fh.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
                for i in range(n):
                    for j in range(n):
                        fh.write(f"{arr[i, j]:.7g}\n")
