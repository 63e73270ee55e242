#!/usr/bin/env python3
"""Mesh converter: Gmsh/meshio formats -> the solver's HDF5 schema.

Counterpart of the reference tools/mesh_convert.py (whose output schema -
mesh/xg, mesh/ien/*, mesh/bound/{node_offset,node,elem_offset,ien,f2e,
forn} - is the contract; see SURVEY.md section 3.5). Boundary facets are
grouped by physical tag, and each facet is mapped to its parent tet (f2e)
and the local index of the opposite node (forn), computed here with
vectorized NumPy set-matching instead of the reference's per-facet Python
set loops (mesh_convert.py:35-68).

Requires `meshio` only for non-HDF5 inputs (not baked into this image;
the solver itself never needs it - use mesh.gen for built-in meshes).

Usage: python tools/mesh_convert.py input.msh output.h5
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dedflow_tpu.io.h5 import write_mesh_h5
from dedflow_tpu.mesh.mesh import Boundary, Mesh, facet_tables_from_tris
from dedflow_tpu.utils.dtypes import INDEX_DTYPE


def from_meshio(path: str) -> Mesh:
    try:
        import meshio
    except ImportError as e:  # pragma: no cover - meshio not in this image
        raise SystemExit(
            "meshio is required to read non-HDF5 meshes; install it or "
            "convert externally to the HDF5 schema"
        ) from e

    m = meshio.read(path)
    xg = np.asarray(m.points, dtype=float)
    tets = [c.data for c in m.cells if c.type == "tetra"]
    if not tets:
        raise SystemExit("no tetrahedra in input mesh")
    ien = np.concatenate(tets).astype(INDEX_DTYPE)
    # mixed cells: carried through to mesh/ien/{prism,hex} (stencil-only,
    # as in the reference - MeshData.h:27-29, csr.c:107-130)
    prisms = [c.data for c in m.cells if c.type == "wedge"]
    hexes = [c.data for c in m.cells if c.type == "hexahedron"]
    ien_prism = np.concatenate(prisms).astype(INDEX_DTYPE) if prisms else None
    ien_hex = np.concatenate(hexes).astype(INDEX_DTYPE) if hexes else None

    # boundary triangles grouped by physical tag
    tris = [c.data for c in m.cells if c.type == "triangle"]
    tags = []
    if "gmsh:physical" in m.cell_data:
        tags = [
            d
            for c, d in zip(m.cells, m.cell_data["gmsh:physical"])
            if c.type == "triangle"
        ]
    boundaries = []
    if tris:
        tri = np.concatenate(tris).astype(INDEX_DTYPE)
        tag = (
            np.concatenate(tags)
            if tags
            else np.zeros(tri.shape[0], dtype=np.int64)
        )
        for t in np.unique(tag):
            btri = tri[tag == t]
            f2e, forn = facet_tables_from_tris(ien, btri)
            boundaries.append(
                Boundary(
                    nodes=np.unique(btri).astype(INDEX_DTYPE),
                    ien=btri,
                    f2e=f2e,
                    forn=forn,
                )
            )
    return Mesh(
        xg=xg, ien=ien, boundaries=boundaries,
        ien_prism=ien_prism, ien_hex=ien_hex,
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("input", help=".msh/.vtk/... (meshio) input")
    ap.add_argument("output", help="output .h5 in the solver schema")
    args = ap.parse_args(argv)
    mesh = from_meshio(args.input)
    write_mesh_h5(args.output, mesh)
    print(
        f"{args.output}: {mesh.num_node} nodes, {mesh.num_tet} tets, "
        f"{len(mesh.boundaries)} boundaries"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
