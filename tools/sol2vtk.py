#!/usr/bin/env python3
"""Solution exporter: sol.<step>.h5 series -> XDMF for ParaView.

Counterpart of the reference tools/sol2vtk.py (sol2vtk.py:94-128), which
wrote one meshio-XDMF file per snapshot. This version needs no meshio:
it emits a single time-series XDMF XML whose heavy data are HDF5
references into the existing mesh/solution files (zero data copying),
which ParaView/VisIt read natively.

Usage:
  python tools/sol2vtk.py mesh.h5 run_dir/ -o run_dir/solution.xdmf
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


_GRID = """    <Grid Name="step{step}" GridType="Uniform">
      <Time Value="{time}"/>
      <Topology TopologyType="Tetrahedron" NumberOfElements="{ne}">
        <DataItem Format="HDF" Dimensions="{ne} 4" NumberType="Int">{mesh}:/mesh/ien/tet</DataItem>
      </Topology>
      <Geometry GeometryType="XYZ">
        <DataItem Format="HDF" Dimensions="{nn} 3">{mesh}:/mesh/xg</DataItem>
      </Geometry>
{attrs}    </Grid>
"""

_ATTR = """      <Attribute Name="{name}" AttributeType="{kind}" Center="Node">
        <DataItem Format="HDF" Dimensions="{nn}{dim}">{sol}:/{name}</DataItem>
      </Attribute>
"""


def snapshot_steps(run_dir: str) -> list[int]:
    steps = []
    for p in glob.glob(os.path.join(run_dir, "sol.*.h5")):
        m = re.match(r"sol\.(\d+)\.h5$", os.path.basename(p))
        if m:
            steps.append(int(m.group(1)))
    return sorted(steps)


def write_xdmf(mesh_path: str, run_dir: str, out: str, dt: float = 5e-2) -> int:
    import h5py

    with h5py.File(mesh_path, "r") as f:
        nn = f["mesh/xg"].shape[0] // 3
        ne = f["mesh/ien/tet"].shape[0] // 4

    fields = [("u", "Vector", " 3"), ("p", "Scalar", ""), ("phi", "Scalar", ""),
              ("T", "Scalar", "")]
    steps = snapshot_steps(run_dir)
    if not steps:
        raise SystemExit(f"no sol.<step>.h5 files in {run_dir}")

    out_dir = os.path.dirname(os.path.abspath(out))
    rel = lambda p: os.path.relpath(os.path.abspath(p), out_dir)
    grids = []
    for s in steps:
        sol = os.path.join(run_dir, f"sol.{s}.h5")
        with h5py.File(sol, "r") as f:
            t = float(np.asarray(f["meta/time"])) if "meta" in f else s * dt
        attrs = "".join(
            _ATTR.format(name=n, kind=k, nn=nn, dim=d, sol=rel(sol))
            for n, k, d in fields
        )
        grids.append(
            _GRID.format(step=s, time=t, ne=ne, nn=nn, mesh=rel(mesh_path),
                         attrs=attrs)
        )

    xml = (
        '<?xml version="1.0"?>\n'
        '<Xdmf Version="3.0">\n  <Domain>\n'
        '  <Grid Name="series" GridType="Collection" CollectionType="Temporal">\n'
        + "".join(grids)
        + "  </Grid>\n  </Domain>\n</Xdmf>\n"
    )
    with open(out, "w") as f:
        f.write(xml)
    return len(steps)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mesh", help="mesh .h5")
    ap.add_argument("run_dir", help="directory with sol.<step>.h5")
    ap.add_argument("-o", "--out", default=None, help="output .xdmf")
    ap.add_argument("--dt", type=float, default=5e-2,
                    help="fallback dt when snapshots lack meta/time")
    args = ap.parse_args(argv)
    out = args.out or os.path.join(args.run_dir, "solution.xdmf")
    n = write_xdmf(args.mesh, args.run_dir, out, args.dt)
    print(f"{out}: {n} snapshots")
    return 0


if __name__ == "__main__":
    sys.exit(main())
