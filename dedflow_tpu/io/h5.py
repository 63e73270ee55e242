"""HDF5 mesh and solution I/O, format-compatible with the reference.

Mesh schema (written by tools/mesh_convert.py:116-126, read by
Mesh3DCreateH5 / ReadBoundFromH5Private, Mesh.c:12-94):

    mesh/xg                  flat (3*N) coordinates
    mesh/ien/{tet,prism,hex} flat connectivity (only tet is computed on)
    mesh/bound/node_offset   (num_bound+1,)
    mesh/bound/node          flat unique boundary nodes
    mesh/bound/elem_offset   (num_bound+1,)
    mesh/bound/ien           flat (3*num_facet) boundary triangles
    mesh/bound/f2e           (num_facet,) parent tet per facet
    mesh/bound/forn          (num_facet,) local opposite-node index

Solution schema (main.c:521-531, 571-591): datasets u (3N, node-interleaved),
p/phi/T (N), du (3N), dphi/dT (N). This module additionally writes a `meta`
group (step, time) - the reference stores the step only in the filename
(SURVEY.md section 5, checkpoint/resume).

State layout conversion: the framework state is (N, 6) with columns
[u0,u1,u2,p,phi,T]; the reference's flat vector is
[3N interleaved velocity | p | phi | T] (SURVEY.md section 3.5).
"""

from __future__ import annotations

import numpy as np

from dedflow_tpu.mesh.mesh import Boundary, Mesh
from dedflow_tpu.utils.dtypes import INDEX_DTYPE


def _h5py():
    import h5py

    return h5py


def state_to_reference_flat(state: np.ndarray) -> np.ndarray:
    """(N, 6) -> flat (6N,) reference layout."""
    n = state.shape[0]
    flat = np.empty(6 * n, dtype=state.dtype)
    flat[: 3 * n] = np.asarray(state[:, :3]).ravel()
    flat[3 * n : 4 * n] = state[:, 3]
    flat[4 * n : 5 * n] = state[:, 4]
    flat[5 * n : 6 * n] = state[:, 5]
    return flat


def reference_flat_to_state(flat: np.ndarray) -> np.ndarray:
    """flat (6N,) reference layout -> (N, 6)."""
    n = flat.shape[0] // 6
    state = np.empty((n, 6), dtype=flat.dtype)
    state[:, :3] = flat[: 3 * n].reshape(n, 3)
    state[:, 3] = flat[3 * n : 4 * n]
    state[:, 4] = flat[4 * n : 5 * n]
    state[:, 5] = flat[5 * n : 6 * n]
    return state


def write_mesh_h5(path: str, mesh: Mesh) -> None:
    h5py = _h5py()
    with h5py.File(path, "w") as f:
        f.create_dataset("mesh/xg", data=mesh.xg.ravel())
        f.create_dataset("mesh/ien/tet", data=mesh.ien.ravel().astype(INDEX_DTYPE))
        if mesh.ien_prism is not None:
            f.create_dataset(
                "mesh/ien/prism", data=mesh.ien_prism.ravel().astype(INDEX_DTYPE)
            )
        if mesh.ien_hex is not None:
            f.create_dataset(
                "mesh/ien/hex", data=mesh.ien_hex.ravel().astype(INDEX_DTYPE)
            )
        node_offset = [0]
        elem_offset = [0]
        nodes, tris, f2e, forn = [], [], [], []
        for b in mesh.boundaries:
            nodes.append(b.nodes)
            tris.append(b.ien)
            f2e.append(b.f2e)
            forn.append(b.forn)
            node_offset.append(node_offset[-1] + b.num_node)
            elem_offset.append(elem_offset[-1] + b.num_facet)
        cat = lambda xs, w: (
            np.concatenate([np.asarray(x).reshape(-1, w) for x in xs], axis=0)
            if xs
            else np.zeros((0, w), dtype=INDEX_DTYPE)
        )
        f.create_dataset(
            "mesh/bound/node_offset", data=np.asarray(node_offset, dtype=INDEX_DTYPE)
        )
        f.create_dataset("mesh/bound/node", data=cat(nodes, 1).ravel())
        f.create_dataset(
            "mesh/bound/elem_offset", data=np.asarray(elem_offset, dtype=INDEX_DTYPE)
        )
        f.create_dataset("mesh/bound/ien", data=cat(tris, 3).ravel())
        f.create_dataset("mesh/bound/f2e", data=cat(f2e, 1).ravel())
        f.create_dataset("mesh/bound/forn", data=cat(forn, 1).ravel())


def read_mesh_h5(path: str, group: str = "mesh") -> Mesh:
    """Read a mesh written by this module or by tools/mesh_convert.py."""
    h5py = _h5py()
    with h5py.File(path, "r") as f:
        g = f[group]
        xg = np.asarray(g["xg"]).reshape(-1, 3)
        ien = np.asarray(g["ien/tet"], dtype=INDEX_DTYPE).reshape(-1, 4)
        # mixed-cell tables (MeshData.h:27-29): preserved, stencil-only
        ien_prism = ien_hex = None
        if "ien/prism" in g:
            v = np.asarray(g["ien/prism"], dtype=INDEX_DTYPE).reshape(-1, 6)
            ien_prism = v if v.size else None
        if "ien/hex" in g:
            v = np.asarray(g["ien/hex"], dtype=INDEX_DTYPE).reshape(-1, 8)
            ien_hex = v if v.size else None
        boundaries: list[Boundary] = []
        if "bound" in g:
            b = g["bound"]
            node_offset = np.asarray(b["node_offset"], dtype=np.int64)
            elem_offset = np.asarray(b["elem_offset"], dtype=np.int64)
            node = np.asarray(b["node"], dtype=INDEX_DTYPE)
            tri = np.asarray(b["ien"], dtype=INDEX_DTYPE).reshape(-1, 3)
            f2e = np.asarray(b["f2e"], dtype=INDEX_DTYPE)
            forn = np.asarray(b["forn"], dtype=INDEX_DTYPE)
            for i in range(len(node_offset) - 1):
                n0, n1 = node_offset[i], node_offset[i + 1]
                e0, e1 = elem_offset[i], elem_offset[i + 1]
                boundaries.append(
                    Boundary(
                        nodes=node[n0:n1],
                        ien=tri[e0:e1],
                        f2e=f2e[e0:e1],
                        forn=forn[e0:e1],
                    )
                )
    return Mesh(
        xg=xg, ien=ien, boundaries=boundaries,
        ien_prism=ien_prism, ien_hex=ien_hex,
    )


def write_solution_h5(
    path: str,
    wg: np.ndarray,
    dwg: np.ndarray,
    step: int | None = None,
    time: float | None = None,
) -> None:
    """Write a solution snapshot in the reference layout (main.c:571-591).

    `wg` and `dwg` are (N, 6) state arrays. Dataset mapping (note the
    reference writes p from the *rate* vector - pressure lives in the dwg
    slot 3 throughout, main.c:584):
        u    = wg[:, :3] interleaved      du   = dwg[:, :3] interleaved
        phi  = wg[:, 4]                   p    = dwg[:, 3]
        T    = wg[:, 5]                   dphi = dwg[:, 4],  dT = dwg[:, 5]
    """
    import os

    h5py = _h5py()
    wg = np.asarray(wg)
    dwg = np.asarray(dwg)
    n = wg.shape[0]
    # atomic write: temp file + rename, so an interrupted run never leaves
    # a truncated snapshot behind (the reference writes in place,
    # main.c:571-591; SURVEY.md section 5, checkpoint/resume)
    tmp = path + ".tmp"
    with h5py.File(tmp, "w") as f:
        f.create_dataset("u", data=wg[:, :3].ravel())
        f.create_dataset("p", data=np.asarray(dwg[:, 3]))
        f.create_dataset("phi", data=np.asarray(wg[:, 4]))
        f.create_dataset("T", data=np.asarray(wg[:, 5]))
        f.create_dataset("du", data=dwg[:, :3].ravel())
        f.create_dataset("dphi", data=np.asarray(dwg[:, 4]))
        f.create_dataset("dT", data=np.asarray(dwg[:, 5]))
        if step is not None:
            f.create_dataset("meta/step", data=np.int64(step))
        if time is not None:
            f.create_dataset("meta/time", data=np.float64(time))
    os.replace(tmp, path)


def read_solution_h5(path: str) -> dict:
    """Read a snapshot -> dict with wg, dwg (N,6) and optional meta.

    Reconstruction follows the reference resume path (main.c:480-503):
    wg gets u/phi/T (velocity block zero-padded p), dwg gets du/p/dphi/dT.
    """
    h5py = _h5py()
    with h5py.File(path, "r") as f:
        u = np.asarray(f["u"]).reshape(-1, 3)
        n = u.shape[0]
        wg = np.zeros((n, 6), dtype=u.dtype)
        dwg = np.zeros((n, 6), dtype=u.dtype)
        wg[:, :3] = u
        wg[:, 4] = np.asarray(f["phi"])
        wg[:, 5] = np.asarray(f["T"])
        dwg[:, :3] = np.asarray(f["du"]).reshape(-1, 3)
        dwg[:, 3] = np.asarray(f["p"])
        if "dphi" in f:
            dwg[:, 4] = np.asarray(f["dphi"])
        if "dT" in f:
            dwg[:, 5] = np.asarray(f["dT"])
        out = {"wg": wg, "dwg": dwg}
        if "meta" in f:
            if "step" in f["meta"]:
                out["step"] = int(np.asarray(f["meta/step"]))
            if "time" in f["meta"]:
                out["time"] = float(np.asarray(f["meta/time"]))
    return out
