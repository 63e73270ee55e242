"""Bandwidth-reducing mesh reordering (host-side, NumPy/SciPy).

The reference assembles unstructured tet meshes in whatever node order
the file provides (AssembleSystemTet, assemble.cu:1467-1762 - order only
affects its CSR column-search cost). On TPU, order IS the fast path: the
windowed assembly kernels and banded SpMV need every element's nodes to
live inside a bounded index window. Reverse Cuthill-McKee brings the
adjacency bandwidth of a random-order 3D tet mesh from O(N) down to
O(N^(2/3)) (measured: 175k-node Delaunay, max |col-row| 175470 -> 19360),
which fits the same VMEM window sizes the structured lattice path uses.

The permutation is a solver-internal layout choice: `NodeOrder` keeps
both directions so states and meshes convert losslessly; I/O stays in
file order.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class NodeOrder:
    """A node relabeling: internal id = rank[file id]; file id = perm[
    internal id]."""

    perm: np.ndarray  # (N,) internal -> file
    rank: np.ndarray  # (N,) file -> internal

    def to_internal(self, x: np.ndarray) -> np.ndarray:
        """Reorder a (N, ...) nodal array from file to internal order."""
        return np.asarray(x)[self.perm]

    def to_file(self, x: np.ndarray) -> np.ndarray:
        """Reorder a (N, ...) nodal array from internal to file order."""
        return np.asarray(x)[self.rank]


def rcm_order(ien: np.ndarray, num_node: int) -> NodeOrder:
    """Reverse Cuthill-McKee permutation of the node graph induced by the
    element connectivity (tets; any (ne, k) simplex table works)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    ien = np.asarray(ien)
    k = ien.shape[1]
    i = np.repeat(ien, k, axis=1).ravel()
    j = np.tile(ien, (1, k)).ravel()
    adj = coo_matrix(
        (np.ones(i.size, dtype=np.int8), (i, j)), shape=(num_node, num_node)
    ).tocsr()
    perm = np.asarray(
        reverse_cuthill_mckee(adj, symmetric_mode=True), dtype=np.int64
    )
    rank = np.empty(num_node, dtype=np.int64)
    rank[perm] = np.arange(num_node)
    return NodeOrder(perm=perm, rank=rank)


def reorder_mesh(mesh, order: NodeOrder):
    """A new Mesh with nodes relabeled to internal order and elements
    sorted by their minimum (internal) node - the element order the
    windowed kernels stream in. Boundary tables are relabeled in place;
    facet->element links follow the element sort."""
    from dedflow_tpu.mesh.mesh import Boundary, Mesh
    from dedflow_tpu.utils.dtypes import INDEX_DTYPE

    ien = order.rank[np.asarray(mesh.ien)]
    eperm = np.argsort(ien.min(axis=1), kind="stable")
    erank = np.empty(len(eperm), dtype=np.int64)
    erank[eperm] = np.arange(len(eperm))
    ien = ien[eperm]
    bounds = []
    for b in mesh.boundaries:
        bounds.append(
            Boundary(
                nodes=order.rank[np.asarray(b.nodes)].astype(INDEX_DTYPE),
                ien=order.rank[np.asarray(b.ien)].astype(INDEX_DTYPE),
                f2e=erank[np.asarray(b.f2e)].astype(INDEX_DTYPE),
                forn=np.asarray(b.forn),
            )
        )
    relab = lambda t: (
        None if t is None else order.rank[np.asarray(t)].astype(INDEX_DTYPE)
    )
    return Mesh(
        xg=order.to_internal(mesh.xg),
        ien=ien.astype(INDEX_DTYPE),
        boundaries=bounds,
        ien_prism=relab(mesh.ien_prism),
        ien_hex=relab(mesh.ien_hex),
    )


def bandwidth(ien: np.ndarray) -> int:
    """Max per-element node-index spread (the window the assembly kernels
    must cover)."""
    ien = np.asarray(ien)
    return int((ien.max(axis=1) - ien.min(axis=1)).max()) if len(ien) else 0
