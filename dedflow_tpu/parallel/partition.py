"""Geometric mesh partitioning (recursive coordinate bisection) + padding.

TPU-native replacement for the reference's dead METIS path
(PartitionMesh3DMETIS, partition.c:16-77; caller commented out at
Mesh.c:147-153): instead of producing an `epart` array for an MPI layer
that never existed, partitioning here *reorders* the mesh so that each
partition's nodes and elements are contiguous index ranges, padded to
identical sizes. Equal contiguous ranges are exactly what
`jax.sharding.NamedSharding` shards over a device mesh axis, so a
partitioned mesh needs no special data structures - plain
`NamedSharding(mesh, P('dd'))` on the node/element/nnz axes gives every
chip a spatially compact subdomain, and XLA's GSPMD pass derives the halo
communication from the gather/segment-sum assembly pattern.

Padding artifacts are inert by construction:
- pad nodes touch no real element; sparse.topology gives every node a
  diagonal entry, and the sharded solver marks pad rows as constrained,
  so they become unit-diagonal Dirichlet rows;
- pad elements are degenerate (all four nodes identical), so
  fem.element.tet_geometry zeroes their geometry and det_j, and every
  weak-form contribution they scatter is exactly zero.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dedflow_tpu.mesh.mesh import Boundary, Mesh
from dedflow_tpu.utils.dtypes import INDEX_DTYPE


def rcb_parts(xg: np.ndarray, num_parts: int, native: bool = True) -> np.ndarray:
    """Recursive coordinate bisection: (N, 3) coords -> (N,) part ids.

    Splits along the longest extent at the weighted median so part sizes
    are balanced to within one node for any `num_parts` (non-powers of two
    split proportionally). The C++ fast path (native/topology.cpp) is
    used when available; this NumPy body is the oracle and fallback.
    """
    if native:
        from dedflow_tpu import native as _native

        npart = _native.rcb(np.asarray(xg, dtype=np.float64), num_parts)
        if npart is not None:
            return npart

    n = xg.shape[0]
    part = np.zeros(n, dtype=np.int64)

    def recurse(idx: np.ndarray, p0: int, p1: int) -> None:
        nparts = p1 - p0
        if nparts <= 1 or idx.size == 0:
            part[idx] = p0
            return
        left = nparts // 2
        # number of nodes for the left group, proportional to its part count
        nleft = (idx.size * left) // nparts
        coords = xg[idx]
        axis = int(np.argmax(coords.max(axis=0) - coords.min(axis=0)))
        order = np.argsort(coords[:, axis], kind="stable")
        recurse(idx[order[:nleft]], p0, p0 + left)
        recurse(idx[order[nleft:]], p0 + left, p1)

    recurse(np.arange(n, dtype=np.int64), 0, int(num_parts))
    return part


def _grouped_layout(owner: np.ndarray, num_parts: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Pack items into per-part contiguous slots padded to a common size.

    Returns (item_map, slot_real, per_part) where item_map[i] is the new
    slot of original item i, slot_real marks non-padding slots, and
    per_part is the padded per-part count.
    """
    counts = np.bincount(owner, minlength=num_parts)
    per_part = int(counts.max()) if counts.size else 0
    order = np.argsort(owner, kind="stable")
    # slot within the part = running index of the item inside its part
    within = np.empty(owner.size, dtype=np.int64)
    start = 0
    for p in range(num_parts):
        c = counts[p]
        within[order[start : start + c]] = np.arange(c)
        start += c
    item_map = owner * per_part + within
    slot_real = np.zeros(num_parts * per_part, dtype=bool)
    slot_real[item_map] = True
    return item_map, slot_real, per_part


@dataclass(frozen=True)
class PartitionInfo:
    """Mapping between the original mesh and the padded partitioned one."""

    num_parts: int
    node_map: np.ndarray  # (N_orig,) new node index of each original node
    elem_map: np.ndarray  # (ne_orig,) new element index of each original elem
    node_real: np.ndarray  # (N_new,) False on padding slots
    elem_real: np.ndarray  # (ne_new,) False on padding slots
    node_part: np.ndarray  # (N_new,) part id (non-decreasing)
    elem_part: np.ndarray  # (ne_new,) part id (non-decreasing)


def partition_mesh(mesh: Mesh, num_parts: int) -> tuple[Mesh, PartitionInfo]:
    """Reorder + pad `mesh` into `num_parts` equally-sized contiguous
    subdomain blocks (nodes by RCB of coordinates; elements by the part
    owning the majority of their nodes, ties to the lowest part id).

    Node and element counts of the returned mesh are exact multiples of
    `num_parts`; padding slots hold inert artifacts (module docstring).
    """
    P = int(num_parts)
    xg = np.asarray(mesh.xg)
    ien = np.asarray(mesh.ien, dtype=np.int64)
    node_owner = rcb_parts(xg, P)

    # element owner: the majority part of its 4 nodes (median-pair of the
    # sorted owners = the majority when one exists, else the lower of the
    # 2-2 split)
    elem_owner = np.sort(node_owner[ien], axis=1)[:, 1]

    node_map, node_real, nodes_per_part = _grouped_layout(node_owner, P)
    elem_map, elem_real, elems_per_part = _grouped_layout(elem_owner, P)
    n_new = P * nodes_per_part
    ne_new = P * elems_per_part

    # coordinates: pad slots copy their part's first real node (or origin)
    xg_new = np.zeros((n_new, xg.shape[1]), dtype=xg.dtype)
    xg_new[node_map] = xg
    for p in range(P):
        lo, hi = p * nodes_per_part, (p + 1) * nodes_per_part
        pad = ~node_real[lo:hi]
        if pad.any():
            src = np.flatnonzero(node_real[lo:hi])
            fill = xg_new[lo + src[0]] if src.size else np.zeros(xg.shape[1])
            xg_new[lo:hi][pad] = fill

    # connectivity: pad elements are degenerate (4x the part's anchor node)
    ien_new = np.zeros((ne_new, 4), dtype=np.int64)
    ien_new[elem_map] = node_map[ien]
    for p in range(P):
        lo, hi = p * elems_per_part, (p + 1) * elems_per_part
        pad = ~elem_real[lo:hi]
        if pad.any():
            anchors = np.flatnonzero(node_real[p * nodes_per_part : (p + 1) * nodes_per_part])
            anchor = p * nodes_per_part + (anchors[0] if anchors.size else 0)
            ien_new[lo:hi][pad] = anchor

    boundaries = []
    for b in mesh.boundaries:
        nodes = np.sort(node_map[np.asarray(b.nodes, dtype=np.int64)]).astype(
            INDEX_DTYPE
        )
        tri = node_map[np.asarray(b.ien, dtype=np.int64)].astype(INDEX_DTYPE)
        f2e = elem_map[np.asarray(b.f2e, dtype=np.int64)].astype(INDEX_DTYPE)
        boundaries.append(
            Boundary(nodes=nodes, ien=tri, f2e=f2e, forn=np.asarray(b.forn))
        )

    new_mesh = Mesh(
        xg=xg_new, ien=ien_new.astype(INDEX_DTYPE), boundaries=boundaries
    )
    info = PartitionInfo(
        num_parts=P,
        node_map=node_map,
        elem_map=elem_map,
        node_real=node_real,
        elem_real=elem_real,
        node_part=np.repeat(np.arange(P), nodes_per_part),
        elem_part=np.repeat(np.arange(P), elems_per_part),
    )
    return new_mesh, info


def permute_state(info: PartitionInfo, state: np.ndarray) -> np.ndarray:
    """(N_orig, ...) nodal state in original order -> padded partitioned
    order (padding rows are zero)."""
    out = np.zeros((info.node_real.size,) + state.shape[1:], dtype=state.dtype)
    out[info.node_map] = state
    return out


def unpermute_state(info: PartitionInfo, state: np.ndarray) -> np.ndarray:
    """Padded partitioned-order state -> (N_orig, ...) original order."""
    return np.asarray(state)[info.node_map]
