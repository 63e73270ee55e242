"""Static-shape cell lists for neighbor search (TPU-native).

Classic DEM cell lists are pointer-chasing structures; the TPU version is
fully dense and static-shaped so it jits once:

1. linear cell id per particle (grid dims are static Python ints),
2. sort particles by cell id,
3. fixed-capacity bucket table (ncell, K) of particle indices, built by a
   rank-within-cell scatter (overflow beyond K is dropped - pick K from
   the packing fraction; `cell_stats` reports the true maximum),
4. per-particle candidate list = the buckets of the 27 surrounding cells,
   a (P, 27*K) gather.

The grid is the TPU replacement for the neighbor machinery the reference
never built (SURVEY.md section 2, Particle row; BASELINE config #4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class CellGrid:
    """Static grid config (hashable; passed as a static jit arg)."""

    origin: tuple[float, float, float]
    cell_size: float
    dims: tuple[int, int, int]
    capacity: int  # K: max particles per cell kept

    @property
    def num_cell(self) -> int:
        nx, ny, nz = self.dims
        return nx * ny * nz


def make_grid(
    lo, hi, cell_size: float, capacity: int = 8, pad_cells: int = 1
) -> CellGrid:
    """Grid covering [lo, hi] with one ghost layer so boundary particles
    get full 27-cell stencils without clamping artifacts."""
    lo = np.asarray(lo, dtype=float)
    hi = np.asarray(hi, dtype=float)
    dims = tuple(
        int(np.ceil((hi[i] - lo[i]) / cell_size)) + 2 * pad_cells for i in range(3)
    )
    origin = tuple(lo - pad_cells * cell_size)
    return CellGrid(origin=origin, cell_size=cell_size, dims=dims, capacity=capacity)


def cell_coords(grid: CellGrid, x: jnp.ndarray) -> jnp.ndarray:
    """(P, 3) integer cell coordinates, clamped into the grid."""
    rel = (x - jnp.asarray(grid.origin, dtype=x.dtype)) / grid.cell_size
    c = jnp.floor(rel).astype(jnp.int32)
    return jnp.clip(c, 0, jnp.asarray(grid.dims, dtype=jnp.int32) - 1)


def linear_ids(grid: CellGrid, coords: jnp.ndarray) -> jnp.ndarray:
    nx, ny, nz = grid.dims
    return (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]


@partial(jax.jit, static_argnums=0)
def build_buckets(grid: CellGrid, x: jnp.ndarray) -> jnp.ndarray:
    """(ncell * K,) bucket table of particle indices; empty slots = P."""
    p = x.shape[0]
    k = grid.capacity
    cid = linear_ids(grid, cell_coords(grid, x))
    order = jnp.argsort(cid)
    cid_sorted = cid[order]
    # rank of each sorted particle within its cell
    starts = jnp.searchsorted(cid_sorted, jnp.arange(grid.num_cell, dtype=cid.dtype))
    rank = jnp.arange(p, dtype=jnp.int32) - starts[cid_sorted].astype(jnp.int32)
    slot = cid_sorted * k + rank
    # drop overflow (rank >= K) via out-of-range target
    slot = jnp.where(rank < k, slot, grid.num_cell * k)
    buckets = jnp.full((grid.num_cell * k,), p, dtype=jnp.int32)
    return buckets.at[slot].set(order.astype(jnp.int32), mode="drop")


_OFFSETS = np.array(
    [(i, j, l) for i in (-1, 0, 1) for j in (-1, 0, 1) for l in (-1, 0, 1)],
    dtype=np.int32,
)  # (27, 3)


@partial(jax.jit, static_argnums=0)
def candidate_lists(grid: CellGrid, x: jnp.ndarray, buckets: jnp.ndarray) -> jnp.ndarray:
    """(P, 27*K) candidate neighbor indices per particle (P = empty)."""
    p = x.shape[0]
    k = grid.capacity
    nx, ny, nz = grid.dims
    coords = cell_coords(grid, x)  # (P, 3)
    nbr = coords[:, None, :] + jnp.asarray(_OFFSETS)[None]  # (P, 27, 3)
    inside = jnp.all(
        (nbr >= 0) & (nbr < jnp.asarray(grid.dims, dtype=jnp.int32)), axis=-1
    )  # (P, 27)
    ncid = (nbr[..., 0] * ny + nbr[..., 1]) * nz + nbr[..., 2]
    ncid = jnp.where(inside, ncid, grid.num_cell)  # OOB -> sentinel cell
    # gather buckets: slot indices (P, 27, K); sentinel cell reads P-fill
    slots = ncid[..., None] * k + jnp.arange(k, dtype=jnp.int32)
    cand = jnp.take(buckets, slots.reshape(p, 27 * k), mode="fill", fill_value=p)
    return cand


def cell_stats(grid: CellGrid, x: np.ndarray) -> dict:
    """Host-side diagnostics: occupancy histogram and overflow check."""
    coords = np.clip(
        np.floor((np.asarray(x) - np.asarray(grid.origin)) / grid.cell_size),
        0,
        np.asarray(grid.dims) - 1,
    ).astype(np.int64)
    nx, ny, nz = grid.dims
    cid = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]
    counts = np.bincount(cid, minlength=grid.num_cell)
    return {
        "max_per_cell": int(counts.max()),
        "overflow": int(np.maximum(counts - grid.capacity, 0).sum()),
        "occupied_cells": int((counts > 0).sum()),
    }
