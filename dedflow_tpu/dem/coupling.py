"""FEM <-> DEM coupling: point location, interpolation, reaction scatter.

The reference has no coupling implementation (its `SolveParticleSystem`
is undefined; main.c:555); the capability is specified by BASELINE
config #5 ("fully coupled FEM-DEM"). TPU-native scheme:

- particles are located in tets with the same static-shape cell grid as
  contact search: elements are bucketed by centroid, each particle tests
  the 27 surrounding cells' candidates with barycentric coordinates
  (cell_size must be >= the largest element diameter so the containing
  element's centroid is always within one cell),
- fluid velocity/temperature interpolate to particles with P1 weights,
- drag follows Stokes' law F = 6 pi mu r (u_f - v_p),
- the equal-and-opposite reaction scatters back to mesh nodes with the
  same barycentric weights (momentum-conserving by construction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.dem.cells import CellGrid, build_buckets, candidate_lists
from dedflow_tpu.dem.particles import ParticleState
from dedflow_tpu.fem.assembly import FEMContext


def element_grid(
    mesh_xg: np.ndarray, ien: np.ndarray, capacity: int | None = None
) -> CellGrid:
    """Cell grid sized to the mesh: cell_size = max element diameter, so a
    point's containing element always has its centroid within one cell.
    Capacity defaults to the true maximum centroid count per cell (no
    bucket overflow -> location is exact)."""
    from dedflow_tpu.dem.cells import cell_stats, make_grid

    xe = np.asarray(mesh_xg)[np.asarray(ien)]  # (ne, 4, 3)
    # exclude degenerate (zero-volume) elements - the partitioned-mesh
    # padding (parallel.partition) - from the capacity estimate: their
    # centroids all collapse onto one point and would blow K up.
    j = xe[:, 1:, :] - xe[:, :1, :]
    real = np.abs(np.linalg.det(j)) > 0.0
    xe_r = xe[real] if real.any() else xe
    diam = np.linalg.norm(
        xe_r[:, :, None, :] - xe_r[:, None, :, :], axis=-1
    ).max()
    lo = np.asarray(mesh_xg).min(axis=0)
    hi = np.asarray(mesh_xg).max(axis=0)
    grid = make_grid(lo, hi, float(diam) * 1.001, capacity=1)
    if capacity is None:
        capacity = cell_stats(grid, xe_r.mean(axis=1))["max_per_cell"]
    return make_grid(lo, hi, float(diam) * 1.001, capacity=int(capacity))


@partial(jax.jit, static_argnums=0)
def locate(
    grid: CellGrid, ctx: FEMContext, x_p: jnp.ndarray, tol: float | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Find the containing tet of each point.

    Returns (elem (P,) int32 with -1 = not found, bary (P, 4) weights).
    Uses the precomputed inverse element Jacobians: with the J convention
    of fem.element (x(xi) = x_0 + J xi), the reference coordinates of a
    point are xi = J^-1 (p - x_0) and the P1 weights are
    (1 - sum(xi), xi_1, xi_2, xi_3).

    `tol` (the barycentric slack accepting points on element faces) scales
    with the dtype: f32 roundoff in xi is ~1e-7, so the f64 default of
    1e-10 would report face-adjacent particles as "not found" and silently
    drop their drag force for a step.
    """
    if tol is None:
        tol = 1.0e-10 if x_p.dtype == jnp.float64 else 1.0e-5
    p = x_p.shape[0]
    centroids = jnp.mean(ctx.xg[ctx.ien], axis=1)  # (ne, 3)
    # degenerate (padding) elements collapse onto a real node's position;
    # push them into the ghost corner cell so they cannot crowd real
    # elements out of a bucket (they are filtered by det_j > 0 below)
    far = jnp.asarray(grid.origin, centroids.dtype) - 10.0 * grid.cell_size
    centroids = jnp.where(
        (ctx.det_j > 0.0)[:, None], centroids, far[None, :]
    )
    buckets = build_buckets(grid, centroids)
    cand = candidate_lists(grid, x_p, buckets)  # (P, M) element ids; ne = empty
    ne = centroids.shape[0]
    valid = cand < ne
    e = jnp.minimum(cand, ne - 1)  # (P, M)

    x0 = ctx.xg[ctx.ien[e, 0]]  # (P, M, 3)
    inv_j = ctx.inv_j[e]  # (P, M, 3, 3)
    xi = jnp.einsum("pmij,pmj->pmi", inv_j, x_p[:, None, :] - x0)  # (P, M, 3)
    lam0 = 1.0 - jnp.sum(xi, axis=-1)
    bary = jnp.concatenate([lam0[..., None], xi], axis=-1)  # (P, M, 4)
    # degenerate padding elements have inv_j = 0 -> xi = 0, lam0 = 1: looks
    # "inside"; exclude them via det_j > 0
    nondegen = ctx.det_j[e] > 0.0
    inside = valid & nondegen & jnp.all(bary >= -tol, axis=-1)  # (P, M)
    first = jnp.argmax(inside, axis=1)  # (P,)
    found = jnp.take_along_axis(inside, first[:, None], axis=1)[:, 0]
    elem = jnp.where(found, jnp.take_along_axis(e, first[:, None], axis=1)[:, 0], -1)
    w = jnp.take_along_axis(bary, first[:, None, None], axis=1)[:, 0]
    w = jnp.where(found[:, None], w, 0.0)
    return elem.astype(jnp.int32), w


def interpolate(
    ctx: FEMContext, elem: jnp.ndarray, bary: jnp.ndarray, field: jnp.ndarray
) -> jnp.ndarray:
    """P1-interpolate a nodal field (N, ...) to particles (P, ...).
    Particles outside the mesh (elem = -1) get zeros (bary is zeroed)."""
    e = jnp.maximum(elem, 0)
    nodal = field[ctx.ien[e]]  # (P, 4, ...)
    return jnp.einsum("pa,pa...->p...", bary, nodal)


def stokes_drag(
    u_fluid: jnp.ndarray, state: ParticleState, mu: float
) -> jnp.ndarray:
    """(P, 3) drag force on particles: 6 pi mu r (u_f - v_p)."""
    coef = 6.0 * jnp.pi * mu * state.radius
    return coef[:, None] * (u_fluid - state.v)


def reaction_to_nodes(
    ctx: FEMContext,
    elem: jnp.ndarray,
    bary: jnp.ndarray,
    f_particle: jnp.ndarray,
    num_node: int,
) -> jnp.ndarray:
    """Scatter -f_particle to mesh nodes with barycentric weights (N, 3)."""
    e = jnp.maximum(elem, 0)
    nodes = ctx.ien[e]  # (P, 4)
    vals = -bary[..., None] * f_particle[:, None, :]  # (P, 4, 3)
    out = jnp.zeros((num_node, 3), dtype=f_particle.dtype)
    return out.at[nodes.reshape(-1)].add(vals.reshape(-1, 3))


def drag_exchange(
    grid: CellGrid,
    ctx: FEMContext,
    state: ParticleState,
    w: jnp.ndarray,  # (N, 6) fluid state
    mu: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One coupling exchange: returns (particle drag force (P, 3),
    nodal reaction force (N, 3))."""
    elem, bary = locate(grid, ctx, state.x)
    u_p = interpolate(ctx, elem, bary, w[:, :3])
    f_d = stokes_drag(u_p, state, mu)
    # no force where the particle is outside the fluid mesh
    f_d = jnp.where((elem >= 0)[:, None], f_d, 0.0)
    f_nodes = reaction_to_nodes(ctx, elem, bary, f_d, w.shape[0])
    return f_d, f_nodes


def locate_lattice(
    lattice: tuple,  # (nx, ny, nz) cells
    origin: np.ndarray,  # (3,) box lower corner
    spacing: np.ndarray,  # (3,) cell sizes
    ctx: FEMContext,
    x_p: jnp.ndarray,
    tol: float | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lattice fast path for point location on box meshes: the containing
    CELL is closed-form (floor((p - origin)/h)), so each particle tests
    only the cell's 6 Kuhn tets instead of a 27-cell candidate gather
    (~100x fewer gathers at 100k particles; same (elem, bary) contract as
    `locate`). Element ids follow mesh.gen.box_mesh's cell-major order
    e = ((ix*ny + iy)*nz + iz)*6 + t."""
    if tol is None:
        tol = 1.0e-10 if x_p.dtype == jnp.float64 else 1.0e-5
    nx, ny, nz = lattice
    dims = jnp.asarray([nx, ny, nz], jnp.int32)
    rel = (x_p - jnp.asarray(origin, x_p.dtype)[None, :]) / jnp.asarray(
        spacing, x_p.dtype
    )[None, :]
    coords = jnp.clip(jnp.floor(rel).astype(jnp.int32), 0, dims - 1)
    inside_box = jnp.all((rel >= -tol) & (rel <= dims + tol), axis=-1)
    cell = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]
    e = cell[:, None] * 6 + jnp.arange(6, dtype=cell.dtype)[None, :]  # (P, 6)

    x0 = ctx.xg[ctx.ien[e, 0]]  # (P, 6, 3)
    inv_j = ctx.inv_j[e]  # (P, 6, 3, 3)
    xi = jnp.einsum("pmij,pmj->pmi", inv_j, x_p[:, None, :] - x0)
    lam0 = 1.0 - jnp.sum(xi, axis=-1)
    bary = jnp.concatenate([lam0[..., None], xi], axis=-1)  # (P, 6, 4)
    inside = (
        inside_box[:, None]
        & (ctx.det_j[e] > 0.0)
        & jnp.all(bary >= -tol, axis=-1)
    )
    first = jnp.argmax(inside, axis=1)
    found = jnp.take_along_axis(inside, first[:, None], axis=1)[:, 0]
    elem = jnp.where(
        found, jnp.take_along_axis(e, first[:, None], axis=1)[:, 0], -1
    )
    w = jnp.take_along_axis(bary, first[:, None, None], axis=1)[:, 0]
    w = jnp.where(found[:, None], w, 0.0)
    return elem.astype(jnp.int32), w


def drag_exchange_lattice(
    lattice: tuple,
    origin,
    spacing,
    ctx: FEMContext,
    state: ParticleState,
    w: jnp.ndarray,
    mu: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """drag_exchange with the closed-form lattice locator."""
    elem, bary = locate_lattice(
        lattice, np.asarray(origin), np.asarray(spacing), ctx, state.x
    )
    u_p = interpolate(ctx, elem, bary, w[:, :3])
    f_d = stokes_drag(u_p, state, mu)
    f_d = jnp.where((elem >= 0)[:, None], f_d, 0.0)
    f_nodes = reaction_to_nodes(ctx, elem, bary, f_d, w.shape[0])
    return f_d, f_nodes
