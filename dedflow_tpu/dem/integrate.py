"""Explicit DEM time stepping (semi-implicit Euler under lax.scan).

Fills the reference's missing `SolveParticleSystem` (declared at
main.c:555, defined nowhere). Semi-implicit (symplectic) Euler is the
standard soft-sphere DEM integrator: with damping the scheme is stable
for dt < ~2*sqrt(m/k_n) and dissipates contact energy monotonically.

The whole multi-substep run is one jitted `lax.scan` with the cell-list
rebuild inside the loop - static shapes, zero host syncs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from dedflow_tpu.dem.cells import CellGrid, build_buckets, candidate_lists
from dedflow_tpu.dem.contact import ContactParams, pair_forces, wall_forces
from dedflow_tpu.dem.particles import ParticleState


@dataclass(frozen=True)
class DEMConfig:
    grid: CellGrid
    contact: ContactParams = field(default_factory=ContactParams)
    gravity: tuple[float, float, float] = (0.0, 0.0, -9.81)
    dt: float = 1.0e-4
    # box for wall contacts; None = no walls
    walls_lo: tuple[float, float, float] | None = None
    walls_hi: tuple[float, float, float] | None = None
    # ambient linear (viscous) drag coefficient: F -= linear_drag * v.
    # Models the surrounding gas for powder settling; also the cheap way
    # to dissipate tangential sliding, which frictionless spheres on
    # frictionless walls would otherwise keep forever.
    linear_drag: float = 0.0


def forces(cfg: DEMConfig, state: ParticleState, ext: jnp.ndarray | None = None):
    """Total force (P, 3): contacts + walls + gravity + external."""
    buckets = build_buckets(cfg.grid, state.x)
    cand = candidate_lists(cfg.grid, state.x, buckets)
    f = pair_forces(state.x, state.v, state.radius, cand, cfg.contact)
    if cfg.walls_lo is not None:
        f = f + wall_forces(
            state.x, state.v, state.radius, cfg.walls_lo, cfg.walls_hi, cfg.contact
        )
    g = jnp.asarray(cfg.gravity, dtype=state.x.dtype)
    f = f + state.mass[:, None] * g[None]
    if cfg.linear_drag:
        f = f - cfg.linear_drag * state.v
    if ext is not None:
        f = f + ext
    return f


def dem_step(
    cfg: DEMConfig, state: ParticleState, ext: jnp.ndarray | None = None
) -> ParticleState:
    """One semi-implicit Euler substep."""
    f = forces(cfg, state, ext)
    a = f / state.mass[:, None]
    v = state.v + cfg.dt * a
    x = state.x + cfg.dt * v
    return ParticleState(x=x, v=v, a=a, mass=state.mass, radius=state.radius)


@partial(jax.jit, static_argnums=(0, 2))
def dem_run(
    cfg: DEMConfig,
    state: ParticleState,
    num_steps: int,
    ext: jnp.ndarray | None = None,
) -> ParticleState:
    """num_steps substeps as one lax.scan (zero host round-trips).
    `ext` (P, 3): external per-particle force held fixed over the substeps
    (e.g. fluid drag from dem.coupling, refreshed once per fluid step)."""

    def body(st, _):
        return dem_step(cfg, st, ext), None

    out, _ = jax.lax.scan(body, state, None, length=num_steps)
    return out


def kinetic_energy(state: ParticleState) -> jnp.ndarray:
    return 0.5 * jnp.sum(state.mass * jnp.sum(state.v * state.v, axis=-1))
