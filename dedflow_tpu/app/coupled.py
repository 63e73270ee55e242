"""Coupled FEM-DEM stepping (BASELINE config #5).

The reference only ever *references* a particle solve (`SolveParticleSystem`
at main.c:555, defined nowhere); this module implements the full two-way
coupling the capability spec asks for:

  per fluid step:
    1. locate particles in the mesh, interpolate the fluid velocity,
       compute Stokes drag on each particle and the equal-and-opposite
       nodal reaction (dem.coupling.drag_exchange),
    2. advance the thermal-fluid system one generalized-alpha step with
       the reaction as a nodal momentum load,
    3. advance the DEM subsystem `substeps` explicit substeps with the
       drag force held fixed (staggered/weak coupling - the standard
       scheme when dt_DEM << dt_fluid).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.config import SolverConfig
from dedflow_tpu.dem import coupling
from dedflow_tpu.dem.integrate import DEMConfig, dem_run
from dedflow_tpu.dem.particles import ParticleState
from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.solver.newton import NSSolver


@dataclass
class CoupledConfig:
    dem: DEMConfig
    drag_mu: float = 1.0e-3  # fluid viscosity for the Stokes drag law
    substeps: int = 10  # DEM substeps per fluid step
    # use the dense grid-resident DEM path (dem.grid; ~4x faster on TPU at
    # 100k particles); requires uniform particle mass
    use_grid: bool = False


class CoupledSolver:
    """Staggered FEM-DEM solver: NSSolver + DEM + drag exchange."""

    def __init__(self, mesh: Mesh, cfg: SolverConfig, ccfg: CoupledConfig,
                 dtype=None):
        self.fluid = NSSolver(mesh, cfg, dtype=dtype)
        self.ccfg = ccfg
        self.grid = coupling.element_grid(mesh.xg, mesh.ien)

    def step(self, wg, dwgold, dwg, pstate: ParticleState):
        """One coupled step; returns (wg, dwgold, dwg, pstate, stats)."""
        f_p, f_nodes = coupling.drag_exchange(
            self.grid, self.fluid.ctx, pstate, wg, self.ccfg.drag_mu
        )
        wg, dwgold, dwg, stats = self.fluid.step(
            wg, dwgold, dwg, nodal_force=f_nodes.astype(wg.dtype)
        )
        if self.ccfg.use_grid:
            from dedflow_tpu.dem.grid import dem_run_grid

            pstate = dem_run_grid(
                self.ccfg.dem, pstate, self.ccfg.substeps, ext=f_p
            )
        else:
            pstate = dem_run(
                self.ccfg.dem, pstate, self.ccfg.substeps, ext=f_p
            )
        return wg, dwgold, dwg, pstate, stats
