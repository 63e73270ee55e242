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
    # use the dense grid-resident DEM path (dem.grid; ~10x faster on TPU
    # at 100k particles); requires uniform particle mass
    use_grid: bool = True


class CoupledSolver:
    """Staggered FEM-DEM solver: NS solver + DEM + drag exchange.

    With `device_mesh` the fluid subsystem runs domain-decomposed
    (parallel.sharded.ShardedNSSolver) and the coupling operates in the
    partitioned node ordering: particle location/interpolation use the
    partitioned mesh's context (identical physical coordinates, reordered
    nodes), so the nodal reaction force and the fluid state share one
    layout and no per-step reordering is needed. Padding elements are
    degenerate and excluded by dem.coupling.locate's det_j > 0 filter.
    The grid-resident DEM substep loop also shards (slab-major cell axis
    under GSPMD, halo bands via collective-permute); only the per-rebuild
    re-bucketing exchanges particles globally (dem.grid.dem_run_grid)."""

    def __init__(self, mesh: Mesh, cfg: SolverConfig, ccfg: CoupledConfig,
                 dtype=None, device_mesh=None):
        self.ccfg = ccfg
        self.sharded = device_mesh is not None
        self._dem_shard = None
        if self.sharded:
            from dedflow_tpu.parallel.sharded import ShardedNSSolver

            self.fluid = ShardedNSSolver(mesh, cfg, device_mesh, dtype=dtype)
            if ccfg.use_grid:
                self._dem_shard = (
                    self.fluid.device_mesh, self.fluid.axis
                )
            # the coupling needs the unstructured FEMContext (xg/ien/
            # inv_j) - the sharded solver's solve context may be the
            # LatticeContext on lattice meshes; NSSolver always builds the
            # FEMContext and its node order matches the sharded state's
            self._coupling_ctx = self.fluid.solver.ctx
            cmesh = self.fluid.pmesh
        else:
            self.fluid = NSSolver(mesh, cfg, dtype=dtype)
            self._coupling_ctx = self.fluid.ctx
            cmesh = mesh
        self._lattice = cmesh.lattice
        if self._lattice is not None:
            # closed-form cell lookup on box meshes: no element grid and
            # ~100x fewer candidate gathers (dem.coupling.locate_lattice)
            lo = np.asarray(cmesh.xg).min(axis=0)
            hi = np.asarray(cmesh.xg).max(axis=0)
            self._lat_origin = lo
            self._lat_spacing = (hi - lo) / np.asarray(self._lattice, float)
            self.grid = None
        else:
            self.grid = coupling.element_grid(cmesh.xg, cmesh.ien)

    def step(self, wg, dwgold, dwg, pstate: ParticleState,
             num_newton: int | None = None):
        """One coupled step; returns (wg, dwgold, dwg, pstate, stats).
        Fluid state arrays are in the solver's native layout (sharded
        partitioned order when device_mesh was given).

        With `num_newton` the fluid advances via `step_fixed` - a single
        jitted call with a fixed Newton count and ZERO host syncs (the
        adaptive default fetches per-iteration residual norms, which
        costs several device round-trips per step; stats is then None).
        This mirrors the reference's fixed maxit=4 production loop
        (main.c:86-89)."""
        if self._lattice is not None:
            f_p, f_nodes = coupling.drag_exchange_lattice(
                self._lattice, self._lat_origin, self._lat_spacing,
                self._coupling_ctx, pstate, wg, self.ccfg.drag_mu,
            )
        else:
            f_p, f_nodes = coupling.drag_exchange(
                self.grid, self._coupling_ctx, pstate, wg, self.ccfg.drag_mu
            )
        if num_newton is not None:
            wg, dwgold, dwg = self.fluid.step_fixed(
                wg, dwgold, dwg, num_newton=num_newton,
                nodal_force=f_nodes.astype(wg.dtype),
            )
            stats = None
        else:
            out = self.fluid.step(
                wg, dwgold, dwg, nodal_force=f_nodes.astype(wg.dtype)
            )
            wg, dwgold, dwg = out[:3]
            stats = out[3] if len(out) > 3 else None
        if self.ccfg.use_grid:
            from dedflow_tpu.dem.grid import dem_run_grid

            pstate = dem_run_grid(
                self.ccfg.dem, pstate, self.ccfg.substeps, ext=f_p,
                shard=self._dem_shard,
            )
        else:
            pstate = dem_run(
                self.ccfg.dem, pstate, self.ccfg.substeps, ext=f_p
            )
        return wg, dwgold, dwg, pstate, stats
