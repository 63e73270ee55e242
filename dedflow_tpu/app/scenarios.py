"""Canonical simulation scenarios.

`reference_scenario` reproduces the reference driver's setup (main.c):
initial condition MyFieldInit (main.c:286-321) - u=(1,0,0), p=0, phi=x,
T=-x - and the BC layout of main.c:454-477 on a generated box mesh whose
boundary indices are mapped onto the box sides:

  reference bound 0 (strong u all comps) -> x- (inflow)
  reference bound 1 (no BCs: do-nothing) -> x+ (outflow)
  reference bound 2 (strong u_y)         -> y-/y+ (slip)
  reference bound 3 (strong u_z)         -> z-    (slip)
  reference bound 4 (weak/Nitsche)       -> z+

(The reference's box.h5 boundary numbering comes from gmsh physical tags
we do not possess; the mapping above preserves the physical roles.)
"""

from __future__ import annotations

import numpy as np

from dedflow_tpu.config import BCSpec, Laser, Physics, SolverConfig, TimeScheme
from dedflow_tpu.mesh.mesh import Mesh


def reference_initial_state(mesh: Mesh) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(wgold, dwgold, dwg) per MyFieldInit + main.c:504-519.

    Note the reference computes a smoothed level-set step `h` but does not
    use it (main.c:306-316): phi = x and T = -x are what is stored.
    Pressure starts at 0 in the dwg slot (main.c:519).
    """
    n = mesh.num_node
    wg = np.zeros((n, 6))
    wg[:, 0] = 1.0  # u = (1, 0, 0) (main.c:301-303)
    wg[:, 4] = mesh.xg[:, 0]  # phi = x (main.c:318)
    wg[:, 5] = -mesh.xg[:, 0]  # T = -x (main.c:319)
    dwgold = np.zeros((n, 6))
    dwg = np.zeros((n, 6))  # dwg pressure = buffer p = 0 (main.c:519)
    return wg, dwgold, dwg


def box_channel_bcs() -> tuple[BCSpec, ...]:
    """Reference BC roles on box side order [x-, x+, y-, y+, z-, z+].

    x+ deliberately carries NO boundary condition (do-nothing outflow,
    the role of the reference's boundary 1, which receives neither strong
    flags nor face assembly): the missing natural-BC face term there is
    what pins the pressure level - with every boundary constrained the
    Jacobian has an exact constant-pressure null mode.
    """
    return (
        BCSpec(boundary=0, strong_components=(0, 1, 2)),  # inflow (ref bound 0)
        BCSpec(boundary=2, strong_components=(1,)),  # y- slip (ref bound 2)
        BCSpec(boundary=3, strong_components=(1,)),  # y+ slip
        BCSpec(boundary=4, strong_components=(2,)),  # z- slip (ref bound 3)
        BCSpec(boundary=5, strong_components=(), weak=True),  # z+ weak (ref 4)
    )


def reference_scenario_config(**overrides) -> SolverConfig:
    cfg = SolverConfig(bcs=box_channel_bcs())
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


# ---------------------------------------------------------------------------
# Lid-driven cavity (BASELINE config #2): transient stabilized NS in a
# closed box, top (z+) lid moving with u = (1, 0, 0), all other walls
# no-slip. The classic incompressible benchmark; no analogue exists in
# the reference driver.


def lid_driven_cavity_bcs() -> tuple[BCSpec, ...]:
    """Box side order [x-, x+, y-, y+, z-, z+]: no-slip everywhere except
    the moving z+ lid, which fixes all velocity components (the lid value
    itself comes from the initial condition - the Dirichlet machinery
    preserves whatever the constrained rows hold, dirichlet.py)."""
    return tuple(
        BCSpec(boundary=b, strong_components=(0, 1, 2)) for b in range(6)
    )


def lid_driven_cavity_config(**overrides) -> SolverConfig:
    cfg = SolverConfig(
        physics=Physics(rho=1.0, mu=1.0e-2),  # Re = 100 cavity
        time=TimeScheme(dt=5e-2),
        bcs=lid_driven_cavity_bcs(),
        pin_pressure=True,  # enclosed flow: constant-pressure null mode
    )
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def lid_driven_cavity_initial_state(mesh: Mesh):
    """u = (1,0,0) on the lid interior, zero elsewhere.

    The lid's rim nodes (shared with the side walls) stay at zero so the
    constrained velocity field is continuous."""
    n = mesh.num_node
    wg = np.zeros((n, 6))
    lid = mesh.boundaries[5].nodes
    rim = np.unique(
        np.concatenate([mesh.boundaries[b].nodes for b in range(5)])
    )
    interior_lid = np.setdiff1d(lid, rim)
    wg[interior_lid, 0] = 1.0
    return wg, np.zeros((n, 6)), np.zeros((n, 6))


# ---------------------------------------------------------------------------
# Moving-laser melt-pool scenario (BASELINE config #3). The reference has
# no heat source and freezes its T equation (main.c:64); this scenario
# activates the full thermal-fluid coupling with consistent scalar
# tangents (config.SolverConfig.implicit_scalars).


def laser_source(laser: Laser, xg: np.ndarray, t: float) -> np.ndarray:
    """(N,) nodal volumetric heat source q(x, t); integrates to power."""
    c = np.asarray(laser.start) + np.asarray(laser.velocity) * t
    r2 = ((np.asarray(xg) - c) ** 2).sum(axis=1)
    q0 = laser.power * (2.0 / np.pi) ** 1.5 / laser.radius**3
    return q0 * np.exp(-2.0 * r2 / laser.radius**2)


def melt_pool_scenario_config(**overrides) -> SolverConfig:
    """Single-track DED: laser scanning +x across the top (z+) face of a
    box, thermal-fluid fully active, slow time stepping."""
    laser = Laser(
        power=50.0, radius=0.15, velocity=(0.5, 0.0, 0.0), start=(0.1, 0.5, 1.0)
    )
    cfg = SolverConfig(
        physics=Physics(laser=laser),
        time=TimeScheme(dt=2e-2),
        bcs=box_channel_bcs(),
        freeze_phi_temperature=False,
        implicit_scalars=True,
    )
    if overrides:
        import dataclasses

        cfg = dataclasses.replace(cfg, **overrides)
    return cfg


def melt_pool_initial_state(mesh: Mesh):
    """u = 0, p = 0, phi = z - 0.5 (melt interface), T = 0."""
    n = mesh.num_node
    wg = np.zeros((n, 6))
    wg[:, 4] = mesh.xg[:, 2] - 0.5
    return wg, np.zeros((n, 6)), np.zeros((n, 6))


# ---------------------------------------------------------------------------
# Coupled FEM-DEM powder settling (BASELINE config #5): particles released
# in the upper region of the fluid box, two-way Stokes-drag coupled.
# The reference only references a particle solve (SolveParticleSystem,
# main.c:555, defined nowhere); the capability comes from BASELINE.md.


def coupled_scenario_setup(
    mesh: Mesh,
    num_particles: int = 1000,
    radius: float | None = None,
    substeps: int = 10,
    use_grid: bool = True,
    drag_mu: float = 1.0e-3,
    seed: int = 0,
):
    """(CoupledConfig, ParticleState) for a powder-settling cloud in the
    top half of the mesh bounding box."""
    from dedflow_tpu.app.coupled import CoupledConfig
    from dedflow_tpu.dem.cells import make_grid
    from dedflow_tpu.dem.integrate import DEMConfig
    from dedflow_tpu.dem.particles import particle_state

    lo = np.asarray(mesh.xg).min(axis=0)
    hi = np.asarray(mesh.xg).max(axis=0)
    ext = hi - lo
    if radius is None:
        # ~5% solids fraction in the release volume
        vol = float(np.prod(ext)) * 0.5
        radius = (0.05 * vol / max(num_particles, 1) * 3.0 / (4.0 * np.pi)) ** (
            1.0 / 3.0
        )
    rng = np.random.RandomState(seed)
    margin = 2.0 * radius
    x_lo = lo + margin
    x_hi = hi - margin
    x_lo[2] = lo[2] + 0.5 * ext[2]  # top half
    x = rng.uniform(x_lo, x_hi, size=(num_particles, 3))
    pstate = particle_state(x, radius=radius, mass=1.0)
    grid = make_grid(lo, hi, cell_size=2.5 * radius, capacity=8)
    dem = DEMConfig(
        grid=grid,
        dt=1.0e-4,
        walls_lo=tuple(lo),
        walls_hi=tuple(hi),
        linear_drag=6.0 * np.pi * drag_mu * radius,
    )
    ccfg = CoupledConfig(
        dem=dem, drag_mu=drag_mu, substeps=substeps, use_grid=use_grid
    )
    return ccfg, pstate
