"""DEM particle subsystem: cell-list contacts + explicit integration.

The reference's Particle.c is a data skeleton only: ParticleContext holds
coord/vel/acc arrays with hard-coded mass=1.0 and radius=0.1
(Particle.c:12-25), its Add/Update/Remove methods are empty no-ops
(Particle.c:120-130), and the driver's `SolveParticleSystem` call site
(main.c:555) references a function defined nowhere. The dynamics here are
therefore specified by BASELINE.json configs #4-5 (powder-bed settling
with cell-list contacts; coupled FEM-DEM), built TPU-first:

- static-shape cell lists (sort by cell id + fixed-capacity buckets),
- vectorized spring-dashpot contact over padded neighbor candidates,
- explicit symplectic integration under `lax.scan`,
- fluid coupling by point-in-tet location + P1 interpolation and
  barycentric-weighted reaction scatter.
"""

from dedflow_tpu.dem.particles import ParticleState, particle_state
from dedflow_tpu.dem.contact import ContactParams
from dedflow_tpu.dem.integrate import DEMConfig, dem_step, dem_run
