"""dedflow_tpu: a TPU-native FEM-DEM framework for additive manufacturing.

A from-scratch rebuild of the capabilities of the CUDA reference solver
DEDFlow (zexxzhao/DEDFlow) as an idiomatic JAX/XLA/Pallas package:

- VMS/SUPG-stabilized incompressible Navier-Stokes + level-set (phi) +
  temperature (T), 6 DOF per node, on unstructured tetrahedral meshes
  (reference: src/assemble.cu, src/main.c).
- Generalized-alpha time stepping + Newton linearization + GMRES on a
  6x6-block BSR Jacobian with field-split block-Jacobi preconditioning
  (reference: src/main.c:77-283, src/krylov.c, src/pc.c).
- Coloring-free element assembly: deterministic scatter-add replaces the
  reference's Jones-Plassmann-Luby graph coloring (src/color_impl.cu).
- DEM particle subsystem with cell-list contact (the reference's Particle.c
  is a data skeleton only; dynamics here are first-class).
- Multi-chip execution via jax.sharding / shard_map + collectives instead of
  the reference's (absent) MPI layer.

Layout convention: solver state is a (num_node, 6) array with columns
[u0, u1, u2, p, phi, T]. HDF5 I/O converts to/from the reference's flat
layout ([3N interleaved velocity | p | phi | T], SURVEY.md section 3.5).
"""

__version__ = "0.1.0"

from dedflow_tpu.utils import dtypes  # noqa: F401
