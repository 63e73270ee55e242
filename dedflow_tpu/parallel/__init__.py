"""Multi-chip execution: mesh partitioning + sharded solvers.

The reference has no distributed backend at all (SURVEY.md section 2,
parallelism inventory): its METIS partitioner is dead code (partition.c:16,
Mesh.c:147-153) and there is no MPI/NCCL anywhere. Here domain
decomposition is first-class and TPU-native: recursive coordinate
bisection orders nodes and elements into spatially compact, equally sized
contiguous chunks, `jax.sharding.NamedSharding` lays those chunks out over
a device mesh, and XLA/GSPMD inserts the halo-exchange collectives for the
gather/segment-sum assembly pattern. Domain decomposition over the mesh is
this framework's data parallelism; the node axis is its sequence axis.
"""

from dedflow_tpu.parallel.partition import partition_mesh, rcb_parts
from dedflow_tpu.parallel.sharded import ShardedNSSolver
