from dedflow_tpu.io.h5 import (
    read_mesh_h5,
    write_mesh_h5,
    read_solution_h5,
    write_solution_h5,
)

__all__ = [
    "read_mesh_h5",
    "write_mesh_h5",
    "read_solution_h5",
    "write_solution_h5",
]
