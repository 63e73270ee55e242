from dedflow_tpu.mesh.mesh import Boundary, Mesh
from dedflow_tpu.mesh.gen import box_mesh, single_tet_mesh

__all__ = ["Boundary", "Mesh", "box_mesh", "single_tet_mesh"]
