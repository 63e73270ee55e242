"""Assembly machinery: precomputed geometry + deterministic scatter plans.

TPU-native replacement for the reference's color-batched assembly loop
(AssembleSystemTet, assemble.cu:1467-1762). Design deltas (SURVEY.md 7):

- No coloring: element contributions are reduced with sorted segment-sums,
  which are deterministic and race-free; the whole JPL coloring subsystem
  (color_impl.cu) has no counterpart here.
- Geometry hoisting: inv(J), detJ, shape gradients and the metric G are
  constants of the mesh, computed once at setup instead of per color batch
  per assembly call (GetElemInvJ3D + GetShapeGradKernel + DgemmStridedBatched,
  assemble.cu:1578-1593).
- Scatter targets (element pair -> nnz) are precomputed on the host
  (sparse.topology), replacing the per-entry linear column search
  (matrix_impl.cu:103-107); the scatter itself is a segment_sum over a
  presorted permutation (indices_are_sorted=True).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.fem.element import tet_geometry
from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.sparse.bsr import BSRMatrix
from dedflow_tpu.sparse.topology import Sparsity, build_sparsity, scatter_permutation


@jax.tree_util.register_dataclass
@dataclass
class FEMContext:
    """Device-resident mesh tables, precomputed geometry, scatter plans."""

    # topology
    ien: jnp.ndarray  # (ne, 4) int32
    xg: jnp.ndarray  # (N, 3)
    # hoisted geometry (constant while the mesh does not move)
    shgrad: jnp.ndarray  # (ne, 4, 3)
    det_j: jnp.ndarray  # (ne,)
    metric: jnp.ndarray  # (ne, 3, 3)  G = inv(J) inv(J)^T
    inv_j: jnp.ndarray  # (ne, 3, 3)
    # residual scatter plan: sorted (element,node-slot) -> node
    node_perm: jnp.ndarray  # (ne*4,) int32
    node_targets: jnp.ndarray  # (ne*4,) int32, non-decreasing
    # matrix scatter plan: sorted (element,a,b) -> nnz
    mat_perm: jnp.ndarray  # (ne*16,) int32
    mat_targets: jnp.ndarray  # (ne*16,) int32, non-decreasing
    # BSR topology
    col_ind: jnp.ndarray  # (nnz,)
    row_ids: jnp.ndarray  # (nnz,)
    diag_idx: jnp.ndarray  # (N,)
    num_node: int = field(metadata=dict(static=True))
    num_elem: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))


def build_context(mesh: Mesh, sparsity: Sparsity | None = None, dtype=None) -> FEMContext:
    if sparsity is None:
        sparsity = build_sparsity(mesh.ien, mesh.num_node)
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # default float of current x64 mode
    xg = jnp.asarray(mesh.xg, dtype=dtype)
    ien = jnp.asarray(mesh.ien)
    geom = tet_geometry(xg[ien])
    node_perm_np, node_targets_np = _sorted_plan(np.asarray(mesh.ien).ravel())
    mat_perm_np, mat_targets_np = scatter_permutation(sparsity.elem_nnz)
    return FEMContext(
        ien=ien,
        xg=xg,
        shgrad=geom.shgrad,
        det_j=geom.det_j,
        metric=geom.metric,
        inv_j=geom.inv_j,
        node_perm=jnp.asarray(node_perm_np),
        node_targets=jnp.asarray(node_targets_np),
        mat_perm=jnp.asarray(mat_perm_np),
        mat_targets=jnp.asarray(mat_targets_np),
        col_ind=jnp.asarray(sparsity.col_ind),
        row_ids=jnp.asarray(sparsity.row_ids),
        diag_idx=jnp.asarray(sparsity.diag_idx),
        num_node=mesh.num_node,
        num_elem=mesh.num_tet,
        nnz=sparsity.nnz,
    )


def _sorted_plan(targets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    perm = np.argsort(targets, kind="stable").astype(np.int32)
    return perm, targets[perm].astype(np.int32)


def scatter_residual(ctx: FEMContext, elem_f: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, ...) element vectors -> (N, ...) nodal sums.

    Replaces ElemRHSLocal2GlobalKernel (assemble.cu:188-208), whose
    correctness relied on the color batching; here the reduction is a
    deterministic sorted segment-sum.
    """
    flat = elem_f.reshape((ctx.num_elem * 4,) + elem_f.shape[2:])
    return jax.ops.segment_sum(
        flat[ctx.node_perm],
        ctx.node_targets,
        num_segments=ctx.num_node,
        indices_are_sorted=True,
    )


def scatter_matrix(ctx: FEMContext, elem_j: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, 4, br, bc) element matrices -> (nnz, br, bc) BSR data.

    Replaces MatrixAddElemValueBlockedBatched + SetBlockValueToSubmatGPU
    (matrix_impl.cu:88-202, 370-453).
    """
    br, bc = elem_j.shape[-2:]
    flat = elem_j.reshape(ctx.num_elem * 16, br, bc)
    return jax.ops.segment_sum(
        flat[ctx.mat_perm],
        ctx.mat_targets,
        num_segments=ctx.nnz,
        indices_are_sorted=True,
    )


def bsr_from_data(ctx: FEMContext, data: jnp.ndarray) -> BSRMatrix:
    return BSRMatrix(
        data=data, col_ind=ctx.col_ind, row_ids=ctx.row_ids, diag_idx=ctx.diag_idx
    )


def gather_nodal(ctx: FEMContext, x: jnp.ndarray) -> jnp.ndarray:
    """(N, ...) nodal values -> (ne, 4, ...) element gathers
    (LoadElementValueKernel, assemble.cu:135-154)."""
    return x[ctx.ien]
