"""Block-sparse-row (BSR) matrix as a JAX pytree.

TPU-native replacement for the reference's Matrix vtable with its
MatrixCSR (cuSPARSE SpMV) and MatrixFS (grid of per-field CSR submatrices,
matrix.h:75-103): a single nodal-pattern BSR with uniform (br, bc) blocks
holds the whole field-split operator - the 6x6 node blocks *are* the field
split, and sub-blocks (velocity 3x3, pressure 1x1, ...) are views for the
preconditioner rather than separate matrices (SURVEY.md section 7,
design delta 2).

SpMV = gather(x by col_ind) -> batched block matvec (einsum) ->
row-segment-sum, all fused by XLA; `row_ids` is non-decreasing by
construction so the reduction uses `indices_are_sorted=True`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.sparse.topology import Sparsity


@jax.tree_util.register_dataclass
@dataclass
class BSRMatrix:
    """BSR with uniform blocks. data (nnz, br, bc); topology arrays int32."""

    data: jnp.ndarray
    col_ind: jnp.ndarray  # (nnz,)
    row_ids: jnp.ndarray  # (nnz,) row of each block, non-decreasing
    diag_idx: jnp.ndarray  # (num_rows,) nnz index of each diagonal block

    @property
    def nnz(self) -> int:
        return int(self.data.shape[0])

    @property
    def block_shape(self) -> tuple[int, int]:
        return (int(self.data.shape[1]), int(self.data.shape[2]))

    @property
    def num_rows(self) -> int:
        return int(self.diag_idx.shape[0])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """y[r] = sum_nz A[nz] @ x[col[nz]].  x: (num_rows, bc) -> (num_rows, br)."""
        xg = x[self.col_ind]  # (nnz, bc)
        prod = jnp.einsum("nij,nj->ni", self.data, xg)
        return jax.ops.segment_sum(
            prod, self.row_ids, num_segments=self.num_rows, indices_are_sorted=True
        )

    def diag_blocks(self) -> jnp.ndarray:
        """(num_rows, br, bc) diagonal blocks (reference MatrixGetDiagBlock,
        matrix_impl.cu:642-693)."""
        return self.data[self.diag_idx]

    def zero(self) -> "BSRMatrix":
        return BSRMatrix(
            data=jnp.zeros_like(self.data),
            col_ind=self.col_ind,
            row_ids=self.row_ids,
            diag_idx=self.diag_idx,
        )

    def zero_rows(self, row_mask_bc: jnp.ndarray, unit_diag: bool = True) -> "BSRMatrix":
        """Zero the scalar rows selected by row_mask_bc and put 1.0 on their
        diagonal (reference MatrixZeroRow with diag=1.0, used by
        DirichletApplyMat, dirichlet.c:47-61; matrix_impl.cu:6-23).

        row_mask_bc: (num_rows, br) boolean - True where the scalar row
        (node, component) is constrained.
        """
        keep = 1.0 - row_mask_bc[self.row_ids].astype(self.data.dtype)  # (nnz, br)
        data = self.data * keep[:, :, None]
        if unit_diag:
            br = self.block_shape[0]
            eye = jnp.eye(br, self.block_shape[1], dtype=self.data.dtype)
            add = row_mask_bc.astype(self.data.dtype)[:, :, None] * eye[None]
            data = data.at[self.diag_idx].add(add)
        return BSRMatrix(
            data=data,
            col_ind=self.col_ind,
            row_ids=self.row_ids,
            diag_idx=self.diag_idx,
        )


def bsr_zeros(sp: Sparsity, br: int, bc: int, dtype) -> BSRMatrix:
    return BSRMatrix(
        data=jnp.zeros((sp.nnz, br, bc), dtype=dtype),
        col_ind=jnp.asarray(sp.col_ind),
        row_ids=jnp.asarray(sp.row_ids),
        diag_idx=jnp.asarray(sp.diag_idx),
    )


def bsr_to_dense(mat: BSRMatrix) -> np.ndarray:
    """Debug/test helper: expand to a dense (N*br, N*bc) array."""
    n = mat.num_rows
    br, bc = mat.block_shape
    dense = np.zeros((n * br, n * bc), dtype=np.asarray(mat.data).dtype)
    rows = np.asarray(mat.row_ids)
    cols = np.asarray(mat.col_ind)
    data = np.asarray(mat.data)
    for k in range(rows.shape[0]):
        r, c = rows[k], cols[k]
        dense[r * br : (r + 1) * br, c * bc : (c + 1) * bc] += data[k]
    return dense
