"""Packed component-major field-split BSR matrix in ELL row layout.

The 6x6 nodal blocks of the coupled system are structurally sparse: only
18 of 36 entries are ever nonzero - the velocity 3x3 coupling, the
velocity<->pressure gradients, the pressure stabilization, and the frozen
phi/T identity diagonals. This mirrors the reference's field-split
MatrixFS, which stores exactly the uu/up/pu/pp submatrices plus implicit
phi/T identities (matrix.h:93-103, main.c:381-404) - but as ONE packed
dense array instead of a vtable grid of CSR matrices.

TPU-first layout decisions (all measured on v5e):
- ELL-padded rows (SURVEY.md section 7, design delta 3): `data` is
  (N, PR, 18) where PR = max nonzeros per row; on tet meshes produced by
  the built-in generator PR = 15 with ~1.0x padding. SpMV then needs ONE
  row-gather of x plus dense multiply-reduce - no segment reduction, no
  scatter. XLA scatter/gather on TPU runs ~100x off the HBM roofline, so
  the layout exists to avoid them.
- The trailing component axis (18) keeps every array <= 3-D with small
  trailing dims grouped, away from the (8,128)-tile minor positions that
  inflate (nnz, 6, 6) layouts by up to 32x.
- Padding slots carry zero data and point `ell_col` at their own row, so
  every gather stays in range and contributes exactly zero.

Component order (axis 2):
    0..8   uu[i*3+j]   d y_u[i] / d x_u[j]
    9..11  up[i]       d y_u[i] / d x_p
    12..14 pu[j]       d y_p    / d x_u[j]
    15     pp
    16     phiphi
    17     TT
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np

NUM_COMP = 18
UU = lambda i, j: i * 3 + j
UP = lambda i: 9 + i
PU = lambda j: 12 + j
PP = 15
PHIPHI = 16
TT = 17

# (component, block-row, block-col) of each packed slot, for conversions.
COMP_SLOTS = (
    [(UU(i, j), i, j) for i in range(3) for j in range(3)]
    + [(UP(i), i, 3) for i in range(3)]
    + [(PU(j), 3, j) for j in range(3)]
    + [(PP, 3, 3), (PHIPHI, 4, 4), (TT, 5, 5)]
)

# solution component (0..5) whose equation each packed component lives in
COMP_ROW = np.array([bi for _, bi, _ in COMP_SLOTS])
# the 6 packed components on the block diagonal, by solution component
DIAG_COMPS = np.array([UU(0, 0), UU(1, 1), UU(2, 2), PP, PHIPHI, TT])


@jax.tree_util.register_dataclass
@dataclass
class FSBSRMatrix:
    """Field-split BSR, packed components, ELL-padded rows."""

    data: jnp.ndarray  # (N, PR, 18)
    ell_col: jnp.ndarray  # (N, PR) int32; pad slots = own row
    diag_slot: jnp.ndarray  # (N,) int32 slot of the diagonal entry

    @property
    def num_rows(self) -> int:
        return int(self.data.shape[0])

    @property
    def row_width(self) -> int:
        return int(self.data.shape[1])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, 6) -> (N, 6): one row-gather + dense multiply-reduce,
        replacing the reference's 4x4 grid of cuSPARSE SpMVs
        (MatrixFSAMVPBY, matrix.c:471-497)."""
        d = self.data
        xc = x[self.ell_col]  # (N, PR, 6)
        c = lambda k: d[..., k]
        yu = [
            jnp.sum(
                c(UU(i, 0)) * xc[..., 0]
                + c(UU(i, 1)) * xc[..., 1]
                + c(UU(i, 2)) * xc[..., 2]
                + c(UP(i)) * xc[..., 3],
                axis=1,
            )
            for i in range(3)
        ]
        yp = jnp.sum(
            c(PU(0)) * xc[..., 0]
            + c(PU(1)) * xc[..., 1]
            + c(PU(2)) * xc[..., 2]
            + c(PP) * xc[..., 3],
            axis=1,
        )
        yphi = jnp.sum(c(PHIPHI) * xc[..., 4], axis=1)
        yt = jnp.sum(c(TT) * xc[..., 5], axis=1)
        return jnp.stack(yu + [yp, yphi, yt], axis=-1)

    # ------------------------------------------------------------------
    def _diag(self, comp: int) -> jnp.ndarray:
        n = self.data.shape[0]
        return self.data[jnp.arange(n), self.diag_slot, comp]

    def diag_vel_blocks(self) -> jnp.ndarray:
        """(N, 3, 3) velocity diagonal blocks (PC setup; reference
        MatrixGetDiagBlock, matrix_impl.cu:642-693)."""
        n = self.data.shape[0]
        rows = self.data[jnp.arange(n), self.diag_slot]  # (N, 18)
        return rows[:, :9].reshape(n, 3, 3)

    def diag_p(self) -> jnp.ndarray:
        return self._diag(PP)

    # ------------------------------------------------------------------
    def zero_rows(self, row_mask: jnp.ndarray, unit_diag: bool = True) -> "FSBSRMatrix":
        """Zero constrained scalar rows + unit diagonal (reference
        MatrixZeroRow / DirichletApplyMat, dirichlet.c:47-61).

        row_mask: (N, 6) boolean; True = constrained (node, component).
        """
        dtype = self.data.dtype
        keep = 1.0 - row_mask.astype(dtype)  # (N, 6)
        keep_pc = keep[:, jnp.asarray(COMP_ROW)]  # (N, 18)
        data = self.data * keep_pc[:, None, :]
        if unit_diag:
            n = self.data.shape[0]
            add = row_mask.astype(dtype)  # (N, 6)
            data = data.at[
                jnp.arange(n)[:, None],
                self.diag_slot[:, None],
                jnp.asarray(DIAG_COMPS)[None, :],
            ].add(add)
        return FSBSRMatrix(data=data, ell_col=self.ell_col, diag_slot=self.diag_slot)

    # ------------------------------------------------------------------
    def to_block_dense(self) -> np.ndarray:
        """Debug/test helper: expand to dense (N*6, N*6)."""
        n = self.num_rows
        dense = np.zeros((n * 6, n * 6), dtype=np.asarray(self.data).dtype)
        cols = np.asarray(self.ell_col)
        d = np.asarray(self.data)
        rows = np.repeat(np.arange(n), self.row_width)
        cc = cols.reshape(-1)
        dd = d.reshape(-1, NUM_COMP)
        for comp, bi, bj in COMP_SLOTS:
            np.add.at(dense, (rows * 6 + bi, cc * 6 + bj), dd[:, comp])
        return dense


def pack_block_data(block_data: np.ndarray) -> np.ndarray:
    """(k, 6, 6) dense-block data -> packed (k, 18) (tests)."""
    d = np.asarray(block_data)
    return np.stack([d[:, bi, bj] for _, bi, bj in COMP_SLOTS], axis=-1)


@jax.tree_util.register_dataclass
@dataclass
class FSDIAMatrix:
    """Field-split BSR in DIAGONAL (DIA) storage: data (D, N, 18) where
    plane d holds the block coupling row r to column r + offsets[d]
    (plane-major: each plane is a contiguous (N, 18) slab, measured ~30%
    faster SpMV than row-major planes).

    Lattice-generated meshes with natural node ordering have a tiny fixed
    set of column offsets (15 for the Kuhn tet box), so SpMV needs ZERO
    gathers: x is padded once and every plane reads a static slice -
    the fastest possible TPU SpMV (auto-detected; unstructured meshes
    fall back to the ELL FSBSRMatrix). Same packed component order.
    """

    data: jnp.ndarray  # (D, N, 18)
    offsets: tuple = dataclass_field(metadata=dict(static=True))

    @property
    def num_rows(self) -> int:
        return int(self.data.shape[1])

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        n = self.data.shape[1]
        offs = self.offsets
        m = max(max(abs(o) for o in offs), 1)
        xpad = jnp.pad(x, ((m, m), (0, 0)))
        d = self.data
        yu0 = yu1 = yu2 = yp = yphi = yt = 0.0
        for k, o in enumerate(offs):
            xs = jax.lax.slice_in_dim(xpad, m + o, m + o + n, axis=0)  # (N, 6)
            c = lambda comp, k=k: d[k, :, comp]
            yu0 = yu0 + c(0) * xs[:, 0] + c(1) * xs[:, 1] + c(2) * xs[:, 2] + c(UP(0)) * xs[:, 3]
            yu1 = yu1 + c(3) * xs[:, 0] + c(4) * xs[:, 1] + c(5) * xs[:, 2] + c(UP(1)) * xs[:, 3]
            yu2 = yu2 + c(6) * xs[:, 0] + c(7) * xs[:, 1] + c(8) * xs[:, 2] + c(UP(2)) * xs[:, 3]
            yp = yp + c(PU(0)) * xs[:, 0] + c(PU(1)) * xs[:, 1] + c(PU(2)) * xs[:, 2] + c(PP) * xs[:, 3]
            yphi = yphi + c(PHIPHI) * xs[:, 4]
            yt = yt + c(TT) * xs[:, 5]
        return jnp.stack([yu0, yu1, yu2, yp, yphi, yt], axis=-1)

    # ------------------------------------------------------------------
    @property
    def _d0(self) -> int:
        return self.offsets.index(0)

    def _diag(self, comp: int) -> jnp.ndarray:
        return self.data[self._d0, :, comp]

    def diag_vel_blocks(self) -> jnp.ndarray:
        n = self.data.shape[1]
        return self.data[self._d0, :, :9].reshape(n, 3, 3)

    def diag_p(self) -> jnp.ndarray:
        return self._diag(PP)

    def zero_rows(self, row_mask: jnp.ndarray, unit_diag: bool = True) -> "FSDIAMatrix":
        dtype = self.data.dtype
        keep = 1.0 - row_mask.astype(dtype)
        keep_pc = keep[:, jnp.asarray(COMP_ROW)]  # (N, 18)
        data = self.data * keep_pc[None, :, :]
        if unit_diag:
            n = self.data.shape[1]
            add = row_mask.astype(dtype)
            data = data.at[
                self._d0,
                jnp.arange(n)[:, None],
                jnp.asarray(DIAG_COMPS)[None, :],
            ].add(add)
        return FSDIAMatrix(data=data, offsets=self.offsets)

    def to_block_dense(self) -> np.ndarray:
        n = self.num_rows
        dense = np.zeros((n * 6, n * 6))
        d = np.asarray(self.data)
        rows = np.arange(n)
        for k, o in enumerate(self.offsets):
            cols = rows + o
            ok = (cols >= 0) & (cols < n)
            for comp, bi, bj in COMP_SLOTS:
                np.add.at(
                    dense,
                    (rows[ok] * 6 + bi, cols[ok] * 6 + bj),
                    d[k, rows[ok], comp],
                )
        return dense
