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
        from dedflow_tpu.utils.xla import take_rows

        d = self.data
        xc = take_rows(x, self.ell_col)  # (N, PR, 6)
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

    # -- component-restricted matvecs (SIMPLE/Schur PC, solver.pc) -----
    def matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) pressure -> (N, 3) velocity rows: the A_up block only."""
        from dedflow_tpu.utils.xla import take_rows

        pc_ = take_rows(p, self.ell_col)  # (N, PR)
        d = self.data
        return jnp.stack(
            [jnp.sum(d[..., UP(i)] * pc_, axis=1) for i in range(3)], axis=-1
        )

    def matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        """(N, 3) velocity -> (N,) pressure row: the A_pu block only."""
        from dedflow_tpu.utils.xla import take_rows

        uc = take_rows(u, self.ell_col)  # (N, PR, 3)
        d = self.data
        return jnp.sum(
            d[..., PU(0)] * uc[..., 0]
            + d[..., PU(1)] * uc[..., 1]
            + d[..., PU(2)] * uc[..., 2],
            axis=1,
        )

    def matvec_pp(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) -> (N,): the A_pp block only."""
        from dedflow_tpu.utils.xla import take_rows

        return jnp.sum(self.data[..., PP] * take_rows(p, self.ell_col), axis=1)

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


def keep_pc_rows(mask_t: jnp.ndarray, dtype) -> jnp.ndarray:
    """(18, N) per-packed-component row-keep factors from a (6, N) mask."""
    keep = 1.0 - mask_t.astype(dtype)
    return jnp.concatenate(
        [keep[bi : bi + 1] for _, bi, _ in COMP_SLOTS], axis=0
    )


def diag_add_rows(mask_t: jnp.ndarray, dtype) -> jnp.ndarray:
    """(18, N) unit-diagonal additions (nonzero only on the 6 diagonal
    packed components) from a (6, N) mask; static row construction."""
    add = mask_t.astype(dtype)  # (6, N)
    diag_of = {int(c): i for i, c in enumerate(DIAG_COMPS)}
    zero = jnp.zeros_like(add[0:1])
    rows = [
        add[diag_of[comp] : diag_of[comp] + 1] if comp in diag_of else zero
        for comp in range(NUM_COMP)
    ]
    return jnp.concatenate(rows, axis=0)


def pad_scal_rows(scal: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the scalar-plane rows (2*D) up to a multiple of 8.

    The Pallas SpMV DMAs the scal block per grid step, and Mosaic
    requires sublane-dim slices to be 8-aligned; padding ONCE at matrix
    construction beats the kernel wrapper re-padding the full (2*D, N)
    array on every matvec (a ~250 MB HBM copy at 1M tets, measured
    +0.5 ms/matvec). Consumers read the logical rows via `_s`."""
    r = scal.shape[0]
    rp = -(-r // 8) * 8
    if rp == r:
        return scal
    return jnp.pad(scal, ((0, rp - r), (0, 0)))


@jax.tree_util.register_dataclass
@dataclass
class FSDIAMatrixT:
    """Component-major DIA field-split matrix: data (D, 16, N) holding
    the velocity/pressure packed components (UU, UP, PU, PP) with the
    node axis on LANES (minor dim), plus scal (2*D, N) holding the two
    scalar diagonal components (row 2k = phi-phi of plane k, row 2k+1 =
    T-T) — the TPU-native layout.

    Rationale (measured on v5e): XLA fuses static shifted lane-slices at
    ~2.4 TB/s effective, while any gather runs at 4-50 GB/s; with
    component rows on sublanes and N on lanes, the SpMV, the row masking,
    the diagonal extraction, and the PC apply are all pure dense row ops
    over (.., N) arrays. Vectors travel as (6, N) (component-major), the
    transpose of the (N, 6) state layout used at the API boundary.

    The 16/2 split is layout-driven: XLA's default layout for
    (D, 18, N) is {2,0,1} (it minimizes the 18->24 sublane tile pad),
    which conflicts with the Pallas SpMV kernel's {2,1,0} operand
    constraint and forced a ~190 MB relayout copy per matvec. With 16
    sublane rows (no tile pad) the default IS {2,1,0}, the custom call
    consumes the assembly output in place, and the two scalar rows ride
    a 2*D-row XLA pass.

    Same packed component order as FSBSRMatrix; replaces the reference's
    4x4 cuSPARSE submatrix grid (matrix.h:93-103) on lattice meshes.
    """

    data: jnp.ndarray  # (D, 16, W) with W >= num_node (see below)
    scal: jnp.ndarray  # (2*D, W) phi-phi / T-T rows per plane
    offsets: tuple = dataclass_field(metadata=dict(static=True))
    # "pallas" = fused halo-window TPU SpMV (sparse.dia_kernels, f32);
    # "xla" = shifted-slice formulation (any dtype / any backend).
    backend: str = dataclass_field(default="xla", metadata=dict(static=True))
    # (jax.sharding.Mesh, axis): run the Pallas SpMV per-shard under
    # shard_map with 2-ppermute boundary bands (parallel execution of the
    # fused kernel; see fem.lattice sharded path)
    shard: tuple | None = dataclass_field(
        default=None, metadata=dict(static=True)
    )
    # Logical row-block count N when data carries LANE-ALIGNED padding
    # (width W = 128-multiple >= N, straight off the fused assembly
    # kernel). Keeping the pad avoids a ~190 MB relayout/pad of the
    # matrix per matvec (the Pallas SpMV constrains operand layouts);
    # pad columns may hold garbage/NaN - every consumer below reads
    # data[..., :N], which fuses as an offset read (free), and the SpMV
    # kernel's pad lanes are annihilated by x's zero tail before the
    # [:, :N] output slice. None = data width is exact.
    num_node: int | None = dataclass_field(
        default=None, metadata=dict(static=True)
    )

    @property
    def num_rows(self) -> int:
        return int(self.num_node or self.data.shape[2])

    @property
    def _d(self) -> jnp.ndarray:
        """data narrowed to the logical width (a fusible read-slice)."""
        if self.num_node is None or self.num_node == self.data.shape[2]:
            return self.data
        return self.data[..., : self.num_node]

    @property
    def _s(self) -> jnp.ndarray:
        """scal narrowed to the logical rows (2*D; constructors store it
        sublane-padded, see pad_scal_rows) and width."""
        s = self.scal[: 2 * self.data.shape[0]]
        if self.num_node is None or self.num_node == s.shape[1]:
            return s
        return s[..., : self.num_node]

    def matvec_t(self, x_t: jnp.ndarray) -> jnp.ndarray:
        """(6, N) -> (6, N): gather-free SpMV."""
        if self.backend == "pallas" and self.shard is not None:
            from dedflow_tpu.sparse.dia_kernels import dia_matvec_pallas_shmap

            return dia_matvec_pallas_shmap(
                self.data, self.scal, x_t, self.offsets, self.shard
            ).astype(x_t.dtype)
        if self.backend == "pallas":
            from dedflow_tpu.sparse.dia_kernels import dia_matvec_pallas

            return dia_matvec_pallas(
                self.data, self.scal, x_t, self.offsets
            ).astype(x_t.dtype)
        d = self._d
        s = self._s
        n = d.shape[2]
        offs = self.offsets
        m = max(max(abs(o) for o in offs), 1)
        xpad = jnp.pad(x_t, ((0, 0), (m, m)))
        # (D, 6, N) shifted copies of x, then plane-axis reductions: the
        # measured-fastest pure-XLA formulation (sum over the leading axis
        # vectorizes; one mega-fusion of 15 shifted streams does not).
        xs = jnp.stack(
            [jax.lax.slice_in_dim(xpad, m + o, m + o + n, axis=1) for o in offs]
        )
        y = [
            jnp.sum(
                d[:, UU(i, 0)] * xs[:, 0]
                + d[:, UU(i, 1)] * xs[:, 1]
                + d[:, UU(i, 2)] * xs[:, 2]
                + d[:, UP(i)] * xs[:, 3],
                axis=0,
            )
            for i in range(3)
        ]
        y.append(
            jnp.sum(
                d[:, PU(0)] * xs[:, 0]
                + d[:, PU(1)] * xs[:, 1]
                + d[:, PU(2)] * xs[:, 2]
                + d[:, PP] * xs[:, 3],
                axis=0,
            )
        )
        nd = len(offs)
        sc = s.reshape(nd, 2, n)
        y.append(jnp.sum(sc[:, 0] * xs[:, 4], axis=0))
        y.append(jnp.sum(sc[:, 1] * xs[:, 5], axis=0))
        return jnp.stack(y)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, 6) -> (N, 6) compatibility wrapper (two small transposes)."""
        return self.matvec_t(x.T).T

    # -- component-restricted matvecs (SIMPLE/Schur PC, solver.pc) -----
    def _xs_stack(self, x: jnp.ndarray) -> jnp.ndarray:
        """(k, N) rows -> (D, k, N) stack of offset-shifted copies."""
        n = x.shape[1]
        m = max(max(abs(o) for o in self.offsets), 1)
        xpad = jnp.pad(x, ((0, 0), (m, m)))
        return jnp.stack(
            [
                jax.lax.slice_in_dim(xpad, m + o, m + o + n, axis=1)
                for o in self.offsets
            ]
        )

    def matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) pressure -> (3, N) velocity rows: the A_up block only."""
        ps = self._xs_stack(p[None, :])[:, 0]  # (D, N)
        d = self._d
        return jnp.stack(
            [jnp.sum(d[:, UP(i)] * ps, axis=0) for i in range(3)]
        )

    def matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        """(3, N) velocity -> (N,) pressure row: the A_pu block only."""
        us = self._xs_stack(u)  # (D, 3, N)
        d = self._d
        return jnp.sum(
            d[:, PU(0)] * us[:, 0]
            + d[:, PU(1)] * us[:, 1]
            + d[:, PU(2)] * us[:, 2],
            axis=0,
        )

    def matvec_pp(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) -> (N,): the A_pp block only."""
        ps = self._xs_stack(p[None, :])[:, 0]
        return jnp.sum(self._d[:, PP] * ps, axis=0)

    # ------------------------------------------------------------------
    @property
    def _d0(self) -> int:
        return self.offsets.index(0)

    def diag_rows(self) -> jnp.ndarray:
        """(18, N) packed diagonal-block rows (PC setup)."""
        d0 = self._d0
        return jnp.concatenate(
            [self._d[d0], self._s[2 * d0 : 2 * d0 + 2]], axis=0
        )

    def schur_bands(self) -> "SchurBandsT":
        """Extract the compact pressure-Schur operator bands once.

        The SIMPLE-type PCs apply A_pp / A_pu / A_up every GMRES
        iteration; reading them as slices of the full (D, 16, N) array
        makes XLA relayout-copy the whole matrix ({2,1,0} -> {2,0,1},
        ~170 MB) inside EVERY PC application - measured 11.5 ms/apply vs
        2.5 ms for the same math on compact arrays at 1M tets. Extracting
        the seven component planes once at PC setup pays that read a
        single time."""
        d = self._d
        return SchurBandsT(
            app=d[:, PP, :],
            apu=jnp.stack([d[:, PU(i), :] for i in range(3)], axis=1),
            aup=jnp.stack([d[:, UP(i), :] for i in range(3)], axis=1),
            offsets=self.offsets,
        )

    def schur_diag(self, duinv_rows: jnp.ndarray) -> jnp.ndarray:
        """(N,) diagonal of the approximate pressure Schur complement
        S_hat = A_pp - A_pu inv(D_u) A_up, where duinv_rows (9, N) are the
        row-major inverse velocity diagonal blocks (NSFieldSplitPCT).

        diag entry n = A_pp[0][n] - sum_o sum_ij pu_i[o][n] *
        duinv[ij][n+o] * up_j[-o][n+o]: all shifted-row products (135
        terms), gather-free on the lattice."""
        d = self._d
        n = d.shape[2]
        m = max(max(abs(o) for o in self.offsets), 1)
        neg = {o: k for k, o in enumerate(self.offsets)}
        pad = lambda a: jnp.pad(a, ((0, 0), (m, m)))
        hpad = pad(duinv_rows)  # (9, N+2m)
        acc = d[self._d0, PP, :]
        for k, o in enumerate(self.offsets):
            if -o not in neg:
                continue
            kneg = neg[-o]
            sh = lambda a: jax.lax.slice_in_dim(a, m + o, m + o + n, axis=1)
            h = sh(hpad)  # (9, N) rows at n+o
            up = sh(pad(d[kneg, UP(0) : UP(0) + 3, :]))  # (3, N) at n+o
            for i in range(3):
                pu_i = d[k, PU(i), :]
                for j in range(3):
                    acc = acc - pu_i * h[i * 3 + j] * up[j]
        return acc

    def zero_rows_t(self, mask_t: jnp.ndarray, unit_diag: bool = True) -> "FSDIAMatrixT":
        """mask_t: (6, N) boolean; True = constrained (component, node).
        Zero constrained rows + unit diagonal (dirichlet.c:47-61).

        Written as one fused per-plane pass with STATIC row indices: a
        dynamic `.at[d0, comps, :].add` lowers to a scatter that copies
        the whole O(N * D * 18) buffer (measured ~7 ms at 1M tets)."""
        dtype = self.data.dtype
        keep_pc = keep_pc_rows(mask_t, dtype)  # (18, N)
        add18 = diag_add_rows(mask_t, dtype) if unit_diag else None
        d = self._d
        s = self._s
        nd = d.shape[0]
        keep_s = jnp.concatenate([keep_pc[16:18]] * nd, axis=0)
        planes = []
        for k in range(nd):
            p = d[k] * keep_pc[:16]
            if add18 is not None and k == self._d0:
                p = p + add18[:16]
            planes.append(p)
        scal = s * keep_s
        if add18 is not None:
            d0 = self._d0
            pads = ((2 * d0, 2 * (nd - 1 - d0)), (0, 0))
            scal = scal + jnp.pad(add18[16:18], pads)
        return FSDIAMatrixT(
            data=jnp.stack(planes), scal=pad_scal_rows(scal),
            offsets=self.offsets,
            backend=self.backend, shard=self.shard,
        )

    def zero_rows(self, row_mask: jnp.ndarray, unit_diag: bool = True) -> "FSDIAMatrixT":
        return self.zero_rows_t(row_mask.T, unit_diag)

    def to_block_dense(self) -> np.ndarray:
        d = self._d
        s = self._s.reshape(d.shape[0], 2, d.shape[2])
        d18 = jnp.concatenate([d, s], axis=1)
        return FSDIAMatrix(
            data=jnp.transpose(d18, (0, 2, 1)), offsets=self.offsets
        ).to_block_dense()


@jax.tree_util.register_dataclass
@dataclass
class SchurBandsT:
    """Compact pressure-Schur operator: the A_pp / A_pu / A_up component
    planes of an FSDIAMatrixT as standalone arrays with the same linear
    DIA offsets (see FSDIAMatrixT.schur_bands for why the extraction
    exists). All matvecs are gather-free shifted-slice row ops."""

    app: jnp.ndarray  # (D, N) pressure-pressure plane rows
    apu: jnp.ndarray  # (D, 3, N) pressure-row / velocity-col planes
    aup: jnp.ndarray  # (D, 3, N) velocity-row / pressure-col planes
    offsets: tuple = dataclass_field(metadata=dict(static=True))

    # All matvecs accumulate per-offset products WITHOUT a stacked
    # (D, k, N) intermediate: jnp.stack of D shifted slices lowers to a
    # serial dynamic-update-slice chain materializing ~32 MB per apply
    # at 1M tets (visible in HLO), while the accumulator form fuses into
    # one pass over the band array.

    def _pad1(self, x: jnp.ndarray) -> tuple[jnp.ndarray, int, int]:
        n = x.shape[-1]
        m = max(max(abs(o) for o in self.offsets), 1)
        pads = ((0, 0),) * (x.ndim - 1) + ((m, m),)
        return jnp.pad(x, pads), n, m

    def matvec_pp(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) -> (N,): the A_pp block only."""
        pp, n, m = self._pad1(p)
        y = jnp.zeros((), p.dtype)
        for k, o in enumerate(self.offsets):
            y = y + self.app[k] * jax.lax.slice_in_dim(pp, m + o, m + o + n)
        return y

    def matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        """(3, N) velocity -> (N,) pressure row: the A_pu block only."""
        up, n, m = self._pad1(u)
        y = jnp.zeros((), u.dtype)
        for k, o in enumerate(self.offsets):
            sl = jax.lax.slice_in_dim(up, m + o, m + o + n, axis=1)
            y = y + jnp.sum(self.apu[k] * sl, axis=0)
        return y

    def matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) pressure -> (3, N) velocity rows: the A_up block only."""
        pp, n, m = self._pad1(p)
        y = jnp.zeros((), p.dtype)
        for k, o in enumerate(self.offsets):
            sl = jax.lax.slice_in_dim(pp, m + o, m + o + n)
            y = y + self.aup[k] * sl[None, :]
        return y
