"""WinELL: windowed pack-ELL field-split storage for IRREGULAR meshes.

This is the round-4 TPU answer for the reference's "any tet mesh at full
speed" property (AssembleSystemTet + MatrixMatVec make no structure
assumption: assemble.cu:1467-1762, matrix.c:151-162). The lattice /
translation-class fast paths (fem.lattice) cover structured inputs; a
genuinely irregular mesh (Delaunay-class) has no shared offsets at all,
and the XLA gather/scatter lowerings run ~100x off the HBM roofline.
WinELL rebuilds the hot matrix ops around the two irregular-data
primitives the TPU actually has:

- an in-kernel 128-lane dynamic gather (`jnp.take_along_axis` on one
  (8, 128) vreg - Mosaic lowers it to a single lane-gather op), and
- MXU one-hot contractions for cross-lane reduction/placement.

Layout. Rows are grouped into PACKS of 128 consecutive rows (the mesh is
assumed RCM-reordered: mesh.reorder). Each pack stores its nonzero
ENTRIES sorted by (col, row), padded to a 128 multiple; packs
concatenate into one entry axis of size S:

  vals  (24, S) f32   packed 6x6-block components, WINELL COMP ORDER
                      (4x4 vel/p col-major + phi/T; see COMP2WIN)
  ecol  (1, S) i32    global column id of each entry
  erow  (1, S) i32    PACK-LOCAL row id (0..127)

Sorting by column makes each 128-entry vreg's columns span only a few
128-lane x-tiles (measured mean ~13 on a 1.18M-tet RCM Delaunay mesh vs
~200 for row-sorted vregs), so the SpMV gathers x with a short
tile-select loop; the row reduction is one (8,128)@(128,128) one-hot
matmul per vreg, built in-kernel from `erow`. Pad entries point at
column = pack's first row with zero values: they gather real data but
contribute nothing.

The planner (build_winell_plan) is pure NumPy; kernels live in
sparse.win_kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.sparse import fsbsr as fs
from dedflow_tpu.sparse.win_kernels import ECOL_ROW, EROW_ROW

# WinELL component order: W_k = rows [4k, 4k+4) multiply gathered x comp
# k for the coupled 4x4 (vel+p) block; rows 16/17 are the scalar
# diagonals; rows 18..23 pad the sublane tile.
#   row 4k+i (i<3): d y_u[i] / d x_[k]   (k<3: uu[i,k]; k=3: up[i])
#   row 4k+3:       d y_p    / d x_[k]   (k<3: pu[k];   k=3: pp)
# Mapping from the packed fsbsr component order (fsbsr.COMP_SLOTS):
WIN_ROWS = 24
COMP2WIN = np.zeros(18, dtype=np.int64)  # fsbsr comp -> winell row
for _i in range(3):
    for _j in range(3):
        COMP2WIN[fs.UU(_i, _j)] = 4 * _j + _i
for _i in range(3):
    COMP2WIN[fs.UP(_i)] = 12 + _i
for _j in range(3):
    COMP2WIN[fs.PU(_j)] = 4 * _j + 3
COMP2WIN[fs.PP] = 15
COMP2WIN[fs.PHIPHI] = 16
COMP2WIN[fs.TT] = 17


# superpack rows (must match win_kernels). 1024 (not 2048) halves the
# matvec's one-hot P-stack (8 comps x HB row-blocks x 2 hi/lo rows =
# 128 = exactly one MXU tile): the reduction was the kernel's measured
# bottleneck at SP=2048 (256 MXU cycles per 128-entry vreg).
SP = 1024


@dataclass(frozen=True, eq=False)
class WinPlan:
    """Host-side WinELL plan (NumPy; device arrays live in WinELLMatrix).

    Entry e (in [0, S)) is the e-th stored slot; real entries carry
    nnz_of_entry = the index into the CSR (row_ptr/col_ind) numbering.
    """

    num_node: int
    num_pack: int  # number of SP-row superpacks
    S: int  # padded entry count (multiple of 128)
    ecol: np.ndarray  # (S,) int32 global col (pads: pack base row)
    erow: np.ndarray  # (S,) int32 pack-local row (pads: 0)
    entry_of_nnz: np.ndarray  # (nnz,) int64 CSR nnz -> entry slot
    pack_voff: np.ndarray  # (num_pack + 1,) int32 vreg offset per pack
    grow: np.ndarray  # (S,) int32 GLOBAL row (pads: pack base row)
    vspan: np.ndarray  # (S//128,) int32 x-tile span of each entry vreg
    vqlo: np.ndarray  # (S//128,) int32 first x-tile of each entry vreg
    vwin: np.ndarray  # (S//128,) int32 packed (wlo << 10 | nwin) schedule
    diag_entry: np.ndarray  # (N,) int64 entry slot of the diagonal
    # kernel streaming schedule (sparse.win_kernels): packs per grid step
    # is fixed (_GP); vmax = max vreg count of any step (static DMA size)
    nsteps: int = 0
    vmax: int = 0
    last_gp: int = 0
    voff_pad: np.ndarray | None = None  # (nsteps*_GP + 1,) int32

    @property
    def num_vreg(self) -> int:
        return self.S // 128


def build_winell_plan(
    row_ptr: np.ndarray, col_ind: np.ndarray, num_node: int
) -> WinPlan:
    """Build the pack/entry layout from a CSR pattern (rows assumed in a
    locality-friendly order, e.g. RCM: mesh.reorder.rcm_order)."""
    row_ptr = np.asarray(row_ptr, dtype=np.int64)
    col_ind = np.asarray(col_ind, dtype=np.int64)
    n = num_node
    npk = -(-n // SP)
    ecol_parts, erow_parts, voff = [], [], [0]
    nnz_ids = np.arange(col_ind.size, dtype=np.int64)
    entry_of_nnz = np.empty(col_ind.size, dtype=np.int64)
    base = 0
    for p in range(npk):
        r0, r1 = p * SP, min((p + 1) * SP, n)
        lo, hi = row_ptr[r0], row_ptr[r1]
        cols = col_ind[lo:hi]
        rows = np.repeat(
            np.arange(r0, r1, dtype=np.int64), np.diff(row_ptr[r0 : r1 + 1])
        )
        ids = nnz_ids[lo:hi]
        order = np.lexsort((rows, cols))
        cnt = hi - lo
        pad = (-cnt) % 512  # vreg quads: the matvec kernel batches 4
        # 128-entry vregs per MXU reduction
        ecol_parts.append(
            np.concatenate([cols[order], np.full(pad, r0, dtype=np.int64)])
        )
        erow_parts.append(
            np.concatenate([rows[order] - r0, np.zeros(pad, dtype=np.int64)])
        )
        entry_of_nnz[ids[order]] = base + np.arange(cnt)
        base += cnt + pad
        voff.append(base // 128)
    ecol = np.concatenate(ecol_parts)
    erow = np.concatenate(erow_parts)
    S = ecol.size
    pack_of_entry = np.repeat(
        np.arange(npk, dtype=np.int64),
        np.diff(np.asarray(voff, dtype=np.int64)) * 128,
    )
    grow = (pack_of_entry * SP + erow).astype(np.int32)
    q = (ecol >> 7).reshape(-1, 128)
    vqlo = q.min(axis=1).astype(np.int32)
    vspan = (q.max(axis=1) - vqlo + 1).astype(np.int32)
    # 256-lane window schedule for the matvec kernel, packed as one
    # prefetch int per vreg: (wlo << 10) | nwin (10 window-count bits:
    # locality orderings with rare long-range couplings, e.g. geometric
    # snake orderings, can exceed 255 windows on outlier vregs)
    w = (ecol >> 8).reshape(-1, 128)
    wlo = w.min(axis=1).astype(np.int64)
    nwin = (w.max(axis=1) - wlo + 1).astype(np.int64)
    assert int(nwin.max()) < 1024 and int(wlo.max()) < (1 << 21)
    vwin = ((wlo << 10) | nwin).astype(np.int32)
    # diagonal entries (for PC setup / unit-diagonal masking)
    diag_nnz = np.empty(n, dtype=np.int64)
    for r in range(0):  # vectorized below
        pass
    # vectorized diagonal lookup: position of col==row within each row
    rows_all = np.repeat(np.arange(n, dtype=np.int64), np.diff(row_ptr))
    is_diag = col_ind == rows_all
    diag_nnz = nnz_ids[is_diag]
    assert diag_nnz.size == n, "every row needs a diagonal entry"
    # streaming schedule for the kernels: one superpack per grid step
    voff_np = np.asarray(voff, dtype=np.int64)
    nsteps = npk
    vmax = int(np.diff(voff_np).max())
    return WinPlan(
        nsteps=nsteps,
        vmax=vmax,
        last_gp=0,
        voff_pad=voff_np.astype(np.int32),
        num_node=n,
        num_pack=npk,
        S=S,
        ecol=ecol.astype(np.int32),
        erow=erow.astype(np.int32),
        grow=grow,
        entry_of_nnz=entry_of_nnz,
        pack_voff=np.asarray(voff, dtype=np.int32),
        vspan=vspan,
        vqlo=vqlo,
        vwin=vwin,
        diag_entry=entry_of_nnz[diag_nnz],
    )


def plan_stats(plan: WinPlan) -> dict:
    """Diagnostics: pad waste, per-vreg tile spans (the SpMV gather-loop
    trip counts)."""
    return dict(
        S=plan.S,
        pad_frac=float(plan.S / max(plan.entry_of_nnz.size, 1) - 1.0),
        span_mean=float(plan.vspan.mean()),
        span_p99=float(np.percentile(plan.vspan, 99)),
        span_max=int(plan.vspan.max()),
    )


def winell_from_packed_updates(
    plan: WinPlan, elem_nnz: np.ndarray, upd: jnp.ndarray
) -> jnp.ndarray:
    """(ne*16, 18) packed element updates (fsbsr comp order) -> WinELL
    vals (24, S), via an XLA segment-sum in entry order. This is the
    oracle/setup path; the hot path assembles in the Pallas kernels
    (fem.win_assembly)."""
    tgt = plan.entry_of_nnz[np.asarray(elem_nnz, dtype=np.int64).reshape(-1)]
    order = np.argsort(tgt, kind="stable")
    upd_sorted = upd[jnp.asarray(order.astype(np.int32))]
    summed = jax.ops.segment_sum(
        upd_sorted,
        jnp.asarray(tgt[order].astype(np.int32)),
        num_segments=plan.S,
        indices_are_sorted=True,
    )  # (S, 18)
    vals = jnp.zeros((WIN_ROWS, plan.S), upd.dtype)
    return vals.at[jnp.asarray(COMP2WIN), :].set(summed.T)


@jax.tree_util.register_dataclass
@dataclass
class WinELLMatrix:
    """Device-side WinELL field-split matrix (see module docstring).

    Downstream contract mirrors FSBSRMatrix where the solver needs it:
    matvec/matvec_t, component-restricted matvecs for the SIMPLE/Schur
    PCs, diagonal extraction, row masking.
    """

    # (24, S + vmax*128) f32: rows 0..17 = components in WinELL order,
    # rows 18/19 = IMMUTABLE ecol/erow int32 bits (kernel stream), rows
    # 20..23 + the vmax-vreg tail = padding. Mutation ops touch rows
    # 0..17 of [:, :S] only.
    vals: jnp.ndarray
    ecol: jnp.ndarray  # (1, S) int32
    erow: jnp.ndarray  # (1, S) int32 pack-local
    grow: jnp.ndarray  # (1, S) int32 global row
    vqlo: jnp.ndarray  # (num_vreg,) int32
    vspan: jnp.ndarray  # (num_vreg,) int32
    vwin: jnp.ndarray  # (num_vreg,) int32 packed (wlo << 10 | nwin)
    pack_voff: jnp.ndarray  # (nsteps*GP + 1,) int32 (prefetch operand)
    diag_entry: jnp.ndarray  # (N,) int32
    num_node: int = dataclass_field(metadata=dict(static=True))
    S: int = dataclass_field(default=0, metadata=dict(static=True))
    nsteps: int = dataclass_field(default=0, metadata=dict(static=True))
    vmax: int = dataclass_field(default=0, metadata=dict(static=True))
    last_gp: int = dataclass_field(default=0, metadata=dict(static=True))
    # "pallas" on TPU; "xla" = reference lowering (tests / CPU)
    backend: str = dataclass_field(default="pallas", metadata=dict(static=True))

    @property
    def num_rows(self) -> int:
        return self.num_node

    # ------------------------------------------------------------------
    def matvec_t(self, x_t: jnp.ndarray) -> jnp.ndarray:
        """(6, N) -> (6, N)."""
        if self.backend == "pallas":
            from dedflow_tpu.sparse.win_kernels import winell_matvec

            return winell_matvec(self, x_t)
        return self._matvec_xla(x_t)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, 6) -> (N, 6) compatibility wrapper."""
        return self.matvec_t(x.T).T

    def _matvec_xla(self, x_t: jnp.ndarray) -> jnp.ndarray:
        """Reference lowering: one flat gather + one-hot-free segment
        reduction (correct anywhere; the oracle for the kernel)."""
        from dedflow_tpu.utils.xla import take_rows

        n = self.num_node
        xe = take_rows(x_t.T, self.ecol[0])  # (S, 6)
        v = self.vals[:, : self.S]
        yu = [
            v[4 * 0 + i] * xe[:, 0]
            + v[4 * 1 + i] * xe[:, 1]
            + v[4 * 2 + i] * xe[:, 2]
            + v[12 + i] * xe[:, 3]
            for i in range(3)
        ]
        yp = (
            v[3] * xe[:, 0] + v[7] * xe[:, 1] + v[11] * xe[:, 2] + v[15] * xe[:, 3]
        )
        yphi = v[16] * xe[:, 4]
        yt = v[17] * xe[:, 5]
        contrib = jnp.stack(yu + [yp, yphi, yt], axis=-1)  # (S, 6)
        y = jax.ops.segment_sum(
            contrib, self.grow[0], num_segments=-(-n // SP) * SP
        )
        return y[:n].T

    # -- component-restricted matvecs (SIMPLE/Schur PC). These reuse the
    # full matvec on a zero-padded state: correct but ~3x the traffic of
    # dedicated kernels; the default PC on the WinELL path (fieldsplit)
    # never calls them per-iteration.
    def matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) pressure -> (3, N): the A_up block only."""
        x = jnp.zeros((6, self.num_node), p.dtype).at[3].set(p)
        return self.matvec_t(x)[:3]

    def matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        """(3, N) -> (N,): the A_pu block only."""
        x = jnp.zeros((6, self.num_node), u.dtype).at[:3].set(u)
        return self.matvec_t(x)[3]

    def matvec_pp(self, p: jnp.ndarray) -> jnp.ndarray:
        """(N,) -> (N,): the A_pp block only."""
        x = jnp.zeros((6, self.num_node), p.dtype).at[3].set(p)
        return self.matvec_t(x)[3]

    # ------------------------------------------------------------------
    def diag_rows(self) -> jnp.ndarray:
        """(18, N) packed diagonal-block rows in FSBSR comp order."""
        de = self.diag_entry
        rows = self.vals[:, de]  # (24, N) winell order
        return rows[jnp.asarray(COMP2WIN), :]  # fsbsr comp order

    def diag_vel_blocks(self) -> jnp.ndarray:
        """(N, 3, 3) velocity diagonal blocks."""
        d18 = self.diag_rows()  # (18, N) fsbsr order
        return d18[:9].T.reshape(self.num_node, 3, 3)

    def diag_p(self) -> jnp.ndarray:
        return self.diag_rows()[fs.PP]

    # ------------------------------------------------------------------
    def zero_rows_t(self, mask_t: jnp.ndarray, unit_diag: bool = True) -> "WinELLMatrix":
        """mask_t (6, N) boolean; True = constrained (component, node).
        Zero constrained rows + unit diagonal (dirichlet.c:47-61)."""
        dtype = self.vals.dtype
        keep6 = 1.0 - mask_t.astype(dtype)  # (6, N)
        keep_e = keep6[:, self.grow[0]]  # (6, S) per solution component
        # winell row -> solution (equation) component
        win_eq = np.zeros(18, dtype=np.int64)
        for (comp, bi, _bj) in fs.COMP_SLOTS:
            win_eq[COMP2WIN[comp]] = bi
        keep_rows = keep_e[jnp.asarray(win_eq), :]  # (18, S)
        vals = self.vals.at[:18, : self.S].multiply(keep_rows)
        if unit_diag:
            add6 = mask_t.astype(dtype)  # (6, N)
            de = self.diag_entry
            win_diag = COMP2WIN[np.asarray(fs.DIAG_COMPS)]
            vals = vals.at[jnp.asarray(win_diag)[:, None], de[None, :]].add(
                add6
            )
        import dataclasses as _dc

        return _dc.replace(self, vals=vals)

    def zero_rows(self, row_mask: jnp.ndarray, unit_diag: bool = True) -> "WinELLMatrix":
        return self.zero_rows_t(row_mask.T, unit_diag)

    # ------------------------------------------------------------------
    def to_block_dense(self) -> np.ndarray:
        """Debug/test helper: dense (N*6, N*6)."""
        n = self.num_node
        grow = np.asarray(self.grow[0])
        cols = np.asarray(self.ecol[0])
        v = np.asarray(self.vals)[:, : self.S]
        dense = np.zeros((n * 6, n * 6))
        for comp, bi, bj in fs.COMP_SLOTS:
            np.add.at(
                dense, (grow * 6 + bi, cols * 6 + bj), v[COMP2WIN[comp]]
            )
        return dense


def winell_matrix(
    plan: WinPlan, vals: jnp.ndarray, backend: str = "pallas"
) -> WinELLMatrix:
    """Assemble the device matrix from clean (24, S) component data:
    installs the immutable ecol/erow index-bit rows (18/19) and the
    vmax-vreg zero tail the streaming kernel over-reads."""
    vals = jnp.pad(vals, ((0, 0), (0, plan.vmax * 128)))
    vals = vals.at[ECOL_ROW, : plan.S].set(
        jax.lax.bitcast_convert_type(plan.ecol, jnp.float32)
    )
    vals = vals.at[EROW_ROW, : plan.S].set(
        jax.lax.bitcast_convert_type(plan.erow, jnp.float32)
    )
    return WinELLMatrix(
        vals=vals,
        ecol=jnp.asarray(plan.ecol[None, :]),
        erow=jnp.asarray(plan.erow[None, :]),
        grow=jnp.asarray(plan.grow[None, :]),
        vqlo=jnp.asarray(plan.vqlo),
        vspan=jnp.asarray(plan.vspan),
        vwin=jnp.asarray(plan.vwin),
        pack_voff=jnp.asarray(plan.voff_pad),
        diag_entry=jnp.asarray(plan.diag_entry.astype(np.int32)),
        num_node=plan.num_node,
        S=plan.S,
        nsteps=plan.nsteps,
        vmax=plan.vmax,
        last_gp=plan.last_gp,
        backend=backend,
    )
