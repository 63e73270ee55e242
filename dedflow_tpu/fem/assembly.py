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
from typing import NamedTuple

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
    # raw per-element nnz targets (chunked assembly path)
    elem_nnz: jnp.ndarray  # (ne, 16) int32
    # BSR topology (CSR view: generic scalar-block matrices, e.g. heat)
    col_ind: jnp.ndarray  # (nnz,)
    row_ids: jnp.ndarray  # (nnz,)
    diag_idx: jnp.ndarray  # (N,)
    # ELL view (NS field-split matrix; sparse.fsbsr)
    ell_col: jnp.ndarray  # (N, PR) int32, pad slots = own row
    diag_slot: jnp.ndarray  # (N,) int32
    # transposed inputs for the fused Pallas element kernel
    ien_t: jnp.ndarray  # (4, ne) int32
    lhs_geom: jnp.ndarray  # (15, ne) pallas_kernels.lhs_geom_rows
    res_geom: jnp.ndarray  # (19, ne) pallas_kernels.res_geom_rows
    # grouped-scatter plan: (e,a) groups padded per row (see
    # scatter_matrix_packed method="grouped")
    grp_gidx: jnp.ndarray  # (N*G,) int32 group gather index; fill = ne*4
    grp_slot: jnp.ndarray  # (N*G*4,) int32 ELL slot per (group, b)
    # DIA view (auto-detected lattice meshes; sparse.fsbsr.FSDIAMatrix)
    grp_plane: jnp.ndarray | None  # (N*G*4,) int32 DIA plane per (group, b)
    elem_ell: jnp.ndarray  # (ne, 16) int32 ELL position of each pair
    mat_targets_ell: jnp.ndarray  # (ne*16,) non-decreasing ELL targets
    mat_off_ell: jnp.ndarray  # (N*PR+1,) update offsets per ELL slot
    num_node: int = field(metadata=dict(static=True))
    num_elem: int = field(metadata=dict(static=True))
    nnz: int = field(metadata=dict(static=True))
    ell_width: int = field(metadata=dict(static=True))
    grp_width: int = field(metadata=dict(static=True))  # G: max groups/row
    # sorted distinct column offsets (col - row) when few enough for DIA
    # storage; None on unstructured/reordered meshes
    dia_offsets: tuple | None = field(metadata=dict(static=True))
    # degree-tiered grouped-scatter plan (sparse.tiered) - built for
    # genuinely irregular meshes (no DIA stencil), where it replaces every
    # assembly scatter with wide-row gathers (scatter_method="tiered")
    tiered: object | None = None


def build_context(
    mesh: Mesh,
    sparsity: Sparsity | None = None,
    dtype=None,
    chunk: int | None = None,
) -> FEMContext:
    """Device context. With `chunk`, element-sized arrays are zero-padded to
    a multiple of `chunk` for the streaming (lax.scan) assembly path: pad
    elements are degenerate (all-node-0), so their geometry and every
    weak-form contribution are exactly zero (fem.element.tet_geometry)."""
    if sparsity is None:
        sparsity = build_sparsity(
            mesh.ien, mesh.num_node, extra_ien=mesh.extra_cells
        )
    if dtype is None:
        dtype = jnp.zeros(0).dtype  # default float of current x64 mode
    ien_np = np.asarray(mesh.ien, dtype=np.int32)
    elem_nnz_np = np.asarray(sparsity.elem_nnz).reshape(-1, 16)
    ne = ien_np.shape[0]
    if chunk is not None and ne % chunk != 0:
        ne_pad = (ne + chunk - 1) // chunk * chunk
        ien_np = np.concatenate(
            [ien_np, np.zeros((ne_pad - ne, 4), dtype=ien_np.dtype)]
        )
        elem_nnz_np = np.concatenate(
            [elem_nnz_np, np.zeros((ne_pad - ne, 16), dtype=elem_nnz_np.dtype)]
        )
        ne = ne_pad
    xg = jnp.asarray(mesh.xg, dtype=dtype)
    ien = jnp.asarray(ien_np)
    geom = tet_geometry(xg[ien])
    node_perm_np, node_targets_np = _sorted_plan(ien_np.ravel())
    mat_perm_np, mat_targets_np = scatter_permutation(elem_nnz_np)

    # ELL view + prefix-scan scatter plan
    ell_col_np, nnz_to_ell_np, _ = sparsity.ell_tables()
    pr = sparsity.max_row
    n = sparsity.num_node
    diag_slot_np = (nnz_to_ell_np[sparsity.diag_idx] % pr).astype(np.int32)
    elem_ell_np = nnz_to_ell_np[elem_nnz_np].astype(np.int64)
    mat_targets_ell_np = nnz_to_ell_np[mat_targets_np]  # still non-decreasing
    counts = np.bincount(mat_targets_ell_np, minlength=n * pr)
    off = np.zeros(n * pr + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])

    # grouped-scatter plan: the (e, a) pairs hitting row r, padded to the
    # max count G. Wide (4x18-float) gather rows run ~10x faster than
    # per-update rows on TPU (see scatter_matrix_packed "grouped").
    # The chunked (lax.scan streaming) path never uses the grouped or DIA
    # plans, and with chunk padding every pad element is all-node-0, which
    # would inflate node 0's group count (and the (N*G,) plan arrays) by
    # up to 4*(chunk-1) entries -- so skip plan construction entirely.
    if chunk is not None:
        gmax = 0
        gidx = np.zeros((0,), dtype=np.int64)
        grp_slot = np.zeros((0,), dtype=np.int32)
        dia_offsets = None
        grp_plane = None
        tiered = None
    else:
        ga_rows = ien_np.ravel()  # row of group g = e*4 + a
        ng = ga_rows.size
        gcounts = np.bincount(ga_rows, minlength=n)
        gmax = int(gcounts.max()) if ng else 0
        goff = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(gcounts, out=goff[1:])
        jj = np.arange(gmax)[None, :]
        gvalid = jj < gcounts[:, None]
        gidx = np.full((n, gmax), ng, dtype=np.int64)
        gidx[gvalid] = node_perm_np[(goff[:-1, None] + jj)[gvalid]]
        slot_tbl = (nnz_to_ell_np[elem_nnz_np] % pr).reshape(-1, 4)  # (ne*4, 4)
        grp_slot = np.zeros((n, gmax, 4), dtype=np.int32)
        grp_slot[gvalid] = slot_tbl[gidx[gvalid]]

        # DIA detection: lattice meshes with natural ordering have a tiny
        # fixed offset stencil (15 for the Kuhn tet box) -> gather-free SpMV
        offs_per_nnz = sparsity.col_ind.astype(np.int64) - np.asarray(
            sparsity.row_ids, dtype=np.int64
        )
        uniq_offs = np.unique(offs_per_nnz)
        dia_offsets = None
        grp_plane = None
        tiered = None
        if uniq_offs.size > 40:
            # genuinely irregular: build the degree-tiered grouped plan
            # (sparse.tiered) so assembly scatters become wide-row gathers
            from dedflow_tpu.sparse.tiered import build_tiered_plan

            tiered = build_tiered_plan(
                node_perm_np.astype(np.int64),
                gcounts,
                slot_tbl.astype(np.int32),
                np.diff(sparsity.row_ptr),
                ell_col_np,
                diag_slot_np,
            )
        if uniq_offs.size <= 40:
            dia_offsets = tuple(int(o) for o in uniq_offs)
            plane_of_nnz = np.searchsorted(uniq_offs, offs_per_nnz).astype(np.int32)
            plane_tbl = plane_of_nnz[elem_nnz_np].reshape(-1, 4)
            grp_plane_np = np.zeros((n, gmax, 4), dtype=np.int32)
            grp_plane_np[gvalid] = plane_tbl[gidx[gvalid]]
            grp_plane = jnp.asarray(grp_plane_np.reshape(-1))

    from dedflow_tpu.fem.pallas_kernels import lhs_geom_rows, res_geom_rows

    return FEMContext(
        res_geom=res_geom_rows(geom.shgrad, geom.det_j, geom.metric),
        grp_gidx=jnp.asarray(gidx.reshape(-1).astype(np.int32)),
        grp_slot=jnp.asarray(grp_slot.reshape(-1)),
        grp_plane=grp_plane,
        grp_width=gmax,
        dia_offsets=dia_offsets,
        tiered=tiered,
        ien=ien,
        ien_t=jnp.asarray(ien_np.T.copy()),
        lhs_geom=lhs_geom_rows(geom.shgrad, geom.det_j, geom.metric),
        elem_nnz=jnp.asarray(elem_nnz_np),
        ell_col=jnp.asarray(ell_col_np),
        diag_slot=jnp.asarray(diag_slot_np),
        elem_ell=jnp.asarray(elem_ell_np.astype(np.int32).reshape(-1, 16)),
        mat_targets_ell=jnp.asarray(mat_targets_ell_np.astype(np.int32)),
        mat_off_ell=jnp.asarray(off.astype(np.int32)),
        ell_width=pr,
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
        num_elem=ne,
        nnz=sparsity.nnz,
    )


def _sorted_plan(targets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    perm = np.argsort(targets, kind="stable").astype(np.int32)
    return perm, targets[perm].astype(np.int32)


def scatter_residual(ctx: FEMContext, elem_f: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, ...) element vectors -> (N, ...) nodal sums.

    Replaces ElemRHSLocal2GlobalKernel (assemble.cu:188-208), whose
    correctness relied on the color batching; here the reduction is a
    deterministic sorted segment-sum. The operand is kept <= 2-D: TPU
    layouts pad the two minor dims to (8, 128) tiles, so trailing
    structure dims like (4, 6) or (6, 6) would blow memory up ~32x.
    """
    trail = int(np.prod(elem_f.shape[2:], dtype=np.int64)) if elem_f.ndim > 2 else 0
    flat = elem_f.reshape(
        (ctx.num_elem * 4, trail) if trail else (ctx.num_elem * 4,)
    )
    out = jax.ops.segment_sum(
        flat[ctx.node_perm],
        ctx.node_targets,
        num_segments=ctx.num_node,
        indices_are_sorted=True,
    )
    return out.reshape((ctx.num_node,) + elem_f.shape[2:])


def grouped_feasible(ctx: FEMContext, width: int) -> bool:
    """The grouped scatter pads every row to the MAX (e,a)-group count G;
    on high-max-degree irregular meshes (e.g. Delaunay: G ~ 96 where the
    mean is ~24) its (N, G*4, .) operands exceed HBM. Gate on the largest
    materialized intermediate."""
    n, g4 = ctx.num_node, 4 * ctx.grp_width
    biggest = n * g4 * max(18, width) * 4
    return biggest <= 2 * 1024**3


def scatter_residual_grouped(ctx: FEMContext, elem_f: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, 6) element vectors -> (N, 6) via the padded (e,a)-group
    gather (same plan as the grouped matrix scatter): gather + dense sum,
    no scatter/segment ops. Falls back to the sorted segment-sum when the
    padded plan is HBM-infeasible (grouped_feasible)."""
    if not grouped_feasible(ctx, 1):
        return scatter_residual(ctx, elem_f)
    n, g = ctx.num_node, ctx.grp_width
    flat = elem_f.reshape(ctx.num_elem * 4, -1)
    rows = jnp.take(flat, ctx.grp_gidx, axis=0, mode="fill", fill_value=0)
    return rows.reshape(n, g, flat.shape[1]).sum(axis=1)


def scatter_matrix(ctx: FEMContext, elem_j: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, 4, br, bc) element matrices -> (nnz, br, bc) BSR data.

    Replaces MatrixAddElemValueBlockedBatched + SetBlockValueToSubmatGPU
    (matrix_impl.cu:88-202, 370-453). 2-D operands for the same TPU
    tile-padding reason as scatter_residual.
    """
    br, bc = elem_j.shape[-2:]
    flat = elem_j.reshape(ctx.num_elem * 16, br * bc)
    out = jax.ops.segment_sum(
        flat[ctx.mat_perm],
        ctx.mat_targets,
        num_segments=ctx.nnz,
        indices_are_sorted=True,
    )
    return out.reshape(ctx.nnz, br, bc)


def scatter_matrix_packed(
    ctx: FEMContext, upd: jnp.ndarray, method: str = "segment"
) -> jnp.ndarray:
    """(ne*16, 18) packed element updates -> (N, PR, 18) ELL data.

    method="segment": sorted segment-sum (exact pairwise order; the CPU
    oracle and the sharded path).
    method="prefix": permute -> cumsum -> boundary difference. XLA TPU
    scatter runs ~100x off the HBM roofline (measured), while cumsum is a
    dense pairwise scan; this path is ~4x faster on TPU at the cost of a
    ~1e-6-relative reduction reordering (the scan is a balanced tree, so
    the error does not grow linearly with mesh size).

    method="grouped": gather whole (e,a) groups (4x18-float rows - TPU
    gather bandwidth scales ~10x with row width) padded per target row,
    then reduce into ELL slots with an on-the-fly one-hot contraction.
    The fastest TPU path.
    """
    n, pr = ctx.num_node, ctx.ell_width
    if method == "grouped" and not grouped_feasible(ctx, pr):
        method = "prefix"  # same reduction tree class, no padded plan
    if method == "grouped":
        return _grouped_scatter(ctx, upd, ctx.grp_slot, pr)
    upd_sorted = upd[ctx.mat_perm]  # (M, 18) in ELL-target order
    if method == "prefix":
        cs = jnp.cumsum(upd_sorted, axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, upd.shape[1]), upd.dtype), cs])
        out = cs0[ctx.mat_off_ell[1:]] - cs0[ctx.mat_off_ell[:-1]]
    else:
        out = jax.ops.segment_sum(
            upd_sorted,
            ctx.mat_targets_ell,
            num_segments=n * pr,
            indices_are_sorted=True,
        )
    return out.reshape(n, pr, upd.shape[1])


def _grouped_scatter(ctx: FEMContext, upd, slot_table, width: int):
    """Shared body of the grouped scatter: wide (e,a)-row gather + one-hot
    slot/plane contraction into (N, width, 18)."""
    n, g = ctx.num_node, ctx.grp_width
    rows = jnp.take(
        upd.reshape(-1, 4 * upd.shape[1]),
        ctx.grp_gidx,
        axis=0,
        mode="fill",
        fill_value=0,
    )  # (N*G, 4*18)
    vals = rows.reshape(n, g * 4, upd.shape[1])
    onehot = (
        slot_table.reshape(n, g * 4, 1)
        == jnp.arange(width, dtype=jnp.int32)[None, None, :]
    ).astype(upd.dtype)
    # precision="highest": the TPU default lowers einsum to bf16 MXU
    # passes (~1e-3 relative error on the summed updates)
    return jnp.einsum("ngc,ngp->npc", vals, onehot, precision="highest")


def scatter_matrix_dia(ctx: FEMContext, upd: jnp.ndarray) -> jnp.ndarray:
    """(ne*16, 18) packed updates -> (D, N, 18) plane-major DIA data
    (lattice meshes; see sparse.fsbsr.FSDIAMatrix)."""
    n, g = ctx.num_node, ctx.grp_width
    width = len(ctx.dia_offsets)
    rows = jnp.take(
        upd.reshape(-1, 4 * upd.shape[1]),
        ctx.grp_gidx,
        axis=0,
        mode="fill",
        fill_value=0,
    )
    vals = rows.reshape(n, g * 4, upd.shape[1])
    onehot = (
        ctx.grp_plane.reshape(n, g * 4, 1)
        == jnp.arange(width, dtype=jnp.int32)[None, None, :]
    ).astype(upd.dtype)
    # precision="highest": the TPU default lowers einsum to bf16 MXU
    # passes (~1e-3 relative error on the summed updates)
    return jnp.einsum("ngc,ngp->pnc", vals, onehot, precision="highest")


def fsbsr_from_data(ctx: FEMContext, data: jnp.ndarray):
    from dedflow_tpu.sparse.fsbsr import FSBSRMatrix

    return FSBSRMatrix(data=data, ell_col=ctx.ell_col, diag_slot=ctx.diag_slot)


class ElemGeom(NamedTuple):
    """Per-element geometry slice: the subset of FEMContext the weak-form
    kernels read (duck-typed with FEMContext itself)."""

    shgrad: jnp.ndarray
    det_j: jnp.ndarray
    metric: jnp.ndarray


def slice_elems(ctx: FEMContext, lo, chunk: int) -> tuple[jnp.ndarray, ElemGeom, jnp.ndarray]:
    """Dynamic element-range slice for the streaming assembly scan:
    (ien, geometry, nnz-targets) for elements [lo, lo+chunk)."""
    sl = lambda a: jax.lax.dynamic_slice_in_dim(a, lo, chunk)
    geom = ElemGeom(shgrad=sl(ctx.shgrad), det_j=sl(ctx.det_j), metric=sl(ctx.metric))
    return sl(ctx.ien), geom, sl(ctx.elem_nnz)


def bsr_from_data(ctx: FEMContext, data: jnp.ndarray) -> BSRMatrix:
    return BSRMatrix(
        data=data, col_ind=ctx.col_ind, row_ids=ctx.row_ids, diag_idx=ctx.diag_idx
    )


def gather_nodal(ctx: FEMContext, x: jnp.ndarray) -> jnp.ndarray:
    """(N, ...) nodal values -> (ne, 4, ...) element gathers
    (LoadElementValueKernel, assemble.cu:135-154)."""
    return x[ctx.ien]
