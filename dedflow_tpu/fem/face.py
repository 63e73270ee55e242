"""Weak (Nitsche-type) boundary assembly with backflow stabilization.

Reference: AssembleSystemTetFace + FaceAssemblyKernel + GetElemFaceNVKernel
(assemble.cu:1764-1964, 1038-1214, 279-319). The reference hard-codes this
to boundary index 4 (assemble.cu:1827); here any boundary may be declared
weak (config.BCSpec.weak). The reference's color-masked scatter loops
(assemble.cu:1916-1944) - needed because facets of one boundary share
parent-element colors - are replaced by the same deterministic sorted
segment-sums as the volume path.

Facet quadrature-point fields use the parent element's nodal values with
the facet shape table SHLB[forn]; the velocity comes from w_alpha and the
pressure from dw_alpha slot 3 (assemble.cu:1841-1848), as in the volume
kernels. The Nanson normal nv is NOT unit length: its magnitude carries
the facet area Jacobian, so no detJ appears in the facet integrals.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.config import Physics, TimeScheme
from dedflow_tpu.fem import quadrature as quad
from dedflow_tpu.fem.assembly import FEMContext
from dedflow_tpu.fem.element import face_normals
from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.sparse.topology import Sparsity


@jax.tree_util.register_dataclass
@dataclass
class FaceContext:
    """Per-boundary facet tables + gathered parent geometry + scatter plans."""

    f2e: jnp.ndarray  # (nf,)
    forn: jnp.ndarray  # (nf,)
    ien: jnp.ndarray  # (nf, 4) parent element connectivity
    inv_j: jnp.ndarray  # (nf, 3, 3)
    shgrad: jnp.ndarray  # (nf, 4, 3)
    nv: jnp.ndarray  # (nf, 3) Nanson normals
    shlb: jnp.ndarray  # (nf, NQRB, 4) facet shape values SHLB[forn]
    node_perm: jnp.ndarray  # (nf*4,)
    node_targets: jnp.ndarray  # (nf*4,)
    mat_perm: jnp.ndarray  # (nf*16,)
    mat_targets: jnp.ndarray  # (nf*16,)
    mat_targets_ell: jnp.ndarray  # (nf*16,) ELL positions, non-decreasing
    # DIA-space scatter plan (lattice meshes only; None otherwise)
    mat_perm_dia: jnp.ndarray | None = None
    mat_targets_dia: jnp.ndarray | None = None
    num_facet: int = field(default=0, metadata=dict(static=True))
    # component-major DIA plan (lattice fast path): targets local to the
    # boundary's contiguous row range [dia_row_lo, dia_row_lo + span)
    mat_perm_dia_t: jnp.ndarray | None = None
    mat_targets_dia_t: jnp.ndarray | None = None
    dia_row_lo: int = field(default=0, metadata=dict(static=True))
    dia_row_span: int = field(default=0, metadata=dict(static=True))
    # counting-sort slot plans (lattice fast path): fixed-width source
    # lists per target, so the scatter becomes K small row-GATHERS + sum.
    # XLA segment_sum lowers to a TPU scatter (~1 ms against the full-N
    # residual); the slot gather touches only O(boundary) rows.
    node_slot_idx: jnp.ndarray | None = None  # (node_span, Kn) into nf*4
    mat_slot_idx: jnp.ndarray | None = None  # (D*span, Km) into nf*16
    node_row_lo: int = field(default=0, metadata=dict(static=True))
    node_row_span: int = field(default=0, metadata=dict(static=True))
    # grouped band plan (lattice fast path): whole (f, a) groups per band
    # row, gathered as 4x18-float rows. TPU gather bandwidth scales ~10x
    # with row width, so this replaces the mat_slot_idx narrow-row gather
    # (measured 2.5 ms -> ~0.4 ms at 6k facets, face_dia_band_grouped).
    band_gidx: jnp.ndarray | None = None  # (span*Gb,) into nf*4, fill=nf*4
    band_plane: jnp.ndarray | None = None  # (span*Gb*4,) plane per (g, b)
    band_gw: int = field(default=0, metadata=dict(static=True))  # Gb
    # state-independent facet Jacobian band (D, 18, span), precomputed by
    # solver setup (face_lhs_static_band); None = compute per assembly
    lhs_static_band: jnp.ndarray | None = None
    # WinELL-entry scatter plan (windowed irregular path): facet (f, ab)
    # contributions -> compact unique entry slots, attached by
    # fem.win_assembly.attach_face_win_plans when the solver selects the
    # winell tier (assemble.cu:1764-1964 on irregular meshes)
    win_perm: jnp.ndarray | None = None  # (nf*16,) sort by entry slot
    win_seg: jnp.ndarray | None = None  # (nf*16,) compact segment id
    win_uniq: jnp.ndarray | None = None  # (nu,) WinELL entry slots
    win_num_uniq: int = field(default=0, metadata=dict(static=True))


def _slot_plan(targets: np.ndarray, num_slots: int) -> np.ndarray:
    """(num_slots, K) source indices per target (counting-sort layout);
    pad entries point at len(targets) - the caller appends a zero row."""
    m = targets.size
    if m == 0:
        return np.full((num_slots, 1), 0, dtype=np.int32)
    counts = np.bincount(targets, minlength=num_slots)
    k = max(int(counts.max()), 1)
    order = np.argsort(targets, kind="stable")
    sor = targets[order]
    start = np.zeros(num_slots, dtype=np.int64)
    start[1:] = np.cumsum(counts)[:-1]
    offs = np.arange(m) - start[sor]
    slot = np.full((num_slots, k), m, dtype=np.int64)
    slot[sor, offs] = order
    return slot.astype(np.int32)


def build_face_context(
    mesh: Mesh, ctx: FEMContext, sparsity: Sparsity, boundary: int
) -> FaceContext:
    b = mesh.boundaries[boundary]
    f2e = jnp.asarray(b.f2e)
    forn = jnp.asarray(b.forn)
    inv_j = ctx.inv_j[f2e]
    det_j = ctx.det_j[f2e]
    nv = face_normals(inv_j, det_j, forn)
    shlb = jnp.asarray(quad.SHLB, dtype=ctx.xg.dtype)[forn]
    ien_np = np.asarray(mesh.ien)[np.asarray(b.f2e)]
    node_t = ien_np.ravel()
    node_perm = np.argsort(node_t, kind="stable").astype(np.int32)
    mat_t = np.asarray(sparsity.elem_nnz)[np.asarray(b.f2e)].ravel()
    mat_perm = np.argsort(mat_t, kind="stable").astype(np.int32)
    _, nnz_to_ell, _ = sparsity.ell_tables()
    mat_t_ell = nnz_to_ell[mat_t[mat_perm]].astype(np.int32)
    mat_perm_dia = mat_targets_dia = None
    mat_perm_dia_t = mat_targets_dia_t = None
    node_slot_idx = mat_slot_idx = None
    dia_row_lo = dia_row_span = 0
    node_row_lo = node_row_span = 0
    if ctx.dia_offsets is not None:
        node_row_lo = int(node_t.min()) if node_t.size else 0
        node_row_span = (
            int(node_t.max()) - node_row_lo + 1 if node_t.size else 1
        )
        node_slot_idx = jnp.asarray(
            _slot_plan(node_t.astype(np.int64) - node_row_lo, node_row_span)
        )
    if ctx.dia_offsets is not None:
        uniq = np.asarray(ctx.dia_offsets, dtype=np.int64)
        rows = np.asarray(sparsity.row_ids, dtype=np.int64)[mat_t]
        cols = np.asarray(sparsity.col_ind, dtype=np.int64)[mat_t]
        plane = np.searchsorted(uniq, cols - rows)
        dia_pos = plane * ctx.num_node + rows  # plane-major (D, N) layout
        perm_d = np.argsort(dia_pos, kind="stable").astype(np.int32)
        mat_perm_dia = jnp.asarray(perm_d)
        mat_targets_dia = jnp.asarray(dia_pos[perm_d].astype(np.int32))
        # component-major plan over the boundary's contiguous row range
        dia_row_lo = int(rows.min()) if rows.size else 0
        dia_row_span = (int(rows.max()) - dia_row_lo + 1) if rows.size else 1
        pos_t = plane * dia_row_span + (rows - dia_row_lo)
        perm_t = np.argsort(pos_t, kind="stable").astype(np.int32)
        mat_perm_dia_t = jnp.asarray(perm_t)
        mat_targets_dia_t = jnp.asarray(pos_t[perm_t].astype(np.int32))
        mat_slot_idx = jnp.asarray(
            _slot_plan(pos_t, len(uniq) * dia_row_span)
        )
        # grouped band plan: (f, a) incidences per band row + their
        # per-b plane ids (see FaceContext.band_gidx)
        ga_rows = ien_np.ravel().astype(np.int64) - dia_row_lo
        ng = ga_rows.size
        gcounts = np.bincount(ga_rows, minlength=dia_row_span)
        gb = max(int(gcounts.max()), 1) if ng else 1
        order = np.argsort(ga_rows, kind="stable")
        start = np.zeros(dia_row_span, dtype=np.int64)
        start[1:] = np.cumsum(gcounts)[:-1]
        offs_in = np.arange(ng) - start[ga_rows[order]]
        gidx_np = np.full((dia_row_span, gb), ng, dtype=np.int64)
        gidx_np[ga_rows[order], offs_in] = order
        ien64 = ien_np.astype(np.int64)
        plane_fab = np.searchsorted(
            uniq, ien64[:, None, :] - ien64[:, :, None]  # [f,a,b] = col-row
        ).reshape(-1, 4)  # (nf*4, 4): plane of col ien[f,b] - row ien[f,a]
        bp = np.zeros((dia_row_span, gb, 4), dtype=np.int32)
        valid = gidx_np < ng
        bp[valid] = plane_fab[gidx_np[valid]]
        band_gidx = jnp.asarray(gidx_np.reshape(-1).astype(np.int32))
        band_plane = jnp.asarray(bp.reshape(-1))
        band_gw = gb
    else:
        band_gidx = band_plane = None
        band_gw = 0
    return FaceContext(
        band_gidx=band_gidx,
        band_plane=band_plane,
        band_gw=band_gw,
        mat_perm_dia=mat_perm_dia,
        mat_targets_dia=mat_targets_dia,
        mat_perm_dia_t=mat_perm_dia_t,
        mat_targets_dia_t=mat_targets_dia_t,
        dia_row_lo=dia_row_lo,
        dia_row_span=dia_row_span,
        node_slot_idx=node_slot_idx,
        mat_slot_idx=mat_slot_idx,
        node_row_lo=node_row_lo,
        node_row_span=node_row_span,
        f2e=f2e,
        forn=forn,
        ien=jnp.asarray(ien_np),
        inv_j=inv_j,
        shgrad=ctx.shgrad[f2e],
        nv=nv,
        shlb=shlb,
        node_perm=jnp.asarray(node_perm),
        node_targets=jnp.asarray(node_t[node_perm].astype(np.int32)),
        mat_perm=jnp.asarray(mat_perm),
        mat_targets=jnp.asarray(mat_t[mat_perm].astype(np.int32)),
        mat_targets_ell=jnp.asarray(mat_t_ell),
        num_facet=b.num_facet,
    )


def _facet_fields(fctx: FaceContext, w_alpha, dw_alpha):
    """(nf,4,3) parent u gather, (nf,4) parent p gather, qp values."""
    u_e = w_alpha[fctx.ien, :3]  # (nf, 4, 3)
    p_e = dw_alpha[fctx.ien, 3]  # (nf, 4)
    u_qb = jnp.einsum("fqa,fai->fqi", fctx.shlb, u_e)
    p_qb = jnp.einsum("fqa,fa->fq", fctx.shlb, p_e)
    grad_u = jnp.einsum("fai,faj->fij", u_e, fctx.shgrad)
    return u_qb, p_qb, grad_u


def _tau_b(fctx: FaceContext, mu: float) -> jnp.ndarray:
    """Penalty tau_B = 4*mu*|J^-1 nv| (assemble.cu:1054-1064)."""
    a = jnp.einsum("fin,fn->fi", fctx.inv_j, fctx.nv)
    return 4.0 * mu * jnp.linalg.norm(a, axis=-1)


def face_residual_elements(
    fctx: FaceContext,
    w_alpha: jnp.ndarray,
    dw_alpha: jnp.ndarray,
    phys: Physics,
) -> jnp.ndarray:
    """(nf, 4, 6) facet residual contributions (assemble.cu:1068-1126)."""
    dtype = w_alpha.dtype
    gwb = jnp.asarray(quad.GWB, dtype=dtype)
    rho, mu = phys.rho, phys.mu
    nv = fctx.nv
    u_qb, p_qb, grad_u = _facet_fields(fctx, w_alpha, dw_alpha)
    tau_b = _tau_b(fctx, mu)  # (nf,)

    unor = jnp.einsum("fqi,fi->fq", u_qb, nv)
    uneg = 0.5 * (unor - jnp.abs(unor))
    # tmp0 (assemble.cu:1081-1093)
    ngrad = jnp.einsum("fj,fij->fi", nv, grad_u)  # n_j du_i/dx_j
    ngrad_t = jnp.einsum("fj,fji->fi", nv, grad_u)  # n_j du_j/dx_i
    tmp0 = (
        nv[:, None, :] * p_qb[..., None]
        - mu * (ngrad + ngrad_t)[:, None, :]
        - rho * uneg[..., None] * u_qb
        + tau_b[:, None, None] * u_qb
    )
    # tmp1 (assemble.cu:1095-1100)
    tmp1 = -mu * (
        jnp.einsum("fi,fqj->fqij", nv, u_qb) + jnp.einsum("fj,fqi->fqij", nv, u_qb)
    )
    f_m = jnp.einsum("q,fqa,fqi->fai", gwb, fctx.shlb, tmp0) + jnp.einsum(
        "q,faj,fqij->fai", gwb, fctx.shgrad, tmp1
    )
    f_c = -jnp.einsum("q,fqa,fq->fa", gwb, fctx.shlb, unor)
    zeros = jnp.zeros(f_c.shape + (2,), dtype=dtype)
    return jnp.concatenate([f_m, f_c[..., None], zeros], axis=-1)


def face_lhs_elements(
    fctx: FaceContext,
    w_alpha: jnp.ndarray,
    dw_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
) -> jnp.ndarray:
    """(nf, 4, 4, 6, 6) facet Jacobian contributions (assemble.cu:1127-1193)."""
    dtype = w_alpha.dtype
    gwb = jnp.asarray(quad.GWB, dtype=dtype)
    rho, mu = phys.rho, phys.mu
    f2 = scheme.fact_w
    nv = fctx.nv
    shlb = fctx.shlb
    u_qb, _, _ = _facet_fields(fctx, w_alpha, dw_alpha)
    tau_b = _tau_b(fctx, mu)
    shnorm = jnp.einsum("fai,fi->fa", fctx.shgrad, nv)

    unor = jnp.einsum("fqi,fi->fq", u_qb, nv)
    uneg = 0.5 * (unor - jnp.abs(unor))

    # velocity diagonal scalar part (assemble.cu:1152-1166)
    t_diag = (
        -mu
        * (
            jnp.einsum("q,fb,fqa->fab", gwb, shnorm, shlb)
            + jnp.einsum("q,fa,fqb->fab", gwb, shnorm, shlb)
        )
        - rho * jnp.einsum("q,fqa,fqb,fq->fab", gwb, shlb, shlb, uneg)
        + tau_b[:, None, None] * jnp.einsum("q,fqa,fqb->fab", gwb, shlb, shlb)
    )
    # full 3x3 consistency terms (assemble.cu:1171-1181)
    t_full = -mu * (
        jnp.einsum("q,fqa,fbi,fj->fabij", gwb, shlb, fctx.shgrad, nv)
        + jnp.einsum("q,fqb,faj,fi->fabij", gwb, shlb, fctx.shgrad, nv)
    )
    eye3 = jnp.eye(3, dtype=dtype)
    j_uu = f2 * (t_diag[..., None, None] * eye3[None, None, None] + t_full)

    # pressure couplings (assemble.cu:1183-1189)
    t_ab = jnp.einsum("q,fqa,fqb->fab", gwb, shlb, shlb)
    j_pu = -f2 * jnp.einsum("fab,fi->fabi", t_ab, nv)  # dRC/dU
    j_up = jnp.einsum("fab,fi->fabi", t_ab, nv)  # dRM/dP (no fact2!)

    nf = fctx.num_facet
    j = jnp.zeros((nf, 4, 4, 6, 6), dtype=dtype)
    j = j.at[..., :3, :3].set(j_uu)
    j = j.at[..., :3, 3].set(j_up)
    j = j.at[..., 3, :3].set(j_pu)
    return j


def face_lhs_packed(
    fctx: FaceContext,
    w_alpha: jnp.ndarray,
    dw_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
) -> jnp.ndarray:
    """(nf*16, 18) packed facet Jacobian contributions (facet terms only
    touch the uu/up/pu slots; sparse.fsbsr component order).

    Builds the 18 packed components directly instead of materializing
    (nf, 4, 4, 6, 6) dense blocks and gathering 18 strided slices out of
    them - TPU layouts pad small trailing dims, making the dense-block
    detour ~10x more traffic than the result (measured 1.8 ms -> ~0.2 ms
    at 6k facets). Same math as face_lhs_elements (the oracle;
    assemble.cu:1127-1193)."""
    dtype = w_alpha.dtype
    gwb = jnp.asarray(quad.GWB, dtype=dtype)
    rho = phys.rho
    shlb = fctx.shlb
    u_qb, _, _ = _facet_fields(fctx, w_alpha, dw_alpha)
    unor = jnp.einsum("fqi,fi->fq", u_qb, fctx.nv)
    uneg = 0.5 * (unor - jnp.abs(unor))
    # backflow stabilization: the ONLY state-dependent facet LHS term
    # (assemble.cu:1079-1080, 1152-1166)
    t_uneg = -rho * jnp.einsum("q,fqa,fqb,fq->fab", gwb, shlb, shlb, uneg)
    return _face_lhs_packed_from(fctx, t_uneg, phys, scheme, dtype)


def _face_lhs_packed_from(
    fctx: FaceContext,
    t_uneg: jnp.ndarray | None,
    phys: Physics,
    scheme: TimeScheme,
    dtype,
) -> jnp.ndarray:
    """face_lhs_packed with the state-dependent backflow term passed in
    (None = drop it: the state-independent part, precomputable once per
    (mesh, phys, scheme) - see face_lhs_static_band)."""
    gwb = jnp.asarray(quad.GWB, dtype=dtype)
    mu = phys.mu
    f2 = scheme.fact_w
    nv = fctx.nv
    shlb = fctx.shlb
    tau_b = _tau_b(fctx, mu)
    shnorm = jnp.einsum("fai,fi->fa", fctx.shgrad, nv)

    # velocity diagonal scalar part (assemble.cu:1152-1166)
    t_diag = (
        -mu
        * (
            jnp.einsum("q,fb,fqa->fab", gwb, shnorm, shlb)
            + jnp.einsum("q,fa,fqb->fab", gwb, shnorm, shlb)
        )
        + tau_b[:, None, None] * jnp.einsum("q,fqa,fqb->fab", gwb, shlb, shlb)
    )
    if t_uneg is not None:
        t_diag = t_diag + t_uneg
    # consistency terms (assemble.cu:1171-1181): t_full[...,i,j] =
    # -mu*(G_i[f,a,b]*nv_j + G_j[f,b,a]*nv_i) with
    # G_i = sum_q gwb_q shlb[f,q,a] shgrad[f,b,i]
    g = [
        jnp.einsum("q,fqa,fb->fab", gwb, shlb, fctx.shgrad[:, :, i])
        for i in range(3)
    ]
    t_ab = jnp.einsum("q,fqa,fqb->fab", gwb, shlb, shlb)

    comps = []
    for i in range(3):
        for j in range(3):
            c = -mu * (
                g[i] * nv[:, j][:, None, None]
                + jnp.swapaxes(g[j], 1, 2) * nv[:, i][:, None, None]
            )
            if i == j:
                c = c + t_diag
            comps.append(f2 * c)
    for i in range(3):  # up: dRM/dP (no fact2)
        comps.append(t_ab * nv[:, i][:, None, None])
    for j in range(3):  # pu: dRC/dU
        comps.append(-f2 * t_ab * nv[:, j][:, None, None])
    zero = jnp.zeros_like(t_ab)
    comps += [zero, zero, zero]  # pp, phiphi, TT untouched by facet terms
    return jnp.stack(comps, axis=-1).reshape(fctx.num_facet * 16, 18)


def scatter_face_matrix_packed(
    fctx: FaceContext, upd: jnp.ndarray, num_node: int, ell_width: int
) -> jnp.ndarray:
    """(nf*16, 18) packed updates -> (N, PR, 18) ELL data."""
    upd_sorted = upd[fctx.mat_perm]
    out = jax.ops.segment_sum(
        upd_sorted,
        fctx.mat_targets_ell,
        num_segments=num_node * ell_width,
        indices_are_sorted=True,
    )
    return out.reshape(num_node, ell_width, upd.shape[1])


def scatter_face_matrix_dia(
    fctx: FaceContext, upd: jnp.ndarray, num_node: int, num_planes: int
) -> jnp.ndarray:
    """(nf*16, 18) packed updates -> (D, N, 18) plane-major DIA data."""
    upd_sorted = upd[fctx.mat_perm_dia]
    out = jax.ops.segment_sum(
        upd_sorted,
        fctx.mat_targets_dia,
        num_segments=num_planes * num_node,
        indices_are_sorted=True,
    )
    return out.reshape(num_planes, num_node, upd.shape[1])


def face_dia_block(
    fctx: FaceContext, upd: jnp.ndarray, num_planes: int
) -> jnp.ndarray:
    """(nf*16, 18) packed facet updates -> dense (D, 18, span) block over
    the boundary's contiguous row range [dia_row_lo, dia_row_lo + span)
    (lattice fast path). The caller adds it into the component-major DIA
    data with a STATIC slice - a dynamic scatter into the O(N*D*18)
    volume data would copy the whole matrix (measured ~17 ms at 1M tets),
    while this segment-sum touches only O(facets) data."""
    span = fctx.dia_row_span
    upd_sorted = upd[fctx.mat_perm_dia_t]
    out = jax.ops.segment_sum(
        upd_sorted,
        fctx.mat_targets_dia_t,
        num_segments=num_planes * span,
        indices_are_sorted=True,
    )
    return out.reshape(num_planes, span, upd.shape[1]).transpose(0, 2, 1)


def face_residual_band(fctx: FaceContext, elem_f: jnp.ndarray) -> jnp.ndarray:
    """(nf, 4, 6) facet residuals -> dense (node_span, 6) band over
    [node_row_lo, node_row_lo + node_span) via the counting-sort slot
    plan: K row-gathers + sum instead of a full-N TPU scatter."""
    flat = elem_f.reshape(fctx.num_facet * 4, -1)
    flat = jnp.concatenate(
        [flat, jnp.zeros((1, flat.shape[1]), flat.dtype)], axis=0
    )
    return jnp.sum(flat[fctx.node_slot_idx], axis=1)


def face_dia_band(
    fctx: FaceContext, upd: jnp.ndarray, num_planes: int
) -> jnp.ndarray:
    """(nf*16, 18) packed facet updates -> dense (D, 18, span) block (same
    result as face_dia_block) via the counting-sort slot plan."""
    span = fctx.dia_row_span
    flat = jnp.concatenate(
        [upd, jnp.zeros((1, upd.shape[1]), upd.dtype)], axis=0
    )
    out = jnp.sum(flat[fctx.mat_slot_idx], axis=1)
    return out.reshape(num_planes, span, upd.shape[1]).transpose(0, 2, 1)


def face_dia_band_grouped(
    fctx: FaceContext, upd: jnp.ndarray, num_planes: int
) -> jnp.ndarray:
    """(nf*16, 18) packed facet updates -> dense (D, 18, span) block (same
    result as face_dia_band) via whole-(f, a)-group gathers.

    The mat_slot_idx plan gathers 18-float rows one (f, a, b) update at a
    time - narrow-row TPU gathers run ~10x off the wide-row rate, and
    this gather measured 2.5 ms of the 3.9 ms facet Jacobian cost at 6k
    facets. Gathering the 4x18-float (f, a) group rows and contracting
    the 4 b-updates onto their DIA planes with a one-hot einsum (same
    pattern as assembly.scatter_matrix_dia) is ~5x faster."""
    span, gb, nc = fctx.dia_row_span, fctx.band_gw, upd.shape[1]
    rows = jnp.take(
        upd.reshape(-1, 4 * nc), fctx.band_gidx, axis=0,
        mode="fill", fill_value=0,
    )  # (span*Gb, 4*18)
    vals = rows.reshape(span, gb * 4, nc)
    onehot = (
        fctx.band_plane.reshape(span, gb * 4, 1)
        == jnp.arange(num_planes, dtype=jnp.int32)[None, None, :]
    ).astype(upd.dtype)
    # precision="highest": the TPU default lowers einsum to bf16 MXU
    # passes (~1e-3 relative error on the summed updates)
    return jnp.einsum("ngc,ngp->pcn", vals, onehot, precision="highest")


# components UU(0,0), UU(1,1), UU(2,2) in the packed order: the backflow
# term is a SCALAR times the velocity-diagonal identity
_BACKFLOW_SEL = (0, 4, 8)


def face_lhs_static_band(
    fctx: FaceContext, phys: Physics, scheme: TimeScheme, num_planes: int,
    dtype,
) -> jnp.ndarray:
    """(D, 18, span) state-INDEPENDENT facet Jacobian band, precomputed
    once per (mesh, phys, scheme) at solver setup.

    Of the reference facet LHS (assemble.cu:1127-1193) only the backflow
    stabilization depends on the state (through uneg = min(u.n, 0),
    assemble.cu:1079-1080); the penalty, consistency and pressure
    couplings are pure geometry x constants. Splitting them means the
    per-assembly facet cost drops from the full einsum pipeline + 72-wide
    grouped gather (~1.3 ms at 1M tets / 6k facets) to the thin backflow
    scalar band (face_lhs_backflow_band)."""
    upd = _face_lhs_packed_from(fctx, None, phys, scheme, dtype)
    return face_dia_band_grouped(fctx, upd, num_planes)


def face_lhs_backflow_band(
    fctx: FaceContext,
    w_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
    num_planes: int,
) -> jnp.ndarray:
    """(D, span) backflow scalar band: the state-dependent facet LHS.

    The backflow term contributes fact_w * (-rho) * sum_q gwb_q
    shlb[f,q,a] shlb[f,q,b] uneg[f,q] identically to the three velocity
    diagonal components UU(i,i) - a scalar per (f, a, b). It rides the
    same whole-(f, a)-group gather plan as face_dia_band_grouped, with
    4-float rows (delta[f,a,:]) instead of 72-float rows."""
    dtype = w_alpha.dtype
    gwb = jnp.asarray(quad.GWB, dtype=dtype)
    shlb = fctx.shlb
    u_e = w_alpha[fctx.ien, :3]
    u_qb = jnp.einsum("fqa,fai->fqi", shlb, u_e)
    unor = jnp.einsum("fqi,fi->fq", u_qb, fctx.nv)
    uneg = 0.5 * (unor - jnp.abs(unor))
    cq = (-phys.rho * scheme.fact_w) * gwb[None, :] * uneg  # (nf, q)
    delta = jnp.einsum("fq,fqa,fqb->fab", cq, shlb, shlb)  # (nf, 4, 4)
    span, gb = fctx.dia_row_span, fctx.band_gw
    rows = jnp.take(
        delta.reshape(-1, 4), fctx.band_gidx, axis=0,
        mode="fill", fill_value=0,
    )  # (span*Gb, 4)
    vals = rows.reshape(span, gb * 4)
    onehot = (
        fctx.band_plane.reshape(span, gb * 4, 1)
        == jnp.arange(num_planes, dtype=jnp.int32)[None, None, :]
    ).astype(dtype)
    return jnp.einsum("ng,ngp->pn", vals, onehot, precision="highest")


def face_lhs_band_split(
    fctx: FaceContext,
    w_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
    num_planes: int,
) -> jnp.ndarray:
    """(D, 18, span) facet Jacobian band = precomputed static band +
    backflow scalar on the velocity-diagonal components. Requires
    fctx.lhs_static_band (set by solver setup)."""
    dyn = face_lhs_backflow_band(fctx, w_alpha, phys, scheme, num_planes)
    sel = jnp.zeros((18,), dyn.dtype).at[jnp.array(_BACKFLOW_SEL)].set(1.0)
    return fctx.lhs_static_band.astype(dyn.dtype) + (
        dyn[:, None, :] * sel[None, :, None]
    )


def scatter_face_residual(
    fctx: FaceContext, elem_f: jnp.ndarray, num_node: int
) -> jnp.ndarray:
    # <=2-D operands: TPU tile layouts pad trailing small dims (assembly.py)
    trail = elem_f.shape[2:]
    flat = elem_f.reshape(fctx.num_facet * 4, -1)
    out = jax.ops.segment_sum(
        flat[fctx.node_perm],
        fctx.node_targets,
        num_segments=num_node,
        indices_are_sorted=True,
    )
    return out.reshape((num_node,) + trail)


def scatter_face_matrix(
    fctx: FaceContext, elem_j: jnp.ndarray, nnz: int
) -> jnp.ndarray:
    br, bc = elem_j.shape[-2:]
    flat = elem_j.reshape(fctx.num_facet * 16, br * bc)
    out = jax.ops.segment_sum(
        flat[fctx.mat_perm],
        fctx.mat_targets,
        num_segments=nnz,
        indices_are_sorted=True,
    )
    return out.reshape(nnz, br, bc)
