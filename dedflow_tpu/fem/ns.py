"""Coupled NS + phi + T system assembly (volume + weak boundary + BCs).

Reproduces AssembleSystem (main.c:31-75): zero targets, volume assembly,
facet assembly on weak boundaries, zero the phi/T residual rows
(main.c:64 - those equations are frozen), then strong Dirichlet masking.
The generalized-alpha state construction reproduces SolveFlowSystem's
prologue (main.c:107-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dedflow_tpu.config import Physics, TimeScheme
from dedflow_tpu.fem import dirichlet, weakform
from dedflow_tpu.fem.assembly import (
    FEMContext,
    bsr_from_data,
    fsbsr_from_data,
    scatter_matrix,
    scatter_matrix_dia,
    scatter_matrix_packed,
    scatter_residual,
    scatter_residual_grouped,
    slice_elems,
)
from dedflow_tpu.fem.face import (
    FaceContext,
    face_lhs_packed,
    face_residual_elements,
    scatter_face_matrix,
    scatter_face_matrix_dia,
    scatter_face_matrix_packed,
    scatter_face_residual,
)
from dedflow_tpu.sparse.bsr import BSRMatrix


def alpha_states(
    wgold: jnp.ndarray,
    dwgold: jnp.ndarray,
    dwg: jnp.ndarray,
    scheme: TimeScheme,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized-alpha evaluation states (main.c:107-118):
    dw_alpha = (1-am) dwgold + am dwg, but pressure slot = dwg pressure;
    w_alpha = wgold + dt af ((1-g) dwgold + g dwg), pressure slot = 0."""
    am = scheme.alpha_m
    af = scheme.alpha_f
    g = scheme.gamma
    dt = scheme.dt
    dwa = (1.0 - am) * dwgold + am * dwg
    dwa = dwa.at[:, 3].set(dwg[:, 3])
    wa = wgold + dt * af * ((1.0 - g) * dwgold + g * dwg)
    wa = wa.at[:, 3].set(0.0)
    return wa, dwa


def _chunked_residual(ctx, w_alpha, dw_alpha, phys, scheme, chunk: int, source=None):
    """Streaming volume residual: lax.scan over element chunks so no
    whole-mesh element temp ever materializes (the XLA analogue of the
    reference's per-color-batch loop, assemble.cu:1559 - but deterministic
    and race-free)."""
    num_chunks = ctx.num_elem // chunk

    def body(carry, k):
        ien_c, geom, _ = slice_elems(ctx, k * chunk, chunk)
        ef = weakform.gather_fields(ien_c, w_alpha, dw_alpha)
        src_e = None if source is None else source[ien_c]
        fe = weakform.ns_residual_elements(geom, ef, phys, scheme, src_e)
        carry = carry.at[ien_c.reshape(-1)].add(fe.reshape(chunk * 4, 6))
        return carry, None

    init = jnp.zeros((ctx.num_node, 6), dtype=w_alpha.dtype)
    out, _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    return out


def _chunked_jacobian_data(
    ctx, w_alpha, dw_alpha, phys, scheme, chunk: int, scalar_implicit=False
):
    """Streaming volume Jacobian into packed (N, PR, 18) ELL data."""
    num_chunks = ctx.num_elem // chunk
    n, pr = ctx.num_node, ctx.ell_width

    def body(carry, k):
        lo = k * chunk
        ien_c, geom, _ = slice_elems(ctx, lo, chunk)
        tgt = jax.lax.dynamic_slice_in_dim(ctx.elem_ell, lo, chunk)
        ef = weakform.gather_fields(ien_c, w_alpha, dw_alpha)
        upd = weakform.ns_lhs_packed(geom, ef, phys, scheme, scalar_implicit)
        carry = carry.at[tgt.reshape(-1)].add(upd)
        return carry, None

    init = jnp.zeros((n * pr, 18), dtype=w_alpha.dtype)
    out, _ = jax.lax.scan(body, init, jnp.arange(num_chunks))
    return out.reshape(n, pr, 18)


def assemble_residual(
    ctx: FEMContext,
    face_ctxs: tuple[FaceContext, ...],
    mask: jnp.ndarray,
    w_alpha: jnp.ndarray,
    dw_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
    freeze_phi_temperature: bool = True,
    chunk: int | None = None,
    source: jnp.ndarray | None = None,
    nodal_force: jnp.ndarray | None = None,
    scatter_method: str = "segment",
    elements_kernel: str = "xla",
) -> jnp.ndarray:
    """Global residual F (N, 6). `source` (N,) is a nodal volumetric heat
    source (e.g. the moving laser, app.scenarios.laser_source);
    `nodal_force` (N, 3) is an already-integrated nodal momentum load
    (e.g. the DEM drag reaction, dem.coupling.drag_exchange)."""
    if chunk:
        f = _chunked_residual(ctx, w_alpha, dw_alpha, phys, scheme, chunk, source)
    else:
        if elements_kernel == "pallas":
            from dedflow_tpu.fem.pallas_kernels import ns_residual_pallas

            fe = ns_residual_pallas(
                ctx.res_geom, ctx.ien_t, w_alpha, dw_alpha, phys, scheme, source
            ).astype(w_alpha.dtype)
        else:
            ef = weakform.gather_fields(ctx.ien, w_alpha, dw_alpha)
            from dedflow_tpu.utils.xla import take_rows

            src_e = None if source is None else take_rows(source, ctx.ien)
            fe = weakform.ns_residual_elements(ctx, ef, phys, scheme, src_e)
        if scatter_method == "tiered" and ctx.tiered is not None:
            from dedflow_tpu.sparse.tiered import scatter_residual_tiered

            f = scatter_residual_tiered(ctx.tiered, fe)
        elif scatter_method == "grouped":
            f = scatter_residual_grouped(ctx, fe)
        else:
            f = scatter_residual(ctx, fe)
    if nodal_force is not None:
        f = f.at[:, :3].add(-nodal_force)
    for fctx in face_ctxs:
        f = f + scatter_face_residual(
            fctx,
            face_residual_elements(fctx, w_alpha, dw_alpha, phys),
            ctx.num_node,
        )
    if freeze_phi_temperature:
        f = f.at[:, 4:].set(0.0)  # main.c:64
    return dirichlet.apply_vec(mask, f)


def assemble_jacobian(
    ctx: FEMContext,
    face_ctxs: tuple[FaceContext, ...],
    mask: jnp.ndarray,
    w_alpha: jnp.ndarray,
    dw_alpha: jnp.ndarray,
    phys: Physics,
    scheme: TimeScheme,
    chunk: int | None = None,
    scatter_method: str = "segment",
    scalar_implicit: bool = False,
    elements_kernel: str = "xla",
):
    """Global field-split Jacobian as a packed component-major FSBSRMatrix
    in ELL row layout (sparse.fsbsr; the TPU-layout-safe equivalent of the
    reference's MatrixFS grid, matrix.h:93-103).

    elements_kernel="pallas" uses the fused single-pass TPU element kernel
    (fem.pallas_kernels); it supports the frozen-scalar mode only and
    falls back to XLA otherwise.

    On lattice meshes (ctx.dia_offsets detected) with the grouped scatter,
    the matrix is stored in DIA planes (sparse.fsbsr.FSDIAMatrix) whose
    SpMV is completely gather-free."""
    use_dia = (
        ctx.dia_offsets is not None and not chunk and scatter_method == "grouped"
    )
    if use_dia:
        if elements_kernel == "pallas" and not scalar_implicit:
            from dedflow_tpu.fem.pallas_kernels import ns_lhs_packed_pallas

            upd = ns_lhs_packed_pallas(
                ctx.lhs_geom, ctx.ien_t, w_alpha, phys, scheme
            ).astype(w_alpha.dtype)
        else:
            ef = weakform.gather_fields(ctx.ien, w_alpha, dw_alpha)
            upd = weakform.ns_lhs_packed(ctx, ef, phys, scheme, scalar_implicit)
        data = scatter_matrix_dia(ctx, upd)
        for fctx in face_ctxs:
            data = data + scatter_face_matrix_dia(
                fctx,
                face_lhs_packed(fctx, w_alpha, dw_alpha, phys, scheme),
                ctx.num_node,
                len(ctx.dia_offsets),
            )
        from dedflow_tpu.sparse.fsbsr import FSDIAMatrix

        return dirichlet.apply_mat(
            mask, FSDIAMatrix(data=data, offsets=ctx.dia_offsets)
        )
    if scatter_method == "tiered" and ctx.tiered is not None and not chunk:
        # degree-tiered grouped scatter + tiered-ELL matrix (sparse.tiered):
        # the irregular-mesh fast path - every scatter becomes a gather
        if elements_kernel == "pallas" and not scalar_implicit:
            from dedflow_tpu.fem.pallas_kernels import ns_lhs_packed_pallas

            upd = ns_lhs_packed_pallas(
                ctx.lhs_geom, ctx.ien_t, w_alpha, phys, scheme
            ).astype(w_alpha.dtype)
        else:
            ef = weakform.gather_fields(ctx.ien, w_alpha, dw_alpha)
            upd = weakform.ns_lhs_packed(ctx, ef, phys, scheme, scalar_implicit)
        from dedflow_tpu.sparse.tiered import scatter_matrix_tiered

        jmat = scatter_matrix_tiered(ctx.tiered, upd)
        for fctx in face_ctxs:
            jmat = jmat.add_ell_delta(
                scatter_face_matrix_packed(
                    fctx,
                    face_lhs_packed(fctx, w_alpha, dw_alpha, phys, scheme),
                    ctx.num_node,
                    ctx.ell_width,
                )
            )
        return dirichlet.apply_mat(mask, jmat)
    if chunk:
        data = _chunked_jacobian_data(
            ctx, w_alpha, dw_alpha, phys, scheme, chunk, scalar_implicit
        )
    elif elements_kernel == "pallas" and not scalar_implicit:
        from dedflow_tpu.fem.pallas_kernels import ns_lhs_packed_pallas

        upd = ns_lhs_packed_pallas(
            ctx.lhs_geom, ctx.ien_t, w_alpha, phys, scheme
        ).astype(w_alpha.dtype)
        data = scatter_matrix_packed(ctx, upd, scatter_method)
    else:
        ef = weakform.gather_fields(ctx.ien, w_alpha, dw_alpha)
        data = scatter_matrix_packed(
            ctx,
            weakform.ns_lhs_packed(ctx, ef, phys, scheme, scalar_implicit),
            scatter_method,
        )
    for fctx in face_ctxs:
        data = data + scatter_face_matrix_packed(
            fctx,
            face_lhs_packed(fctx, w_alpha, dw_alpha, phys, scheme),
            ctx.num_node,
            ctx.ell_width,
        )
    return dirichlet.apply_mat(mask, fsbsr_from_data(ctx, data))


def field_norms(f: jnp.ndarray) -> jnp.ndarray:
    """Per-field residual norms [velocity, pressure, phi, T]
    (main.c:127-130)."""
    return jnp.stack(
        [
            jnp.linalg.norm(f[:, :3].reshape(-1)),
            jnp.linalg.norm(f[:, 3]),
            jnp.linalg.norm(f[:, 4]),
            jnp.linalg.norm(f[:, 5]),
        ]
    )
