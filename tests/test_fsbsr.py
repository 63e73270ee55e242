"""Packed component-major field-split ELL BSR (sparse.fsbsr) tests.

The packed path must reproduce the dense-block oracle: packed element
kernel == slices of ns_lhs_elements; FSBSR matvec/zero_rows == BSRMatrix
equivalents on the same assembled data; "prefix" scatter == "segment" to
scan-reordering accuracy.
"""

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns, weakform
from dedflow_tpu.fem.assembly import (
    build_context,
    bsr_from_data,
    fsbsr_from_data,
    scatter_matrix,
    scatter_matrix_packed,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.sparse.bsr import bsr_to_dense
from dedflow_tpu.sparse.fsbsr import COMP_SLOTS, pack_block_data


def _setup():
    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    ctx = build_context(mesh)
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))
    # make the state non-trivial so every term is exercised
    rng = np.random.default_rng(0)
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    return mesh, cfg, ctx, ef


def test_packed_lhs_matches_dense_oracle():
    mesh, cfg, ctx, ef = _setup()
    dense = np.asarray(weakform.ns_lhs_elements(ctx, ef, cfg.physics, cfg.time))
    packed = np.asarray(weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time))
    ne = ctx.num_elem
    dense_flat = dense.reshape(ne * 16, 6, 6)
    expect = pack_block_data(dense_flat)
    np.testing.assert_allclose(packed, expect, rtol=1e-13, atol=1e-13)
    # the other 18 entries really are structurally zero
    nz = {(bi, bj) for _, bi, bj in COMP_SLOTS}
    for bi in range(6):
        for bj in range(6):
            if (bi, bj) not in nz:
                np.testing.assert_allclose(dense_flat[:, bi, bj], 0.0, atol=0)


def test_fsbsr_matches_block_bsr():
    mesh, cfg, ctx, ef = _setup()
    blocks = scatter_matrix(
        ctx, weakform.ns_lhs_elements(ctx, ef, cfg.physics, cfg.time)
    )  # (nnz, 6, 6) CSR oracle
    dense_mat = bsr_from_data(ctx, blocks)
    packed_data = scatter_matrix_packed(
        ctx, weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time)
    )
    packed = fsbsr_from_data(ctx, packed_data)

    np.testing.assert_allclose(
        packed.to_block_dense(), bsr_to_dense(dense_mat), rtol=1e-12, atol=1e-12
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(ctx.num_node, 6)))
    np.testing.assert_allclose(
        np.asarray(packed.matvec(x)), np.asarray(dense_mat.matvec(x)), rtol=1e-12,
        atol=1e-12,
    )
    # diag extraction
    np.testing.assert_allclose(
        np.asarray(packed.diag_vel_blocks()),
        np.asarray(dense_mat.diag_blocks())[:, :3, :3],
        rtol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(packed.diag_p()), np.asarray(dense_mat.diag_blocks())[:, 3, 3]
    )
    # Dirichlet row zeroing
    mask = jnp.asarray(rng.random((ctx.num_node, 6)) < 0.3)
    a = packed.zero_rows(mask)
    b = dense_mat.zero_rows(mask)
    np.testing.assert_allclose(
        a.to_block_dense(), bsr_to_dense(b), rtol=1e-12, atol=1e-12
    )


def test_scatter_methods_match_segment():
    mesh, cfg, ctx, ef = _setup()
    upd = weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time)
    a = scatter_matrix_packed(ctx, upd, "segment")
    scale = float(jnp.max(jnp.abs(a)))
    for method in ("prefix", "grouped"):
        b = scatter_matrix_packed(ctx, upd, method)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6 * scale, err_msg=method
        )


def test_packed_assembly_pipeline_runs():
    """ns.assemble_jacobian end-to-end: finite matvec through BCs."""
    mesh, cfg, ctx, ef = _setup()
    from dedflow_tpu.solver.newton import NSSolver

    solver = NSSolver(mesh, cfg)
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    jmat = ns.assemble_jacobian(
        solver.ctx, solver.face_ctxs, solver.mask, wa, dwa, cfg.physics, cfg.time
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    y = jmat.matvec(x)
    assert np.isfinite(np.asarray(y)).all()


def test_grouped_residual_matches_segment():
    mesh, cfg, ctx, ef = _setup()
    from dedflow_tpu.fem.assembly import scatter_residual, scatter_residual_grouped

    fe = weakform.ns_residual_elements(ctx, ef, cfg.physics, cfg.time)
    a = np.asarray(scatter_residual(ctx, fe))
    b = np.asarray(scatter_residual_grouped(ctx, fe))
    np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-13)


def test_dia_matrix_matches_ell():
    """Auto-detected DIA storage (lattice meshes) == the ELL matrix:
    same dense expansion, same matvec, same Dirichlet rows, same diag."""
    from dedflow_tpu.fem.assembly import scatter_matrix_dia
    from dedflow_tpu.sparse.fsbsr import FSDIAMatrix

    mesh, cfg, ctx, ef = _setup()
    assert ctx.dia_offsets is not None and 0 in ctx.dia_offsets
    upd = weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time)
    ell = fsbsr_from_data(ctx, scatter_matrix_packed(ctx, upd, "segment"))
    dia = FSDIAMatrix(data=scatter_matrix_dia(ctx, upd), offsets=ctx.dia_offsets)
    np.testing.assert_allclose(
        dia.to_block_dense(), ell.to_block_dense(), rtol=1e-11, atol=1e-11
    )
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(ctx.num_node, 6)))
    np.testing.assert_allclose(
        np.asarray(dia.matvec(x)), np.asarray(ell.matvec(x)), rtol=1e-10,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(dia.diag_vel_blocks()), np.asarray(ell.diag_vel_blocks()),
        rtol=1e-12,
    )
    mask = jnp.asarray(rng.random((ctx.num_node, 6)) < 0.3)
    np.testing.assert_allclose(
        dia.zero_rows(mask).to_block_dense(),
        ell.zero_rows(mask).to_block_dense(),
        rtol=1e-11, atol=1e-11,
    )


def test_dia_full_jacobian_matvec_matches():
    """assemble_jacobian DIA path (grouped) == ELL path (segment), through
    faces + Dirichlet."""
    from dedflow_tpu.app.scenarios import reference_scenario_config
    from dedflow_tpu.solver.newton import NSSolver

    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    s = NSSolver(mesh, cfg)
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))
    rng = np.random.default_rng(1)
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    j_ell = ns.assemble_jacobian(
        s.ctx, s.face_ctxs, s.mask, wa, dwa, cfg.physics, cfg.time,
        None, "segment",
    )
    j_dia = ns.assemble_jacobian(
        s.ctx, s.face_ctxs, s.mask, wa, dwa, cfg.physics, cfg.time,
        None, "grouped",
    )
    x = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    np.testing.assert_allclose(
        np.asarray(j_dia.matvec(x)), np.asarray(j_ell.matvec(x)),
        rtol=1e-9, atol=1e-10,
    )
