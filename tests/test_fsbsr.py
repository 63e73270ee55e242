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


def test_prefix_scatter_matches_segment():
    mesh, cfg, ctx, ef = _setup()
    upd = weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time)
    a = scatter_matrix_packed(ctx, upd, "segment")
    b = scatter_matrix_packed(ctx, upd, "prefix")
    scale = float(jnp.max(jnp.abs(a)))
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6 * scale)


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
