"""Degree-tiered scatters + tiered-ELL matrix (sparse.tiered) vs the
sorted segment-sum oracle, on a genuinely irregular (Delaunay) mesh.

The tiered path is the TPU counterpart of the reference's unstructured
assembly + MatrixFS SpMV (assemble.cu:1467-1762, matrix.c:471-497) for
meshes with no translation structure; these tests pin exact agreement
(up to reduction-order roundoff) with the general segment path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import reference_scenario_config
from dedflow_tpu.fem import ns
from dedflow_tpu.fem.assembly import (
    build_context,
    fsbsr_from_data,
    scatter_matrix_packed,
    scatter_residual,
)
from dedflow_tpu.mesh.gen import delaunay_mesh


@pytest.fixture(scope="module")
def setup():
    mesh = delaunay_mesh(400)
    ctx = build_context(mesh)
    assert ctx.tiered is not None, "Delaunay mesh should be irregular"
    cfg = reference_scenario_config()
    rng = np.random.default_rng(7)
    wa = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    dwa = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    return mesh, ctx, cfg, wa, dwa


def _upd(ctx, cfg, wa, dwa):
    from dedflow_tpu.fem import weakform

    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    return weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time, False)


def test_tiered_matrix_matches_segment(setup):
    mesh, ctx, cfg, wa, dwa = setup
    upd = _upd(ctx, cfg, wa, dwa)
    ref = fsbsr_from_data(ctx, scatter_matrix_packed(ctx, upd, "segment"))
    from dedflow_tpu.sparse.tiered import scatter_matrix_tiered

    tm = scatter_matrix_tiered(ctx.tiered, upd)
    np.testing.assert_allclose(
        tm.to_block_dense(), ref.to_block_dense(), rtol=0, atol=1e-11
    )


def test_tiered_matvec_and_diag(setup):
    mesh, ctx, cfg, wa, dwa = setup
    upd = _upd(ctx, cfg, wa, dwa)
    ref = fsbsr_from_data(ctx, scatter_matrix_packed(ctx, upd, "segment"))
    from dedflow_tpu.sparse.tiered import scatter_matrix_tiered

    tm = scatter_matrix_tiered(ctx.tiered, upd)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    np.testing.assert_allclose(tm.matvec(x), ref.matvec(x), atol=1e-10)
    np.testing.assert_allclose(
        tm.matvec_up(x[:, 3]), ref.matvec_up(x[:, 3]), atol=1e-10
    )
    np.testing.assert_allclose(
        tm.matvec_pu(x[:, :3]), ref.matvec_pu(x[:, :3]), atol=1e-10
    )
    np.testing.assert_allclose(
        tm.matvec_pp(x[:, 3]), ref.matvec_pp(x[:, 3]), atol=1e-10
    )
    np.testing.assert_allclose(
        tm.diag_vel_blocks(), ref.diag_vel_blocks(), atol=1e-11
    )
    np.testing.assert_allclose(tm.diag_p(), ref.diag_p(), atol=1e-11)


def test_tiered_residual_matches(setup):
    mesh, ctx, cfg, wa, dwa = setup
    from dedflow_tpu.fem import weakform
    from dedflow_tpu.sparse.tiered import scatter_residual_tiered

    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    fe = weakform.ns_residual_elements(ctx, ef, cfg.physics, cfg.time)
    ref = scatter_residual(ctx, fe)
    out = scatter_residual_tiered(ctx.tiered, fe)
    np.testing.assert_allclose(out, ref, atol=1e-11)


def _shuffled_box(n=5):
    """A box mesh with randomly relabeled nodes: irregular FORMAT (no
    translation classes survive) but full boundary tables."""
    from dedflow_tpu.mesh.gen import box_mesh
    from dedflow_tpu.mesh.reorder import NodeOrder, reorder_mesh

    mesh = box_mesh(n, n, n)
    rng = np.random.default_rng(11)
    perm = rng.permutation(mesh.num_node)
    rank = np.empty_like(perm)
    rank[perm] = np.arange(mesh.num_node)
    return reorder_mesh(mesh, NodeOrder(perm=perm, rank=rank))


def test_assemble_jacobian_tiered_end_to_end(setup):
    """Full assemble_jacobian (faces + Dirichlet) tiered vs segment, on a
    shuffled box (irregular format WITH boundary tables)."""
    _, _, cfg, _, _ = setup
    from dedflow_tpu.fem.dirichlet import StrongBC, build_mask
    from dedflow_tpu.fem.face import build_face_context
    from dedflow_tpu.sparse.topology import build_sparsity

    mesh = _shuffled_box()
    ctx = build_context(mesh)
    assert ctx.tiered is not None, "shuffled box should be irregular"
    rng = np.random.default_rng(7)
    wa = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    dwa = jnp.asarray(rng.normal(size=(mesh.num_node, 6)))
    spars = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    fctxs = (build_face_context(mesh, ctx, spars, 4),)
    mask = jnp.asarray(build_mask(mesh, [StrongBC(1, (0, 1, 2))], 6))
    ref = ns.assemble_jacobian(
        ctx, fctxs, mask, wa, dwa, cfg.physics, cfg.time,
        scatter_method="segment",
    )
    tm = ns.assemble_jacobian(
        ctx, fctxs, mask, wa, dwa, cfg.physics, cfg.time,
        scatter_method="tiered",
    )
    np.testing.assert_allclose(
        tm.to_block_dense(), ref.to_block_dense(), rtol=0, atol=1e-11
    )


def test_newton_step_tiered_matches_segment(setup):
    """One fixed step on a shuffled box: tiered == segment trajectories
    to solver tolerance."""
    import dataclasses

    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.solver.newton import NSSolver

    mesh = _shuffled_box()
    cfg = reference_scenario_config()
    cfg = dataclasses.replace(
        cfg,
        use_lattice="gather",
        krylov=dataclasses.replace(cfg.krylov, max_iter=40),
    )
    wg, dwgold, dwg = reference_initial_state(mesh)
    outs = []
    for method in ("segment", "tiered"):
        c = dataclasses.replace(cfg, scatter_method=method)
        s = NSSolver(mesh, c)
        outs.append(s.step_fixed(wg, dwgold, dwg, num_newton=2))
    for a, b in zip(*outs):
        np.testing.assert_allclose(a, b, rtol=0, atol=5e-8)
