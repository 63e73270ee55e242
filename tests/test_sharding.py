"""Multi-chip (domain-decomposed) execution tests on a simulated 8-device
CPU mesh (conftest sets xla_force_host_platform_device_count=8) - the TPU
analogue of fake-backend tests (SURVEY.md section 4e).

The reference has no distributed path to mirror (SURVEY.md section 2,
parallelism inventory); correctness bar: the sharded solver must match the
single-chip solver on the same mesh to reduction-order accuracy.
"""

import jax
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import reference_initial_state, reference_scenario_config
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.parallel.partition import partition_mesh, rcb_parts
from dedflow_tpu.parallel.sharded import ShardedNSSolver
from dedflow_tpu.solver.newton import NSSolver


def test_rcb_balanced():
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(1000, 3))
    for p in (2, 3, 8):
        parts = rcb_parts(xg, p)
        counts = np.bincount(parts, minlength=p)
        assert counts.min() >= 1000 // p - 1
        assert counts.max() <= 1000 // p + p  # balanced to rounding


def test_partition_preserves_topology():
    mesh = box_mesh(3, 3, 3)
    pmesh, info = partition_mesh(mesh, 4)
    # padded sizes are exact multiples of the part count
    assert pmesh.num_node % 4 == 0 and pmesh.num_tet % 4 == 0
    # same geometry under the mapping
    np.testing.assert_allclose(pmesh.xg[info.node_map], mesh.xg)
    # each real new element is the old element with renumbered nodes
    remapped = info.node_map[mesh.ien]
    np.testing.assert_array_equal(pmesh.ien[info.elem_map], remapped)
    # pad elements are degenerate (all four nodes identical)
    pads = pmesh.ien[~info.elem_real]
    assert (pads == pads[:, :1]).all()
    # parts are non-decreasing (contiguous subdomains)
    assert (np.diff(info.elem_part) >= 0).all()
    assert (np.diff(info.node_part) >= 0).all()
    # boundary tables still describe the same facets
    for b_old, b_new in zip(mesh.boundaries, pmesh.boundaries):
        np.testing.assert_array_equal(
            np.sort(info.node_map[np.asarray(b_old.nodes)]), np.asarray(b_new.nodes)
        )
        assert b_new.num_facet == b_old.num_facet


def test_sharded_step_matches_single_chip():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    mesh = box_mesh(4, 3, 3)
    cfg = reference_scenario_config()
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)

    ref = NSSolver(mesh, cfg)
    w1, d1, g1 = ref.step_fixed(
        jax.numpy.asarray(wg0), jax.numpy.asarray(dwgold0), jax.numpy.asarray(dwg0),
        num_newton=2,
    )

    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    ws, ds, gs = (sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    w2, d2, g2 = sh.step_fixed(ws, ds, gs, num_newton=2)

    # state comes back in original ordering
    np.testing.assert_allclose(sh.gather_state(w2), np.asarray(w1), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(sh.gather_state(g2), np.asarray(g1), rtol=1e-6, atol=1e-8)


def test_sharded_residual_matches():
    mesh = box_mesh(3, 3, 4)
    cfg = reference_scenario_config()
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)

    ref = NSSolver(mesh, cfg)
    f1 = ref._residual(
        ref.ctx, ref.face_ctxs, ref.mask,
        jax.numpy.asarray(wg0), jax.numpy.asarray(dwgold0), jax.numpy.asarray(dwg0),
    )

    dmesh = jax.make_mesh((4,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh, axis="dd")
    f2 = sh.residual(*(sh.shard_state(x) for x in (wg0, dwgold0, dwg0)))
    np.testing.assert_allclose(
        sh.gather_state(f2), np.asarray(f1), rtol=1e-10, atol=1e-12
    )


def test_shardmap_spmv_and_dots_match_single_device():
    """Explicit-collectives kernels (parallel.spmd): shard_map SpMV with
    an all_gather halo + psum reductions == the single-device results."""
    from dedflow_tpu.fem import ns
    from dedflow_tpu.parallel import spmd
    from dedflow_tpu.parallel.sharded import ShardedNSSolver

    mesh = box_mesh(4, 4, 2)
    cfg = reference_scenario_config()
    dmesh = jax.make_mesh(
        (8,), ("dd",), axis_types=(jax.sharding.AxisType.Auto,)
    )
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)
    wg, dwgold, dwg = (sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    jmat = ns.assemble_jacobian(
        sh.ctx, sh.face_ctxs, sh.mask, wa, dwa, cfg.physics, cfg.time
    )

    rng = np.random.default_rng(0)
    n_pad = sh.pmesh.num_node
    x_np = rng.normal(size=(n_pad, 6))
    x = jax.device_put(jax.numpy.asarray(x_np, dtype=sh.dtype), sh.sharding)

    y_ref = np.asarray(jmat.matvec(x))
    mv = spmd.fsbsr_matvec_shardmap(dmesh, "dd")
    y = np.asarray(mv(jmat.data, jmat.ell_col, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-12)

    dot = spmd.dot_shardmap(dmesh, "dd")
    nrm = spmd.norm_shardmap(dmesh, "dd")
    np.testing.assert_allclose(
        float(dot(x, jax.numpy.asarray(y))), float(np.vdot(x_np.ravel(), y.ravel())),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        float(nrm(x)), np.linalg.norm(x_np.ravel()), rtol=1e-10
    )


def test_sharded_melt_pool_with_source_matches():
    """Sharded execution with implicit scalars + a heat source (the
    melt-pool configuration) matches single-chip."""
    import dataclasses

    from dedflow_tpu.app.scenarios import (
        laser_source,
        melt_pool_initial_state,
        melt_pool_scenario_config,
    )

    mesh = box_mesh(4, 3, 3)
    cfg = melt_pool_scenario_config()
    wg0, dwgold0, dwg0 = melt_pool_initial_state(mesh)
    src0 = laser_source(cfg.physics.laser, mesh.xg, 0.01)

    ref = NSSolver(mesh, cfg)
    w1, d1, g1 = ref.step_fixed(
        jax.numpy.asarray(wg0), jax.numpy.asarray(dwgold0),
        jax.numpy.asarray(dwg0), num_newton=2,
        source=jax.numpy.asarray(src0),
    )

    dmesh = jax.make_mesh((4,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    ws, ds, gs = (sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    srcs = sh.shard_state(src0)
    w2, d2, g2 = sh.step_fixed(ws, ds, gs, num_newton=2, source=srcs)
    np.testing.assert_allclose(
        sh.gather_state(w2), np.asarray(w1), rtol=1e-6, atol=1e-9
    )


def test_sharded_coupled_fem_dem_matches_single():
    """Coupled FEM-DEM (BASELINE config #5) on an 8-device mesh: the
    sharded fluid + replicated DEM staggered step must match the
    single-chip CoupledSolver (same particles, same drag exchange) up to
    reduction order. Closes the round-1 gap 'CoupledSolver wraps NSSolver
    only' (VERDICT item 5)."""
    import jax.numpy as jnp

    from dedflow_tpu.app.coupled import CoupledSolver
    from dedflow_tpu.app.scenarios import coupled_scenario_setup

    mesh = box_mesh(8, 4, 4)
    cfg = reference_scenario_config()
    ccfg, pstate0 = coupled_scenario_setup(mesh, num_particles=32, substeps=4)
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)

    single = CoupledSolver(mesh, cfg, ccfg)
    wg_s, _, dwg_s, pst_s, _ = single.step(
        jnp.asarray(wg0), jnp.asarray(dwgold0), jnp.asarray(dwg0), pstate0
    )

    dmesh = jax.make_mesh((8,), ("dd",))
    sh = CoupledSolver(mesh, cfg, ccfg, device_mesh=dmesh)
    state = tuple(sh.fluid.shard_state(x) for x in (wg0, dwgold0, dwg0))
    wg_p, _, dwg_p, pst_p, _ = sh.step(*state, pstate0)

    np.testing.assert_allclose(
        sh.fluid.gather_state(wg_p), np.asarray(wg_s), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(pst_p.x), np.asarray(pst_s.x), rtol=1e-8, atol=1e-12
    )
    # particles actually moved (the coupling is live, not a no-op)
    assert float(np.abs(np.asarray(pst_p.x) - pstate0.x).max()) > 0.0
