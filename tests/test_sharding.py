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


def test_sharded_irregular_delaunay_matches_single_chip():
    """The IRREGULAR tier under domain decomposition: a Delaunay mesh
    (no translation structure anywhere) RCB-partitioned over 8 devices,
    assembled with the degree-tiered gather plan, must match the
    single-chip solver (VERDICT r4 next #7: halo-exchange correctness on
    the irregular tier)."""
    import dataclasses

    from dedflow_tpu.mesh.gen import delaunay_mesh

    mesh = delaunay_mesh(500, seed=7)
    cfg = dataclasses.replace(
        reference_scenario_config(), bcs=(), scatter_method="tiered"
    )
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)

    ref = NSSolver(mesh, dataclasses.replace(cfg, use_lattice="gather"))
    w1, d1, g1 = ref.step_fixed(
        jax.numpy.asarray(wg0), jax.numpy.asarray(dwgold0),
        jax.numpy.asarray(dwg0), num_newton=2,
    )

    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    assert sh.info is not None  # RCB path, not a lattice slab
    ws, ds, gs = (sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    w2, d2, g2 = sh.step_fixed(ws, ds, gs, num_newton=2)

    np.testing.assert_allclose(
        sh.gather_state(w2), np.asarray(w1), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        sh.gather_state(g2), np.asarray(g1), rtol=1e-6, atol=1e-8
    )


def test_sharded_residual_matches():
    import dataclasses

    mesh = box_mesh(3, 3, 4)
    # force the RCB/GSPMD general path (box meshes otherwise take the
    # slab-sharded lattice fast path, tested separately below)
    cfg = dataclasses.replace(reference_scenario_config(), use_lattice="gather")
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_coupled_fem_dem_matches_single():
    """Coupled FEM-DEM (BASELINE config #5) on an 8-device mesh: the
    sharded fluid + replicated DEM staggered step must match the
    single-chip CoupledSolver (same particles, same drag exchange) up to
    reduction order. Closes the round-1 gap 'CoupledSolver wraps NSSolver
    only' (VERDICT item 5)."""
    import jax.numpy as jnp

    from dedflow_tpu.app.coupled import CoupledSolver
    from dedflow_tpu.app.scenarios import coupled_scenario_setup

    # 7x3x3 -> N = 128 = 8 x 16: the sharded fluid takes the slab-sharded
    # lattice path (no fallback double-build), keeping this test fast
    mesh = box_mesh(7, 3, 3)
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


def test_ppermute_halo_spmv_matches_and_no_allgather():
    """The banded DIA SpMV communicates ONLY two ppermute boundary bands:
    results equal the single-device matvec, and the compiled HLO contains
    collective-permute but NO all-gather (VERDICT round-1 item 6: prove
    halo locality instead of full-vector gathering)."""
    import dataclasses

    import jax.numpy as jnp

    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem.lattice import assemble_jacobian_t
    from dedflow_tpu.parallel.spmd import dia_matvec_ppermute
    from jax.sharding import NamedSharding, PartitionSpec as P

    # lattice sized so N is a multiple of 8 with local rows >= dmax:
    # 7x7x7 box -> N = 512 = 8 * 64; dmax = 1 + 8 + 64 = 73 > 64? no:
    # dmax must be <= local rows; use 8 devices over z-slabs of 15^3?
    # N = (n+1)^3 must be divisible by 8 -> n+1 in {8, 16}: n = 15 ->
    # N = 4096, local 512, dmax = 1 + 16 + 256 = 273 <= 512. OK.
    mesh = box_mesh(15, 15, 15)
    cfg = reference_scenario_config()
    solver = NSSolver(mesh, dataclasses.replace(cfg, use_lattice="on"))
    from dedflow_tpu.app.scenarios import reference_initial_state as init

    wg, dwgold, dwg = (jnp.asarray(x) for x in init(mesh))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    jmat = assemble_jacobian_t(
        solver.lctx, solver.face_ctxs, solver.mask, wa, dwa,
        cfg.physics, cfg.time,
    )
    x = jnp.asarray(np.random.RandomState(0).randn(6, mesh.num_node))
    y_ref = jmat.matvec_t(x)

    dmesh = jax.make_mesh((8,), ("dd",))
    mv = dia_matvec_ppermute(dmesh, "dd", jmat.offsets)
    data_sh = jax.device_put(
        jmat.data, NamedSharding(dmesh, P(None, None, "dd"))
    )
    scal_sh = jax.device_put(
        jmat.scal, NamedSharding(dmesh, P(None, "dd"))
    )
    x_sh = jax.device_put(x, NamedSharding(dmesh, P(None, "dd")))
    mv_c = jax.jit(mv).lower(data_sh, scal_sh, x_sh).compile()
    y = mv_c(data_sh, scal_sh, x_sh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-11)

    hlo = mv_c.as_text()
    assert "collective-permute" in hlo, "expected ppermute halo exchange"
    assert "all-gather" not in hlo, "full-vector all_gather in halo SpMV"


def test_rcb_halo_spmv_matches_and_no_allgather():
    """The GENERAL (RCB/unstructured) sharded ELL SpMV with explicit
    boundary-band exchange (spmd.fsbsr_matvec_halo): matches the
    single-device matvec, and the compiled HLO contains ppermutes but no
    all_gather (round-2 VERDICT item 6 - the previous explicit path
    all_gathered the full (N, 6) state by design)."""
    import dataclasses

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dedflow_tpu.fem import ns
    from dedflow_tpu.parallel.spmd import fsbsr_matvec_halo

    mesh = box_mesh(5, 4, 6)
    cfg = dataclasses.replace(reference_scenario_config(), use_lattice="gather")
    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)
    wg, dwgold, dwg = (sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    jmat = ns.assemble_jacobian(
        sh.ctx, sh.face_ctxs, sh.mask, wa, dwa, cfg.physics, cfg.time
    )
    n_pad = sh.pmesh.num_node
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(n_pad, 6))
    x = jax.device_put(jnp.asarray(x_np, dtype=sh.dtype), sh.sharding)
    y_ref = np.asarray(jmat.matvec(x))

    mv = fsbsr_matvec_halo(dmesh, "dd", np.asarray(jmat.ell_col), 8)
    data_sh = jax.device_put(
        jmat.data, NamedSharding(dmesh, P("dd"))
    )
    mv_c = jax.jit(mv).lower(data_sh, x).compile()
    y = np.asarray(mv_c(data_sh, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-10, atol=1e-12)

    hlo = mv_c.as_text()
    assert "collective-permute" in hlo, "expected boundary-band ppermutes"
    assert "all-gather" not in hlo, "O(N) all_gather in RCB halo SpMV"


def test_sharded_fused_kernels_shmap_match_single_chip():
    """The fused Pallas carry kernels run PER SHARD under shard_map (the
    kernel's final carry is the inter-chip halo; round-2 VERDICT item 5):
    residual, Jacobian and the DIA SpMV match the single-chip path, and
    the sharded Jacobian HLO contains collective-permutes but no O(N)
    all-gather."""
    import dataclasses
    import re

    import jax.numpy as jnp

    from dedflow_tpu.fem import lattice as lat
    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem.lattice import (
        assemble_jacobian_t,
        assemble_residual_t,
    )

    mesh = box_mesh(10, 7, 9)
    cfg = dataclasses.replace(
        reference_scenario_config(), lattice_backend="pallas"
    )
    dmesh = jax.make_mesh((8,), ("dd",))
    from dedflow_tpu.sparse import dia_kernels as dk

    old = lat.INTERPRET_FUSED
    lat.INTERPRET_FUSED = dk.INTERPRET = True  # CPU: interpret Mosaic
    try:
        sh = ShardedNSSolver(mesh, cfg, dmesh, dtype=jnp.float32)
        assert sh.lattice and sh.ctx.shard is not None
        assert sh.pad_nodes > 0  # node space padded to nparts * block

        single = NSSolver(
            mesh, dataclasses.replace(cfg, lattice_backend="xla"),
            dtype=jnp.float32,
        )
        wg0, dwgold0, dwg0 = reference_initial_state(mesh)
        wg_s, dwgold_s, dwg_s = (
            jnp.asarray(x, jnp.float32) for x in (wg0, dwgold0, dwg0)
        )
        wa_s, dwa_s = ns.alpha_states(wg_s, dwgold_s, dwg_s, cfg.time)
        f_ref = assemble_residual_t(
            single.lctx, single.face_ctxs, single.mask, wa_s, dwa_s,
            cfg.physics, cfg.time,
        )
        j_ref = assemble_jacobian_t(
            single.lctx, single.face_ctxs, single.mask, wa_s, dwa_s,
            cfg.physics, cfg.time,
        )

        state = tuple(sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
        wa_p, dwa_p = ns.alpha_states(*state, cfg.time)
        f_sh = assemble_residual_t(
            sh.ctx, sh.face_ctxs, sh.mask, wa_p, dwa_p,
            cfg.physics, cfg.time,
        )
        n = mesh.num_node
        scale = float(jnp.abs(f_ref).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(f_sh[:, :n]) / scale,
            np.asarray(f_ref) / scale,
            atol=2e-6,
        )
        # padded rows carry nothing
        assert float(jnp.abs(f_sh[:, n:]).max()) == 0.0

        jfun = jax.jit(
            lambda ctx, fc, m, wa, dwa: assemble_jacobian_t(
                ctx, fc, m, wa, dwa, cfg.physics, cfg.time
            )
        )
        comp = jfun.lower(
            sh.ctx, sh.face_ctxs, sh.mask, wa_p, dwa_p
        ).compile()
        j_sh = comp(sh.ctx, sh.face_ctxs, sh.mask, wa_p, dwa_p)
        jscale = float(jnp.abs(j_ref.data).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(j_sh.data[:, :, :n]) / jscale,
            np.asarray(j_ref.data) / jscale,
            atol=2e-6,
        )
        hlo = comp.as_text()
        assert re.findall(r"collective-permute", hlo)
        for m in re.finditer(r"= (\w+)\[(\d+),(\d+)\][^\n]*all-gather", hlo):
            rows, lanes = int(m.group(2)), int(m.group(3))
            assert rows <= 48 or lanes < n, m.group(0)[:200]

        # sharded Pallas SpMV (2-ppermute boundary bands) == single-chip
        x_t = jnp.asarray(
            np.random.RandomState(3).randn(6, j_sh.data.shape[2]),
            jnp.float32,
        )
        y_sh = j_sh.matvec_t(x_t)
        y_ref = j_ref.matvec_t(x_t[:, :n])
        yscale = float(jnp.abs(y_ref).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(y_sh[:, :n]) / yscale,
            np.asarray(y_ref) / yscale,
            atol=2e-5,
        )
    finally:
        lat.INTERPRET_FUSED = dk.INTERPRET = old


@pytest.mark.slow
def test_sharded_lattice_step_exact():
    """Lattice meshes shard as contiguous slabs with the gather-free fast
    path: a full sharded step equals single-chip to near machine
    precision (dense ops; only GSPMD fusion boundaries reassociate).
    Slow (two full 2-Newton steps on 8 virtual devices); the quick-suite
    communication guarantee lives in
    test_sharded_lattice_jacobian_halo_collectives."""
    import jax.numpy as jnp

    mesh = box_mesh(10, 7, 9)
    cfg = reference_scenario_config()
    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    assert sh.lattice, "box mesh should take the slab-sharded lattice path"

    single = NSSolver(mesh, cfg)
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)
    out_s = single.step_fixed(
        *(jnp.asarray(x) for x in (wg0, dwgold0, dwg0)), num_newton=2
    )
    state = tuple(sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    out_p = sh.step_fixed(*state, num_newton=2)
    for a, b in zip(out_s, out_p):
        scale = float(jnp.abs(a).max()) + 1e-30
        np.testing.assert_allclose(
            sh.gather_state(b) / scale, np.asarray(a) / scale, atol=1e-11
        )


def test_sharded_lattice_jacobian_halo_collectives():
    """The compiled sharded-Jacobian HLO moves halos with
    collective-permute - it never all-gathers an O(N) operand (VERDICT
    round-1 item 6). Compile-only: no sharded execution."""
    import re

    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem.lattice import assemble_jacobian_t

    mesh = box_mesh(10, 7, 9)
    cfg = reference_scenario_config()
    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(mesh, cfg, dmesh)
    assert sh.lattice, "box mesh should take the slab-sharded lattice path"

    wg0, dwgold0, dwg0 = reference_initial_state(mesh)
    state = tuple(sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
    # HLO of the sharded Jacobian assembly: halos ride collective-permute;
    # nothing all-gathers an O(N)-sized operand (only O(surface) facet
    # scatters and O(1) reductions may gather).
    wa, dwa = ns.alpha_states(*state, cfg.time)
    phys, scheme = cfg.physics, cfg.time

    def jac(ctx, fctx, mask, wa, dwa):
        return assemble_jacobian_t(ctx, fctx, mask, wa, dwa, phys, scheme)

    c = (
        jax.jit(jac)
        .lower(sh.ctx, sh.face_ctxs, sh.mask, wa, dwa)
        .compile()
    )
    hlo = c.as_text()
    assert len(re.findall(r"collective-permute", hlo)) > 0
    # The only permitted all-gathers are thin: the state-halo pads
    # (<= 16 rows x N) and O(surface) facet blocks (lanes << N); the
    # O(27N) input builds and O(18N)-per-plane face updates must stay
    # shard-local (collective-permute halos).
    for m in re.finditer(r"= (\w+)\[(\d+),(\d+)\][^\n]*all-gather", hlo):
        rows, lanes = int(m.group(2)), int(m.group(3))
        assert rows <= 16 or lanes < mesh.num_node, m.group(0)[:200]


def test_sharded_mg_schur_pc():
    """pc='mg' on the shard_map lattice path (VERDICT r3 item 2).

    Two properties:
    1. The distributed V-cycle is ARITHMETICALLY IDENTICAL to the
       single-chip cycle on the same (slab-truncated) hierarchy - slab
       cuts align with whole 2x2x2 aggregates and every level matvec
       exchanges its stencil halo (solver.mg.ScalarDIALevel.matvec), so
       sharding changes nothing but the execution layout.
    2. It is a much stronger preconditioner than fieldsplit: at a fixed
       f32 GMRES budget the MG residual is >= 10x lower. (No absolute
       convergence bar: at this size/precision NO pc reaches 1e-5 in 200
       f32 iterations - measured mg 6e-4 vs fieldsplit 4e-2.)
    """
    import dataclasses

    import jax.numpy as jnp

    from dedflow_tpu.fem import lattice as lat
    from dedflow_tpu.solver.krylov import gmres
    from dedflow_tpu.solver.mg import MGSIMPLEPCT, build_hierarchy, vcycle
    from dedflow_tpu.solver.newton import assemble_system
    from dedflow_tpu.solver.pc import NSFieldSplitPCT
    from dedflow_tpu.sparse import dia_kernels as dk

    mesh = box_mesh(15, 15, 15)  # sz = 256 divides the 1024-row slabs
    cfg = dataclasses.replace(
        reference_scenario_config(), lattice_backend="pallas",
        krylov=dataclasses.replace(
            reference_scenario_config().krylov, pc="mg"
        ),
    )
    dmesh = jax.make_mesh((8,), ("dd",))
    old = lat.INTERPRET_FUSED
    old_dk = dk.INTERPRET
    lat.INTERPRET_FUSED = dk.INTERPRET = True
    try:
        sh = ShardedNSSolver(mesh, cfg, dmesh, dtype=jnp.float32)
        assert sh.lattice and sh.ctx.shard is not None
        wg0, dwgold0, dwg0 = reference_initial_state(mesh)
        state = tuple(sh.shard_state(x) for x in (wg0, dwgold0, dwg0))
        jmat, pc = assemble_system(
            sh.ctx, sh.face_ctxs, sh.mask, *state, cfg.physics, cfg.time,
            pc_type="mg",
        )
        assert isinstance(pc, MGSIMPLEPCT) and pc.shard is not None
        assert len(pc.levels) >= 2

        # 1. exact match with the single-chip cycle on the global grid
        # (padded z-planes are dead rows: zero stencils, unit diagonals)
        ntot = jmat.data.shape[-1]
        gdims = (16, 16, ntot // 256)
        levels_g = build_hierarchy(
            pc.bands.app, jmat.offsets, gdims, min_nodes=1,
            max_levels=len(pc.levels),
        )
        assert tuple(lv.dims[2] * 8 for lv in pc.levels) == tuple(
            lv.dims[2] for lv in levels_g
        )
        rng = np.random.default_rng(3)
        r = jnp.asarray(rng.standard_normal(ntot).astype(np.float32))
        y_g = np.asarray(vcycle(levels_g, r, omega=pc.omega))
        y_s = np.asarray(pc._vcycle(r))
        np.testing.assert_array_equal(y_g, y_s)

        # 2. full PC apply is finite and beats fieldsplit at a fixed
        # iteration budget by a wide residual margin
        f = jnp.asarray(rng.standard_normal((6, ntot)).astype(np.float32))
        # padded tail rows are unit-diagonal; keep the rhs there zero
        f = f.at[:, mesh.num_node :].set(0.0)
        y = pc(f)
        assert bool(jnp.all(jnp.isfinite(y)))
        kw = dict(maxit=200, atol=0.0, rtol=1e-5)
        sol_mg = gmres(jmat.matvec_t, f, pc=pc, **kw)
        sol_fs = gmres(
            jmat.matvec_t, f,
            pc=NSFieldSplitPCT.from_diag_rows(jmat.diag_rows()), **kw
        )
        rel_mg = float(sol_mg.resnorm) / float(sol_mg.resnorm0)
        rel_fs = float(sol_fs.resnorm) / float(sol_fs.resnorm0)
        assert np.isfinite(rel_mg) and rel_mg * 10.0 < rel_fs, (rel_mg, rel_fs)
    finally:
        lat.INTERPRET_FUSED = old
        dk.INTERPRET = old_dk
