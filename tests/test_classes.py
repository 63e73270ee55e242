"""Translation-class fast path (fem.lattice.build_class_context).

The reference assembles any tet mesh loaded from file with no structure
assumption (AssembleSystemTet, assemble.cu:1467-1762). The TPU fast path
must therefore work for meshes WITHOUT generator metadata: the class
detector groups elements by their vertex-offset signature from `ien`
alone and runs the static-shift lattice machinery per class. Unlike
mesh.recover (which needs axis-aligned tensor-product coordinates), this
is geometry-blind: deformed/graded grids qualify; irregular meshes fall
back to the gather path.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns
from dedflow_tpu.fem.lattice import (
    assemble_jacobian_t,
    assemble_residual_t,
    build_class_context,
    detect_delta_classes,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.solver.newton import NSSolver


def _deformed(mesh: Mesh, amp=0.08) -> Mesh:
    """Strip generator metadata and smoothly deform the coordinates:
    recover_lattice's tensor-grid condition fails, but the connectivity
    is still translation-regular (6 classes)."""
    xg = np.asarray(mesh.xg).copy()
    xg = xg + amp * np.sin(3.0 * xg[:, [1, 2, 0]])
    return Mesh(
        xg=xg, ien=np.asarray(mesh.ien).copy(), boundaries=mesh.boundaries
    )


def test_detect_classes_box():
    mesh = box_mesh(4, 3, 5)
    det = detect_delta_classes(np.asarray(mesh.ien))
    assert det is not None
    keys, cls_id, base = det
    assert keys.shape == (6, 4)  # the Kuhn split
    assert cls_id.size == mesh.num_tet
    # base is the min vertex and every key has one zero entry
    assert (keys.min(axis=1) == 0).all()


def test_detect_rejects_irregular():
    # random node renumbering destroys translation regularity
    mesh = box_mesh(4, 4, 4)
    rng = np.random.RandomState(0)
    rp = rng.permutation(mesh.num_node)
    ien = rp[np.asarray(mesh.ien)]
    assert detect_delta_classes(ien) is None
    m = Mesh(xg=np.asarray(mesh.xg)[np.argsort(rp)], ien=ien, boundaries=[])
    assert build_class_context(m) is None


def test_class_context_on_deformed_mesh():
    """The class path must reproduce the gather path exactly on a mesh
    recover_lattice cannot handle (deformed coordinates, no metadata)."""
    mesh = box_mesh(4, 3, 5)
    m2 = _deformed(mesh)
    cfg = reference_scenario_config()
    gen = NSSolver(m2, dataclasses.replace(cfg, use_lattice="gather"))
    cls = NSSolver(m2, dataclasses.replace(cfg, use_lattice="off"))
    assert gen.lctx is None
    assert cls.lctx is not None and cls.lctx.dims is None
    assert len(cls.lctx.deltas) == 6

    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(m2))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)

    f_gen = ns.assemble_residual(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time, True
    )
    f_cls = assemble_residual_t(
        cls.lctx, cls.face_ctxs, cls.mask, wa, dwa, cfg.physics, cfg.time,
        True,
    )
    np.testing.assert_allclose(
        np.asarray(f_cls.T), np.asarray(f_gen), rtol=1e-9, atol=1e-12
    )

    j_gen = ns.assemble_jacobian(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time
    )
    j_cls = assemble_jacobian_t(
        cls.lctx, cls.face_ctxs, cls.mask, wa, dwa, cfg.physics, cfg.time
    )
    x = jnp.asarray(np.random.RandomState(0).randn(m2.num_node, 6))
    y_gen = np.asarray(j_gen.matvec(x))
    y_cls = np.asarray(j_cls.matvec_t(x.T).T)
    scale = np.abs(y_gen).max()
    np.testing.assert_allclose(
        y_cls / scale, y_gen / scale, rtol=1e-9, atol=1e-11
    )


def test_class_path_newton_step_matches_gather():
    """One full Newton step (solve included) agrees between the class
    fast path and the gather oracle on a metadata-free mesh."""
    mesh = box_mesh(4, 4, 4)
    m2 = _deformed(mesh, amp=0.05)
    cfg = reference_scenario_config()
    gen = NSSolver(m2, dataclasses.replace(cfg, use_lattice="gather"))
    cls = NSSolver(m2, dataclasses.replace(cfg, use_lattice="off"))
    assert cls.lctx is not None
    state = tuple(jnp.asarray(x) for x in reference_initial_state(m2))
    wg1, dwg1, _, st1 = gen.step(*state)
    wg2, dwg2, _, st2 = cls.step(*state)
    scale = np.abs(np.asarray(wg1)).max()
    np.testing.assert_allclose(
        np.asarray(wg2) / scale, np.asarray(wg1) / scale,
        rtol=5e-7, atol=5e-9,
    )
    # both must have converged to the same Newton residual class
    np.testing.assert_allclose(
        np.asarray(st2.rnorms[-1]), np.asarray(st1.rnorms[-1]),
        rtol=1e-3, atol=1e-12,
    )


def test_gather_mode_forces_general_path():
    mesh = box_mesh(3, 3, 3)  # carries lattice metadata
    cfg = dataclasses.replace(
        reference_scenario_config(), use_lattice="gather"
    )
    s = NSSolver(mesh, cfg)
    assert s.lctx is None


@pytest.mark.slow
def test_sharded_class_step_matches_single_chip():
    """A metadata-free translation-regular mesh (deformed box) takes the
    slab-sharded fast path in ShardedNSSolver via class detection; a full
    fixed-Newton step equals single-chip to near machine precision."""
    import jax

    from dedflow_tpu.parallel.sharded import ShardedNSSolver

    mesh = box_mesh(10, 7, 9)  # N = 880 = 8 * 110
    m2 = _deformed(mesh, amp=0.03)
    m2.boundaries = mesh.boundaries  # keep the scenario's BC tables
    cfg = reference_scenario_config()
    dmesh = jax.make_mesh((8,), ("dd",))
    sh = ShardedNSSolver(m2, cfg, dmesh)
    assert sh.lattice, "deformed box should take the class-sharded path"
    assert sh.solver.lctx.dims is None  # class tier, not box recovery

    single = NSSolver(m2, cfg)
    assert single.lctx is not None
    wg0, dwgold0, dwg0 = reference_initial_state(m2)
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


def test_partial_box_classes():
    """An L-shaped subset of the lattice (cells removed, nodes kept) is
    still translation-regular: classes detected, assembly matches."""
    mesh = box_mesh(4, 4, 4)
    ien = np.asarray(mesh.ien)
    xg = np.asarray(mesh.xg)
    # drop all elements whose centroid is in the (+x, +y) quadrant corner
    cent = xg[ien].mean(axis=1)
    keep = ~((cent[:, 0] > 0.5) & (cent[:, 1] > 0.5))
    m = Mesh(xg=xg.copy(), ien=ien[keep].copy(), boundaries=[])
    det = detect_delta_classes(np.asarray(m.ien))
    assert det is not None and det[0].shape[0] == 6
    lctx = build_class_context(m, dtype=jnp.float64)
    assert lctx is not None

    # the bare mesh has no boundary tables: strip the scenario's BCs
    cfg = dataclasses.replace(reference_scenario_config(), bcs=())
    gen = NSSolver(m, dataclasses.replace(cfg, use_lattice="gather"))
    cls = NSSolver(m, dataclasses.replace(cfg, use_lattice="off"))
    assert cls.lctx is not None
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(m))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    f_gen = ns.assemble_residual(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time, True
    )
    f_cls = assemble_residual_t(
        cls.lctx, cls.face_ctxs, cls.mask, wa, dwa, cfg.physics, cfg.time,
        True,
    )
    np.testing.assert_allclose(
        np.asarray(f_cls.T), np.asarray(f_gen), rtol=1e-9, atol=1e-12
    )
