"""Lattice fast path (fem.lattice) vs the general unstructured path.

The structured path must be numerically equivalent (same weak form, same
face terms, same BC masking) - only the execution strategy differs
(static shifted slices vs gathers/scatters; component-major DIA vs ELL).
Reference parity anchors are the same as the general path's
(AssembleSystemTet assemble.cu:1467-1762, MatrixFS matrix.h:93-103).
"""

import dataclasses

import jax
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
    build_lattice_context,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.solver.newton import NSSolver
from dedflow_tpu.solver.pc import NSFieldSplitPC, NSFieldSplitPCT


@pytest.fixture(scope="module")
def solvers():
    mesh = box_mesh(4, 3, 5)  # non-cubic: catches stride mixups
    cfg = reference_scenario_config()
    gen = NSSolver(mesh, dataclasses.replace(cfg, use_lattice="gather"))
    lat = NSSolver(mesh, dataclasses.replace(cfg, use_lattice="on"))
    assert lat.lctx is not None
    wg, dwgold, dwg = reference_initial_state(mesh)
    return mesh, cfg, gen, lat, tuple(jnp.asarray(x) for x in (wg, dwgold, dwg))


def _alpha(cfg, state):
    return ns.alpha_states(*state, cfg.time)


def test_lattice_metadata_set():
    assert box_mesh(3, 4, 5).lattice == (3, 4, 5)


def test_residual_matches_general(solvers):
    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    f_gen = ns.assemble_residual(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time, True
    )
    f_lat = assemble_residual_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa, dwa, cfg.physics, cfg.time, True
    )
    np.testing.assert_allclose(
        np.asarray(f_lat.T), np.asarray(f_gen), rtol=1e-11, atol=1e-13
    )


def test_jacobian_matches_general(solvers):
    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    j_gen = ns.assemble_jacobian(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time
    )
    j_lat = assemble_jacobian_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa, dwa, cfg.physics, cfg.time
    )
    dg = j_gen.to_block_dense()
    dl = j_lat.to_block_dense()
    scale = np.abs(dg).max()
    np.testing.assert_allclose(dl / scale, dg / scale, atol=1e-12)


def test_matvec_matches_and_layouts_agree(solvers):
    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    j_gen = ns.assemble_jacobian(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time
    )
    j_lat = assemble_jacobian_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa, dwa, cfg.physics, cfg.time
    )
    x = jnp.asarray(np.random.RandomState(0).randn(mesh.num_node, 6))
    y_gen = j_gen.matvec(x)
    y_t = j_lat.matvec_t(x.T).T
    y_wrap = j_lat.matvec(x)  # compatibility wrapper
    np.testing.assert_allclose(np.asarray(y_t), np.asarray(y_gen), rtol=1e-11)
    np.testing.assert_allclose(np.asarray(y_wrap), np.asarray(y_t), rtol=1e-14)


def test_pc_matches_general(solvers):
    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    j_gen = ns.assemble_jacobian(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time
    )
    j_lat = assemble_jacobian_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa, dwa, cfg.physics, cfg.time
    )
    pc_gen = NSFieldSplitPC.from_matrix(j_gen)
    pc_lat = NSFieldSplitPCT.from_diag_rows(j_lat.diag_rows())
    x = jnp.asarray(np.random.RandomState(1).randn(mesh.num_node, 6))
    np.testing.assert_allclose(
        np.asarray(pc_lat(x.T).T), np.asarray(pc_gen(x)), rtol=1e-10
    )


def test_full_step_matches_general(solvers):
    mesh, cfg, gen, lat, state = solvers
    out_g = gen.step_fixed(*state, num_newton=2)
    out_l = lat.step_fixed(*state, num_newton=2)
    for a, b in zip(out_g, out_l):
        scale = float(jnp.abs(a).max()) + 1e-30
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=5e-9
        )


def test_auto_gating():
    """auto uses the lattice on box meshes and translation-class
    detection on metadata-free meshes; chunked configs and
    use_lattice='gather' get the general path."""
    mesh = box_mesh(3, 3, 3)
    cfg = reference_scenario_config()
    assert NSSolver(mesh, cfg).lctx is not None
    cfg2 = dataclasses.replace(cfg, assembly_chunk=27)
    assert NSSolver(mesh, cfg2).lctx is None
    mesh_no = box_mesh(3, 3, 3)
    mesh_no.lattice = None
    s_no = NSSolver(mesh_no, cfg)
    # metadata-free but translation-regular: the CLASS tier kicks in
    # (geometry-blind, so no MG node grid)
    assert s_no.lctx is not None and s_no.lctx.dims is None
    cfg3 = dataclasses.replace(cfg, use_lattice="gather")
    assert NSSolver(mesh_no, cfg3).lctx is None


def test_dead_cell_padding_is_exact_zero():
    """Pad/dead-cell element contributions must vanish identically, not
    approximately - boundary nodes read them via the underflow trick."""
    mesh = box_mesh(2, 2, 2)
    lctx = build_lattice_context(mesh, rows_backend="xla")
    n = mesh.num_node
    # geometry rows of dead cells (ix==nx etc.) are exactly zero
    lg = np.asarray(lctx.lhs_geom)  # (6, 16, npad + dmax) slab-major
    cells = np.arange(n)
    sy, sz = 3, 9
    live = (cells % sy < 2) & ((cells // sy) % 3 < 2) & (cells // sz < 2)
    for t in range(6):
        slab = lg[t, :, lctx.dmax : lctx.dmax + n]
        assert np.all(slab[:, ~live] == 0.0)


@pytest.mark.slow
def test_simple_pc_cuts_iterations(solvers):
    """SIMPLE pressure-Schur PC: >=2x fewer GMRES iterations than the
    reference's block-Jacobi decomposition at the same converged Newton
    residuals (VERDICT round-1 item 3; goes beyond pc.c:116-158)."""
    from dedflow_tpu.app.scenarios import (
        lid_driven_cavity_config,
        lid_driven_cavity_initial_state,
    )

    mesh = box_mesh(8, 8, 8)
    base = lid_driven_cavity_config()
    iters = {}
    norms = {}
    for pc, lat in (("fieldsplit", "auto"), ("simple", "auto"),
                    ("simple", "gather")):
        cfg = dataclasses.replace(
            base, use_lattice=lat,
            krylov=dataclasses.replace(base.krylov, pc=pc, max_iter=300),
        )
        s = NSSolver(mesh, cfg)
        state = tuple(
            jnp.asarray(x) for x in lid_driven_cavity_initial_state(mesh)
        )
        _, _, _, stats = s.step(*state)
        iters[(pc, lat)] = sum(stats.krylov_iters)
        norms[(pc, lat)] = np.asarray(stats.rnorms[-1])
    # both the lattice (SIMPLEPCT) and general-ELL (SIMPLEPC) variants
    assert iters[("simple", "auto")] * 2 <= iters[("fieldsplit", "auto")], iters
    assert iters[("simple", "gather")] * 2 <= iters[("fieldsplit", "auto")], iters
    # both solves stop at the same GMRES rtol (1e-4), so the converged
    # Newton residuals agree to that order, not to machine precision
    np.testing.assert_allclose(
        norms[("simple", "auto")], norms[("fieldsplit", "auto")],
        rtol=1e-2, atol=1e-12,
    )


def test_face_lhs_packed_matches_elements(solvers):
    """The direct packed facet-Jacobian build == the dense-block oracle
    (face_lhs_elements, assemble.cu:1127-1193)."""
    from dedflow_tpu.fem.face import face_lhs_elements, face_lhs_packed
    from dedflow_tpu.sparse.fsbsr import COMP_SLOTS

    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    for fctx in gen.face_ctxs:
        packed = face_lhs_packed(fctx, wa, dwa, cfg.physics, cfg.time)
        ej = face_lhs_elements(fctx, wa, dwa, cfg.physics, cfg.time)
        flat = np.asarray(ej).reshape(fctx.num_facet * 16, 6, 6)
        expect = np.stack([flat[:, bi, bj] for _, bi, bj in COMP_SLOTS], -1)
        np.testing.assert_allclose(np.asarray(packed), expect, atol=1e-13)


def test_face_lhs_static_split_matches_full(solvers):
    """Precomputed-static + backflow-scalar facet band == the full
    per-call packed band (the state-dependence split is exactly the
    backflow term, assemble.cu:1079-1080)."""
    import dataclasses as dc

    from dedflow_tpu.fem import face as ff

    mesh, cfg, gen, lat, state = solvers
    wa, dwa = _alpha(cfg, state)
    # make the backflow term ACTIVE (u.n < 0 somewhere on the boundary)
    wa = wa.at[:, :3].add(
        jnp.asarray(
            np.random.default_rng(7).standard_normal((mesh.num_node, 3))
        )
    )
    d = len(lat.lctx.offsets)
    for fctx in lat.face_ctxs:
        if fctx.band_gidx is None:
            continue
        full = ff.face_dia_band_grouped(
            fctx, ff.face_lhs_packed(fctx, wa, dwa, cfg.physics, cfg.time), d
        )
        fctx_s = fctx
        if fctx_s.lhs_static_band is None:
            fctx_s = dc.replace(
                fctx,
                lhs_static_band=ff.face_lhs_static_band(
                    fctx, cfg.physics, cfg.time, d, wa.dtype
                ),
            )
        split = ff.face_lhs_band_split(
            fctx_s, wa, cfg.physics, cfg.time, d
        )
        np.testing.assert_allclose(
            np.asarray(split), np.asarray(full), rtol=1e-12, atol=1e-13
        )


def test_face_dia_band_grouped_matches_slot_plan():
    """The wide-row grouped facet band (face_dia_band_grouped) equals the
    counting-sort slot-plan band on random updates (incl. the
    precision='highest' guard against bf16 einsum lowering on TPU)."""
    import numpy as np

    from dedflow_tpu.app.scenarios import reference_scenario_config
    from dedflow_tpu.fem import face as ff
    from dedflow_tpu.fem.assembly import build_context
    from dedflow_tpu.mesh.gen import box_mesh
    from dedflow_tpu.sparse.topology import build_sparsity

    mesh = box_mesh(6, 6, 6)
    cfg = reference_scenario_config()
    sp = build_sparsity(mesh.ien, mesh.num_node, extra_ien=mesh.extra_cells)
    ctx = build_context(mesh, sp)
    b = [bc.boundary for bc in cfg.bcs if bc.weak][0]
    fctx = ff.build_face_context(mesh, ctx, sp, b)
    assert fctx.band_gidx is not None
    rng = np.random.default_rng(0)
    upd = jnp.asarray(rng.standard_normal((fctx.num_facet * 16, 18)))
    d = len(ctx.dia_offsets)
    a1 = ff.face_dia_band(fctx, upd, d)
    a2 = ff.face_dia_band_grouped(fctx, upd, d)
    np.testing.assert_allclose(
        np.asarray(a1), np.asarray(a2), rtol=1e-10, atol=1e-10
    )
