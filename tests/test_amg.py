"""Algebraic multigrid (solver.amg) on irregular meshes.

The reference's PCAMGX preconditions ANY CSR matrix (pc.c:160-235); these
tests pin the TPU-native counterpart: RCM-block unsmoothed aggregation
with precomputed index maps. Oracle = explicit NumPy P^T A P products and
the windowed-path matrices of tests/test_win_assembly.py's regime.
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
from dedflow_tpu.fem.win_assembly import build_win_context, jacobian_win
from dedflow_tpu.mesh.gen import delaunay_mesh
from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh
from dedflow_tpu.solver.amg import (
    _B,
    AMGIndices,
    AMGSchurPCT,
    _matvec,
    build_amg_plan,
    build_values,
    vcycle,
)
from dedflow_tpu.sparse.topology import build_sparsity


def _mesh_and_jmat(npts=900, seed=5):
    mesh = delaunay_mesh(npts, seed=seed)
    mesh = reorder_mesh(mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node))
    sp = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    ctx = build_win_context(
        mesh, sp, backend="xla", with_amg=True, amg_min_nodes=64
    )
    cfg = reference_scenario_config()
    cfg = dataclasses.replace(cfg, bcs=())
    wg, dwgold, dwg = reference_initial_state(mesh)
    wa, dwa = ns.alpha_states(
        *(jnp.asarray(x, jnp.float64) for x in (wg, dwgold, dwg)), cfg.time
    )
    jmat = jacobian_win(ctx, wa, cfg.physics, cfg.time, backend="xla")
    return mesh, sp, ctx, jmat


def test_amg_level0_matches_app():
    """Level-0 matvec == the matrix's own A_pp matvec."""
    mesh, sp, ctx, jmat = _mesh_and_jmat()
    idx = ctx.amg_idx
    app = jmat.vals[:, ctx.amg_eon][15]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.num_node))
    y_amg = _matvec(idx, 0, app.astype(x.dtype), x)
    y_mat = jmat.matvec_pp(x)
    np.testing.assert_allclose(
        np.asarray(y_amg), np.asarray(y_mat), rtol=1e-12, atol=1e-12
    )


def test_amg_galerkin_rap_oracle():
    """Coarse operator == P^T A P with the 8-row block indicator P."""
    mesh, sp, ctx, jmat = _mesh_and_jmat()
    idx = ctx.amg_idx
    app = jmat.vals[:, ctx.amg_eon][15].astype(jnp.float64)
    lv = build_values(idx, app)
    assert len(idx.ns) >= 2
    n, nc = idx.ns[0], idx.ns[1]
    # dense oracle
    a = np.zeros((n, n))
    np.add.at(
        a, (np.asarray(idx.rowseg[0]), np.asarray(idx.col[0])), np.asarray(app)
    )
    p = np.zeros((n, nc))
    p[np.arange(n), np.arange(n) // _B] = 1.0
    ac = p.T @ a @ p
    ac_amg = np.zeros((nc, nc))
    np.add.at(
        ac_amg,
        (np.asarray(idx.rowseg[1]), np.asarray(idx.col[1])),
        np.asarray(lv[1][0]),
    )
    np.testing.assert_allclose(ac_amg, ac, rtol=1e-10, atol=1e-12)


def test_amg_vcycle_solves_spd_poisson():
    """Standalone Richardson-with-V-cycle converges on an SPD graph
    Laplacian over the mesh pattern. Unsmoothed aggregation's asymptotic
    factor is ~0.6-0.7/cycle (piecewise-constant P) - it is designed as a
    Krylov PC, not a standalone solver - so the contract here is monotone
    convergence with a bounded factor, not 1e-10."""
    mesh, sp, ctx, jmat = _mesh_and_jmat()
    idx = ctx.amg_idx
    row = np.asarray(idx.rowseg[0])
    col = np.asarray(idx.col[0])
    n = idx.ns[0]
    # graph Laplacian + I on the pattern
    off = (row != col).astype(np.float64)
    deg = np.bincount(row, weights=off, minlength=n)
    vals = jnp.asarray(np.where(row == col, deg[row] + 1.0, -1.0))
    lv = build_values(idx, vals)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(n))
    x = jnp.zeros_like(b)
    r = b
    norms = [float(jnp.linalg.norm(r))]
    for _ in range(20):
        x = x + vcycle(idx, lv, r, omega=0.7)
        r = b - _matvec(idx, 0, vals, x)
        norms.append(float(jnp.linalg.norm(r)))
    factors = [b / a for a, b in zip(norms, norms[1:])]
    assert norms[-1] < 1e-3 * norms[0], norms
    assert max(factors) < 0.8, factors


def test_amg_schur_pc_beats_fieldsplit():
    """GMRES on the windowed-path NS Jacobian: the AMG Schur PC reaches a
    given tolerance in fewer iterations than the fieldsplit PC."""
    from dedflow_tpu.solver.krylov import gmres
    from dedflow_tpu.solver.pc import NSFieldSplitPCT

    mesh, sp, ctx, jmat = _mesh_and_jmat(npts=1400)
    pc = AMGSchurPCT.from_winell(jmat, ctx.amg_idx, ctx.amg_eon, outer=2)
    pc_fs = NSFieldSplitPCT.from_diag_rows(jmat.diag_rows())
    rng = np.random.default_rng(2)
    f = jnp.asarray(rng.standard_normal((6, mesh.num_node)))
    y = pc(f)
    assert bool(jnp.all(jnp.isfinite(y)))
    kw = dict(maxit=300, atol=0.0, rtol=1e-6)
    s_mg = gmres(jmat.matvec_t, f, pc=pc, **kw)
    s_fs = gmres(jmat.matvec_t, f, pc=pc_fs, **kw)
    assert bool(s_mg.converged)
    assert int(s_mg.iters) < int(s_fs.iters), (int(s_mg.iters), int(s_fs.iters))


def test_amg_via_assemble_system():
    """pc_type='mg' on a WinAssemblyContext routes to AMGSchurPCT."""
    from dedflow_tpu.solver.newton import assemble_system

    mesh, sp, ctx, jmat = _mesh_and_jmat()
    cfg = reference_scenario_config()
    cfg = dataclasses.replace(cfg, bcs=())
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float64) for x in reference_initial_state(mesh)
    )
    mask = jnp.zeros((mesh.num_node, 6), bool)
    jm, pc = assemble_system(
        ctx, (), mask, wg, dwgold, dwg, cfg.physics, cfg.time, pc_type="mg"
    )
    assert isinstance(pc, AMGSchurPCT)
    f = jnp.asarray(
        np.random.default_rng(3).standard_normal((6, mesh.num_node))
    )
    assert bool(jnp.all(jnp.isfinite(pc(f))))


def test_amg_plan_without_flag_warns():
    """pc='mg' without with_amg falls back to fieldsplit with a warning."""
    from dedflow_tpu.solver.newton import assemble_system
    from dedflow_tpu.solver.pc import NSFieldSplitPCT

    mesh = delaunay_mesh(600, seed=7)
    mesh = reorder_mesh(mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node))
    sp = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    ctx = build_win_context(mesh, sp, backend="xla")
    cfg = reference_scenario_config()
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float64) for x in reference_initial_state(mesh)
    )
    mask = jnp.zeros((mesh.num_node, 6), bool)
    with pytest.warns(UserWarning, match="AMG plan"):
        jm, pc = assemble_system(
            ctx, (), mask, wg, dwgold, dwg, cfg.physics, cfg.time,
            pc_type="mg",
        )
    assert isinstance(pc, NSFieldSplitPCT)
