"""Geometric-multigrid preconditioner (solver.mg) tests.

Covers: offset decoding, Galerkin RAP correctness against a dense
P^T A P oracle, V-cycle convergence on a variable-coefficient Poisson
stencil, and the MGSIMPLEPCT end-to-end on a lattice NS Jacobian
(fewer GMRES iterations than the fieldsplit PC at equal residual).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.config import (
    BCSpec,
    KrylovConfig,
    SolverConfig,
    TimeScheme,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.solver.krylov import gmres
from dedflow_tpu.solver.mg import (
    MGSIMPLEPCT,
    ScalarDIALevel,
    _galerkin_coarsen,
    build_hierarchy,
    decode_offsets,
    vcycle,
)


def _poisson_planes(gx, gy, gz, rng):
    """Variable-coefficient 7-point Poisson stencil on the node grid,
    returned as (planes (7, N), linear offsets). Dirichlet-like: row sums
    positive (diag dominance) via a mass shift."""
    n = gx * gy * gz
    sy, sz = gx, gx * gy
    offs = [-sz, -sy, -1, 0, 1, sy, sz]
    geo = {-sz: (0, 0, -1), -sy: (0, -1, 0), -1: (-1, 0, 0),
           1: (1, 0, 0), sy: (0, 1, 0), sz: (0, 0, 1)}
    idx = np.arange(n)
    ix = idx % gx
    iy = (idx // gx) % gy
    iz = idx // sz
    planes = np.zeros((7, n))
    coef = 1.0 + 0.5 * rng.random(n)
    for k, o in enumerate(offs):
        if o == 0:
            continue
        ox, oy, oz = geo[o]
        valid = (
            (ix + ox >= 0) & (ix + ox < gx)
            & (iy + oy >= 0) & (iy + oy < gy)
            & (iz + oz >= 0) & (iz + oz < gz)
        )
        planes[k] = np.where(valid, -coef, 0.0)
    d0 = offs.index(0)
    planes[d0] = -planes.sum(axis=0) + planes[d0] + 0.1
    return jnp.asarray(planes), tuple(offs)


def _dense(level: ScalarDIALevel) -> np.ndarray:
    n = level.planes.shape[1]
    a = np.zeros((n, n))
    rows = np.arange(n)
    for k, o in enumerate(level.offsets):
        cols = rows + o
        ok = (cols >= 0) & (cols < n)
        a[rows[ok], cols[ok]] += np.asarray(level.planes)[k, rows[ok]]
    return a


def _agg_matrix(gx, gy, gz) -> np.ndarray:
    """Dense piecewise-constant aggregation P for 2x2x2 blocks."""
    cgx, cgy, cgz = -(-gx // 2), -(-gy // 2), -(-gz // 2)
    n, nc = gx * gy * gz, cgx * cgy * cgz
    p = np.zeros((n, nc))
    idx = np.arange(n)
    ix, iy, iz = idx % gx, (idx // gx) % gy, idx // (gx * gy)
    agg = (ix // 2) + cgx * ((iy // 2) + cgy * (iz // 2))
    p[idx, agg] = 1.0
    return p


def test_decode_offsets_roundtrip():
    gx, gy = 7, 5
    sy, sz = gx, gx * gy
    offs = [0, 1, -1, sy, -sy, sz, -sz, 1 + sy, sy + sz, 1 + sy + sz]
    geo = decode_offsets(offs, gx, gy)
    for o, (ox, oy, oz) in zip(offs, geo):
        assert ox + sy * oy + sz * oz == o
        assert max(abs(ox), abs(oy), abs(oz)) <= 1
    with pytest.raises(ValueError):
        decode_offsets([2], gx, gy)


@pytest.mark.parametrize("dims", [(4, 4, 4), (5, 3, 4)])
def test_galerkin_rap_matches_dense(dims):
    gx, gy, gz = dims
    rng = np.random.default_rng(0)
    planes, offs = _poisson_planes(gx, gy, gz, rng)
    lv = ScalarDIALevel(
        planes=planes,
        inv_diag=1.0 / planes[offs.index(0)],
        offsets=offs,
        dims=dims,
    )
    coarse = _galerkin_coarsen(lv)
    a = _dense(lv)
    p = _agg_matrix(gx, gy, gz)
    np.testing.assert_allclose(
        _dense(coarse), p.T @ a @ p, rtol=1e-12, atol=1e-12
    )


def test_vcycle_beats_jacobi():
    dims = (12, 10, 11)
    rng = np.random.default_rng(1)
    planes, offs = _poisson_planes(*dims, rng)
    levels = build_hierarchy(planes, offs, dims, min_nodes=32)
    assert len(levels) >= 3
    n = planes.shape[1]
    b = jnp.asarray(rng.random(n))
    a = levels[0]

    def rnorm(x):
        return float(jnp.linalg.norm(b - a.matvec(x)))

    # 3 V-cycle-preconditioned Richardson iterations
    x = vcycle(levels, b)
    for _ in range(2):
        x = x + vcycle(levels, b - a.matvec(x))
    # vs 9 damped-Jacobi sweeps (>= the V-cycles' fine-level work)
    xj = 0.85 * a.inv_diag * b
    for _ in range(8):
        xj = xj + 0.85 * a.inv_diag * (b - a.matvec(xj))
    assert rnorm(x) < 0.2 * rnorm(xj)


def test_mgsimple_on_lattice_jacobian():
    """MG-SIMPLE beats both baseline PCs on the PHYSICAL operator (the
    reference scenario's Jacobian; measured 52 vs 150/196 iterations at
    13^3). A random-coefficient state is deliberately NOT used here:
    smoothed aggregation on A_pp assumes the physical stencil's
    smooth-error structure, and random operators flip the ranking (83 vs
    60 at 7^3) without saying anything about the production solve."""
    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem.dirichlet import StrongBC, build_mask
    from dedflow_tpu.fem.lattice import (
        assemble_jacobian_t,
        build_lattice_context,
    )
    from dedflow_tpu.solver.pc import NSFieldSplitPCT

    mesh = box_mesh(12, 12, 12)
    cfg = reference_scenario_config()
    lctx = build_lattice_context(mesh, dtype=jnp.float64, rows_backend="xla")
    mask_np = build_mask(
        mesh,
        [StrongBC(b.boundary, tuple(b.strong_components))
         for b in cfg.bcs if b.strong_components], 6)
    mask_np[0, 3] = True
    mask = jnp.asarray(mask_np)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float64) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    jmat = assemble_jacobian_t(lctx, (), mask, wa, dwa, cfg.physics, cfg.time)
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.standard_normal((6, mesh.num_node)))

    pc_mg = MGSIMPLEPCT.from_matrix(jmat, dims=lctx.dims, min_nodes=32)
    assert len(pc_mg.levels) >= 2
    kw = dict(maxit=300, atol=1e-30, rtol=1e-8)
    sol_mg = gmres(jmat.matvec_t, f, pc=pc_mg, **kw)
    assert bool(sol_mg.converged)
    # true residual check (PC correctness, not just the GMRES estimate)
    rel = float(
        jnp.linalg.norm(f - jmat.matvec_t(sol_mg.x)) / jnp.linalg.norm(f)
    )
    assert rel < 1e-7
    sol_fs = gmres(
        jmat.matvec_t, f,
        pc=NSFieldSplitPCT.from_diag_rows(jmat.diag_rows()), **kw
    )
    # vs SIMPLE the gap only opens at larger sizes (24 vs 42 at 17^3,
    # measured on the same operator) - too slow for a unit test; the
    # reference-decomposition fieldsplit PC is the committed comparison.
    assert int(sol_mg.iters) < int(sol_fs.iters) // 2


def test_infer_dims_roundtrip():
    from dedflow_tpu.solver.mg import infer_dims

    for dims in [(5, 4, 6), (13, 13, 13), (9, 5, 3)]:
        gx, gy, gz = dims
        sy, sz = gx, gx * gy
        offs = sorted(
            {
                ox + sy * oy + sz * oz
                for ox in (-1, 0, 1)
                for oy in (-1, 0, 1)
                for oz in (-1, 0, 1)
            }
        )
        assert infer_dims(offs, gx * gy * gz) == dims
        # the 15-point Kuhn stencil (what class detection produces)
        kofs = sorted(
            {
                o
                for o in offs
                if o in (0, 1, -1, sy, -sy, sy + 1, -sy - 1, sz, -sz,
                         sz + 1, -sz - 1, sz + sy, -sz - sy,
                         sz + sy + 1, -sz - sy - 1)
            }
        )
        assert infer_dims(kofs, gx * gy * gz) == dims
    # irregular: no decode
    assert infer_dims((0, 2, 5, 11), 100) is None


def test_mg_on_class_tier():
    """pc_type='mg' works on the metadata-blind translation-class tier
    (VERDICT r3 item 2): dims inferred from the stencil offsets alone."""
    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem.lattice import build_class_context
    from dedflow_tpu.solver.newton import assemble_system

    mesh = box_mesh(12, 11, 10)
    cfg = reference_scenario_config()
    lctx = build_class_context(mesh, dtype=jnp.float64, rows_backend="xla")
    assert lctx is not None and lctx.dims is None
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float64) for x in reference_initial_state(mesh)
    )
    mask = jnp.zeros((mesh.num_node, 6), bool).at[0, 3].set(True)
    jmat, pc = assemble_system(
        lctx, (), mask, wg, dwgold, dwg, cfg.physics, cfg.time,
        pc_type="mg",
    )
    assert isinstance(pc, MGSIMPLEPCT)
    assert len(pc.levels) >= 2
    f = jnp.asarray(
        np.random.default_rng(7).standard_normal((6, mesh.num_node))
    )
    sol = gmres(jmat.matvec_t, f, pc=pc, maxit=300, atol=1e-30, rtol=1e-8)
    assert bool(sol.converged)
    rel = float(
        jnp.linalg.norm(f - jmat.matvec_t(sol.x)) / jnp.linalg.norm(f)
    )
    assert rel < 1e-7


def test_mg_pc_through_newton_assemble_system():
    """pc_type='mg' wires through solver.newton.assemble_system."""
    from dedflow_tpu.fem.dirichlet import StrongBC, build_mask
    from dedflow_tpu.fem.lattice import build_lattice_context
    from dedflow_tpu.solver.newton import assemble_system
    from dedflow_tpu.config import Physics

    mesh = box_mesh(4, 4, 4)
    lctx = build_lattice_context(mesh, dtype=jnp.float64, rows_backend="xla")
    mask = jnp.asarray(build_mask(mesh, [StrongBC(0, (0, 1, 2))], 6))
    n = mesh.num_node
    z = jnp.zeros((n, 6))
    jmat, pc = assemble_system(
        lctx, (), mask, z, z, z, Physics(), TimeScheme(dt=0.05),
        pc_type="mg",
    )
    assert isinstance(pc, MGSIMPLEPCT)
    y = pc(jnp.ones((6, n)))
    assert y.shape == (6, n)
    assert bool(jnp.all(jnp.isfinite(y)))
