"""End-to-end Newton/generalized-alpha tests on the reference scenario."""

import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.mesh import box_mesh
from dedflow_tpu.solver.newton import NSSolver


def _setup(nx=3, ny=2, nz=2):
    from dedflow_tpu.config import NewtonConfig

    mesh = box_mesh(nx, ny, nz)
    # atol floor because the uniform initial flow has exactly zero
    # continuity/phi/T residuals (relative test unattainable; see
    # NewtonConfig docstring).
    cfg = reference_scenario_config(newton=NewtonConfig(atol=1e-9))
    solver = NSSolver(mesh, cfg)
    wg, dwgold, dwg = reference_initial_state(mesh)
    return mesh, solver, jnp.asarray(wg), jnp.asarray(dwgold), jnp.asarray(dwg)


def test_newton_converges_one_step():
    mesh, solver, wg, dwgold, dwg = _setup()
    wg2, dwgold2, dwg2, stats = solver.step(wg, dwgold, dwg)
    # Newton must make progress and converge within the reference's 4 iters.
    assert stats.converged, (stats.rnorm0, stats.rnorms)
    # field norms strictly decreased for velocity
    assert stats.rnorms[-1][0] < stats.rnorm0[0]
    # phi/T equations frozen: zero residual rows, untouched increments
    assert np.allclose(np.asarray(dwg2)[:, 4:], 0.0, atol=1e-12)
    # states updated and finite
    for a in (wg2, dwgold2, dwg2):
        assert np.isfinite(np.asarray(a)).all()


def test_strong_bcs_hold_after_step():
    mesh, solver, wg, dwgold, dwg = _setup()
    wg2, _, dwg2, _ = solver.step(wg, dwgold, dwg)
    wg2 = np.asarray(wg2)
    # inflow boundary (x-): u stays exactly (1,0,0) because dwg rows are
    # masked in the linear solve (dx=0 there) and the update preserves it.
    n0 = mesh.boundaries[0].nodes
    assert np.allclose(wg2[n0, 0], 1.0, atol=1e-12)
    assert np.allclose(wg2[n0, 1:3], 0.0, atol=1e-12)
    # slip walls keep zero normal velocity
    ny_nodes = mesh.boundaries[2].nodes
    assert np.allclose(wg2[ny_nodes, 1], 0.0, atol=1e-12)
    nz_nodes = mesh.boundaries[4].nodes
    assert np.allclose(wg2[nz_nodes, 2], 0.0, atol=1e-12)


@pytest.mark.slow
def test_step_fixed_matches_adaptive_when_not_converging_early():
    mesh, solver, wg, dwgold, dwg = _setup(2, 2, 2)
    w_a, dw_a, dwg_a, stats = solver.step(wg, dwgold, dwg)
    niter = len(stats.rnorms)
    w_f, dw_f, dwg_f = solver.step_fixed(wg, dwgold, dwg, num_newton=niter)
    assert np.allclose(np.asarray(w_a), np.asarray(w_f), atol=1e-10)
    assert np.allclose(np.asarray(dwg_a), np.asarray(dwg_f), atol=1e-10)


def test_multiple_steps_stable():
    mesh, solver, wg, dwgold, dwg = _setup(2, 2, 2)
    for _ in range(3):
        wg, dwgold, dwg, stats = solver.step(wg, dwgold, dwg)
        assert np.isfinite(np.asarray(wg)).all()
        assert stats.rnorms[-1][0] < 10 * stats.rnorm0[0]


def test_chunked_assembly_matches_whole_mesh():
    """The streaming (lax.scan) assembly path must equal the whole-mesh
    segment-sum path; chunk padding elements must contribute nothing."""
    import dataclasses

    import jax.numpy as jnp

    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.mesh.gen import box_mesh
    from dedflow_tpu.solver.newton import NSSolver

    mesh = box_mesh(3, 3, 4)
    cfg = reference_scenario_config()
    # chunk=32 does not divide 6*3*3*4=216 elements -> exercises padding... 
    # (216 % 32 = 24), so the padded tail is hit.
    cfg_c = dataclasses.replace(cfg, assembly_chunk=32)
    s0 = NSSolver(mesh, cfg)
    s1 = NSSolver(mesh, cfg_c)
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))

    f0 = s0._residual(s0.ctx, s0.face_ctxs, s0.mask, wg, dwgold, dwg)
    f1 = s1._residual(s1.ctx, s1.face_ctxs, s1.mask, wg, dwgold, dwg)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-12, atol=1e-13)

    w0, d0, g0 = s0.step_fixed(wg, dwgold, dwg, num_newton=2)
    w1, d1, g1 = s1.step_fixed(wg, dwgold, dwg, num_newton=2)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-7, atol=1e-9)


def test_lid_driven_cavity_develops_flow():
    """BASELINE config #2: the moving lid drags the enclosed fluid along;
    the pressure pin removes the constant null mode."""
    import jax.numpy as jnp

    from dedflow_tpu.app.scenarios import (
        lid_driven_cavity_config,
        lid_driven_cavity_initial_state,
    )
    from dedflow_tpu.mesh import box_mesh
    from dedflow_tpu.solver.newton import NSSolver

    mesh = box_mesh(5, 5, 5)
    cfg = lid_driven_cavity_config()
    solver = NSSolver(mesh, cfg)
    wg, dwgold, dwg = (
        jnp.asarray(x) for x in lid_driven_cavity_initial_state(mesh)
    )
    for _ in range(5):
        wg, dwgold, dwg, stats = solver.step(wg, dwgold, dwg)
        assert np.isfinite(np.asarray(wg)).all()
    w = np.asarray(wg)
    # lid value preserved exactly by the Dirichlet machinery
    lid = mesh.boundaries[5].nodes
    rim = np.unique(np.concatenate([mesh.boundaries[b].nodes for b in range(5)]))
    interior_lid = np.setdiff1d(lid, rim)
    np.testing.assert_allclose(w[interior_lid, 0], 1.0, atol=1e-12)
    # no-slip walls hold
    bottom = mesh.boundaries[4].nodes
    np.testing.assert_allclose(w[bottom, :3], 0.0, atol=1e-12)
    # interior fluid has been dragged into motion
    wall = np.unique(np.concatenate([np.asarray(b.nodes) for b in mesh.boundaries]))
    interior = np.setdiff1d(np.arange(mesh.num_node), wall)
    assert np.abs(w[interior, 0]).max() > 0.02
    # velocities bounded by the lid speed (no blow-up)
    assert np.abs(w[:, :3]).max() <= 1.5


@pytest.mark.slow
def test_lagged_jacobian_converges_to_same_solution():
    """Modified Newton (lag_jacobian): same converged step result within
    the Newton tolerance; the lagged path may take more iterations."""
    import dataclasses

    import jax.numpy as jnp

    from dedflow_tpu.config import NewtonConfig

    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config(newton=NewtonConfig(atol=1e-9, max_iter=6))
    cfg_lag = dataclasses.replace(
        cfg, newton=NewtonConfig(atol=1e-9, max_iter=6, lag_jacobian=True)
    )
    wg0, dwgold0, dwg0 = reference_initial_state(mesh)
    s0 = NSSolver(mesh, cfg)
    s1 = NSSolver(mesh, cfg_lag)
    args = tuple(jnp.asarray(a) for a in (wg0, dwgold0, dwg0))
    w_a, _, g_a, st_a = s0.step(*args)
    w_b, _, g_b, st_b = s1.step(*args)
    assert st_a.converged and st_b.converged
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_a), rtol=1e-3, atol=1e-6)
    # fixed-iteration jitted path also runs with lagging
    out = s1.step_fixed(*args, num_newton=3)
    assert all(np.isfinite(np.asarray(x)).all() for x in out)
