"""End-to-end Newton/generalized-alpha tests on the reference scenario."""

import jax.numpy as jnp
import numpy as np

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
