"""krylov.precision: production-grade 1e-10 linear solves (BASELINE.md).

The reference solves every Newton system in f64 (common.h:21-59). The
TPU fast path assembles in f32; `precision="ir"` (f32 GMRES inner solves
+ f64 iterative refinement, solver.refine.gmres_ir_device) and
`precision="f64"` (full emulated-f64 Krylov) both push the LINEAR
relative residual below 1e-10 from f32-assembled operators. These tests
run the same code paths on CPU; tools/residual_check.py exercises them on
TPU hardware.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.solver.newton import NSSolver
from dedflow_tpu.mesh.gen import box_mesh


def _cfg(precision):
    cfg = reference_scenario_config()
    kw = dict(precision=precision, max_iter=150)
    if precision == "f64":
        # precision='f64' honors the configured Krylov tolerances (the
        # reference runs rtol=1e-4 in f64, main.c:406); the 1e-10 bar
        # needs them tightened. precision='ir' targets ir_tol directly.
        kw.update(rtol=5e-12, atol=0.0)
    return dataclasses.replace(
        cfg, krylov=dataclasses.replace(cfg.krylov, **kw)
    )


@pytest.mark.parametrize("precision", ["ir", "f64"])
def test_precision_reaches_1e10_from_f32_state(precision):
    mesh = box_mesh(6, 6, 6)
    solver = NSSolver(mesh, _cfg(precision), dtype=jnp.float32)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg, stats = solver.newton_solve(wg, dwgold, dwg)
    assert stats.linear_rels, "no Krylov solves recorded"
    # every recorded linear solve met the 1e-10 bar (for 'f64' the
    # estimated GMRES residual; for 'ir' the TRUE f64 residual)
    assert max(stats.linear_rels) <= 1e-10, stats.linear_rels
    assert np.isfinite(np.asarray(dwg)).all()


def test_state_precision_matches_previous_behavior():
    """precision='state' (default) keeps the plain path: linear residual
    bounded by the f32 GMRES tolerance, not the 1e-10 bar."""
    mesh = box_mesh(5, 5, 5)
    solver = NSSolver(mesh, _cfg("state"), dtype=jnp.float32)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg, stats = solver.newton_solve(wg, dwgold, dwg)
    assert stats.linear_rels
    assert all(np.isfinite(v) for v in stats.linear_rels)


def test_ir_and_f64_agree():
    """Both production routes land on the same Newton update."""
    mesh = box_mesh(5, 5, 5)
    out = {}
    for prec in ("ir", "f64"):
        solver = NSSolver(mesh, _cfg(prec), dtype=jnp.float32)
        wg, dwgold, dwg = (
            jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
        )
        out[prec], _ = solver.newton_solve(wg, dwgold, dwg)
    np.testing.assert_allclose(
        np.asarray(out["ir"]), np.asarray(out["f64"]), rtol=2e-4, atol=1e-6
    )
