"""Fused Pallas element-Jacobian kernel == XLA oracle (interpret mode).

The compiled-TPU equivalence and timing run in bench/microbenchmarks;
CPU CI exercises the kernel through the Pallas interpreter.
"""

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns, weakform
from dedflow_tpu.fem.assembly import build_context
from dedflow_tpu.fem.pallas_kernels import ns_lhs_packed_pallas
from dedflow_tpu.mesh.gen import box_mesh


def test_pallas_lhs_matches_oracle_interpret():
    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    ctx = build_context(mesh, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    wg, dwgold, dwg = (
        jnp.asarray(x, dtype=jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    ref = np.asarray(weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time))
    got = np.asarray(
        ns_lhs_packed_pallas(
            ctx.lhs_geom, ctx.ien_t, wa, cfg.physics, cfg.time, interpret=True
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-5 * scale


def test_pallas_residual_matches_oracle_interpret():
    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    ctx = build_context(mesh, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    wg, dwgold, dwg = (
        jnp.asarray(x, dtype=jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    src = jnp.asarray(rng.random(mesh.num_node), jnp.float32)
    from dedflow_tpu.fem.pallas_kernels import ns_residual_pallas

    for source in (None, src):
        src_e = None if source is None else source[ctx.ien]
        ref = np.asarray(
            weakform.ns_residual_elements(ctx, ef, cfg.physics, cfg.time, src_e)
        )
        got = np.asarray(
            ns_residual_pallas(
                ctx.res_geom, ctx.ien_t, wa, dwa, cfg.physics, cfg.time,
                source, interpret=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(ref - got).max() < 2e-5 * scale
