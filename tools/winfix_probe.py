"""One-off TPU probe for the round-5 winell fixes: residual gather
variants (win_gather in-kernel vs take_rows+transpose), the chunked
pull-path Jacobian memory fix, and the full SpMV, all at bench scale.

Usage: python tools/winfix_probe.py [points=175616]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _timeit, log  # noqa: E402
from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.fem.win_assembly import (  # noqa: E402
    build_win_context,
    jacobian_win,
    residual_win,
)
from dedflow_tpu.mesh.gen import delaunay_mesh  # noqa: E402
from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh  # noqa: E402
from dedflow_tpu.sparse.topology import build_sparsity  # noqa: E402


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    import dataclasses

    npts = int(sys.argv[1]) if len(sys.argv) > 1 else 175_616
    t0 = time.perf_counter()
    mesh = delaunay_mesh(npts)
    mesh = reorder_mesh(mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node))
    sp = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    ctx = build_win_context(mesh, sp)
    ne = ctx.num_elem
    log(f"setup {time.perf_counter()-t0:.0f}s ne={ne} n={mesh.num_node}")
    cfg = reference_scenario_config()
    phys, scheme = cfg.physics, cfg.time
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, jnp.float32) for x in (wg, dwgold, dwg))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)

    ctx_nw = dataclasses.replace(ctx, gat_plan=None)

    # residual: take_rows gather variant
    r2 = jax.jit(
        lambda c, w, dw: residual_win(c, w, dw, phys, scheme)
    )
    f = jax.block_until_ready(r2(ctx_nw, wa, dwa))
    t = _timeit(r2, ctx_nw, wa, dwa, r1=1, r2=3)
    log(f"residual_win take_rows            {t*1e3:8.2f} ms")

    # chunked pull jacobian (no win_gather)
    jfn = jax.jit(lambda c, w: jacobian_win(c, w, phys, scheme))
    jm = jax.block_until_ready(jfn(ctx_nw, wa).vals)
    t = _timeit(lambda c, w: jfn(c, w).vals, ctx_nw, wa, r1=1, r2=3)
    log(f"jacobian_win pull chunked         {t*1e3:8.2f} ms")

    # SpMV
    jmat = jfn(ctx_nw, wa)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(6, mesh.num_node)),
        jnp.float32,
    )
    mv = jax.jit(lambda m, v: m.matvec_t(v))
    jax.block_until_ready(mv(jmat, x))
    t = _timeit(mv, jmat, x, r1=2, r2=8)
    log(f"winell matvec                     {t*1e3:8.2f} ms")

    # residual with win_gather for reference (known slow)
    r1 = jax.jit(
        lambda c, w, dw: residual_win(c, w, dw, phys, scheme)
    )
    jax.block_until_ready(r1(ctx, wa, dwa))
    t = _timeit(r1, ctx, wa, dwa, r1=1, r2=3)
    log(f"residual_win win_gather           {t*1e3:8.2f} ms")

    # jacobian with win_gather u_rows
    jax.block_until_ready(jfn(ctx, wa).vals)
    t = _timeit(lambda c, w: jfn(c, w).vals, ctx, wa, r1=1, r2=3)
    log(f"jacobian_win win_gather           {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
