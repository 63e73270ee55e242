"""Per-stage timing of the WINDOWED residual path on the live device.

residual_win = state row-gather+transpose -> fused element-rows kernel
               -> 4x windowed stream permute-reduce.
Times each stage in isolation at bench scale so the optimization target
is measured, not guessed.

Usage: python tools/winrprof.py [points=175616]
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
from dedflow_tpu.fem import pallas_kernels as pk  # noqa: E402
from dedflow_tpu.fem.win_assembly import (  # noqa: E402
    _STATE_PERM,
    build_win_context,
    residual_win,
)
from dedflow_tpu.mesh.gen import delaunay_mesh  # noqa: E402
from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh  # noqa: E402
from dedflow_tpu.sparse import win_stream as ws  # noqa: E402
from dedflow_tpu.sparse.topology import build_sparsity  # noqa: E402
from dedflow_tpu.utils.xla import take_rows  # noqa: E402


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass

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

    # stage 1: gather + fused transpose
    def gather(c, w, dw):
        wd = take_rows(
            jnp.concatenate([w, dw], axis=1), c.ien
        ).reshape(ne, 48)
        return wd.T[jnp.asarray(_STATE_PERM)]

    g = jax.jit(gather)
    state_rows = jax.block_until_ready(g(ctx, wa, dwa))
    t = _timeit(g, ctx, wa, dwa, r1=1, r2=3)
    log(f"gather+transpose (44, {ne})      {t*1e3:8.2f} ms")

    # stage 2: element rows kernel on a precomputed input
    inp = jnp.concatenate(
        [ctx.res_geom, state_rows, jnp.zeros((4, ne), jnp.float32)]
    )
    ek = jax.jit(lambda x: pk.res_rows_call(x, phys, scheme))
    out24 = jax.block_until_ready(ek(inp))
    t = _timeit(ek, inp, r1=1, r2=3)
    log(f"element rows kernel (67->24, {ne}) {t*1e3:8.2f} ms")

    # stage 3: the 4 stream scatter passes
    def scat(c, o24):
        y = None
        for a in range(4):
            ya = ws.win_stream_reduce(
                c.fsc_plan[a], c.fsc_idx[a], o24[a * 6 : (a + 1) * 6]
            )
            y = ya if y is None else y + ya
        return y

    sc = jax.jit(scat)
    jax.block_until_ready(sc(ctx, out24))
    t = _timeit(sc, ctx, out24, r1=1, r2=3)
    log(f"stream scatter x4 (6, N)          {t*1e3:8.2f} ms")

    # one pass alone
    s1 = jax.jit(
        lambda c, o: ws.win_stream_reduce(c.fsc_plan[0], c.fsc_idx[0], o)
    )
    o6 = out24[:6]
    jax.block_until_ready(s1(ctx, o6))
    t = _timeit(s1, ctx, o6, r1=1, r2=3)
    log(f"stream scatter x1 (6, N)          {t*1e3:8.2f} ms")

    # whole residual for reference
    r = jax.jit(
        lambda c, w, dw: residual_win(c, w, dw, phys, scheme)
    )
    jax.block_until_ready(r(ctx, wa, dwa))
    t = _timeit(r, ctx, wa, dwa, r1=1, r2=3)
    log(f"residual_win total                {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
