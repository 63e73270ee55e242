"""Compare the windowed-path Jacobian scatter variants on the live device.

Usage: python tools/winjprof.py [points=175616] [variants=pull,stream,segment]
"""

import sys
import time

import jax
import jax.numpy as jnp

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
    import numpy as np

    npts = int(sys.argv[1]) if len(sys.argv) > 1 else 175_616
    variants = (
        sys.argv[2].split(",") if len(sys.argv) > 2
        else ["stream", "segment", "pull"]
    )
    t0 = time.perf_counter()
    mesh = delaunay_mesh(npts)
    mesh = reorder_mesh(mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node))
    sp = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    log(f"mesh {time.perf_counter()-t0:.0f}s ne={mesh.num_tet} n={mesh.num_node}")
    cfg = reference_scenario_config()
    phys, scheme = cfg.physics, cfg.time
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, jnp.float32) for x in (wg, dwgold, dwg))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)

    base = None
    for v in variants:
        t0 = time.perf_counter()
        ctx = build_win_context(mesh, sp, jac_scatter=v)
        log(f"[{v}] ctx {time.perf_counter()-t0:.0f}s")
        # ctx MUST be a jit argument: closing over it would embed the
        # index tables as XLA constants (huge programs; the remote-compile
        # tunnel rejects them)
        jac = jax.jit(
            lambda c, wa_: jacobian_win(c, wa_, phys, scheme)
        )
        t0 = time.perf_counter()
        jm = jax.block_until_ready(jac(ctx, wa))
        log(f"[{v}] compile+run {time.perf_counter()-t0:.0f}s")
        t = _timeit(jac, ctx, wa, r1=1, r2=3)
        log(f"[{v}] jacobian_win {t*1e3:8.2f} ms")
        if base is None:
            base = jm.vals
        else:
            d = float(jnp.max(jnp.abs(jm.vals - base)))
            m = float(jnp.max(jnp.abs(base)))
            log(f"[{v}] max abs diff vs {variants[0]}: {d:.3e} (ref max {m:.3e})")
        del jm, jac, ctx


if __name__ == "__main__":
    main()
