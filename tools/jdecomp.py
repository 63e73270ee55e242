"""Decompose the lattice Jacobian time: raw fused kernel vs masked
kernel vs full assemble_jacobian_t (scal + faces + wrapper). Dev tool."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DEDFLOW_BENCH_CACHE", "/tmp/dedflow_jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.fem import lattice as lat  # noqa: E402
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402
from dedflow_tpu.sparse.fsbsr import keep_pc_rows, diag_add_rows  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.reshape(-1)[:8]))


def timeit(fn, *args, n_rep=8):
    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    run(1)
    ts = sorted(max((run(2) - run(1)), 1e-9) for _ in range(3))
    return ts[1]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    n_rep = 8
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    lctx = solver.lctx
    phys, scheme = cfg.physics, cfg.time
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
    mask = solver.mask

    def loop(fn):
        def run(wa_t):
            def body(_, w):
                out = fn(w)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return w + 0.0 * jnp.sum(leaf.reshape(-1)[:8])

            return fn(jax.lax.fori_loop(0, n_rep - 1, body, wa_t))

        return run

    wa_t = wa.T

    raw = jax.jit(loop(lambda w: lat.jacobian_fused(lctx, w, phys, scheme)))
    mask_t = mask.T
    keep16 = keep_pc_rows(mask_t, jnp.float32)[:16]
    add16 = diag_add_rows(mask_t, jnp.float32)[:16]
    masked = jax.jit(
        loop(
            lambda w: lat.jacobian_fused(
                lctx, w, phys, scheme, keep16=keep16, add16=add16
            )
        )
    )
    full = jax.jit(
        loop(
            lambda w: lat.assemble_jacobian_t(
                lctx, solver.face_ctxs, mask, w.T, dwa, phys, scheme
            ).data
        )
    )
    t0 = time.perf_counter()
    for name, fn in (("raw", raw), ("masked", masked), ("full", full)):
        c = fn.lower(wa_t).compile()
        print(f"{name}: compiled {time.perf_counter()-t0:.0f}s", flush=True)
        t = timeit(c, wa_t) / n_rep
        print(f"{name}: {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
