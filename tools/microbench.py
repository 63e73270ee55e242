"""Fast iteration micro-benchmark for the lattice hot path on TPU.

Times residual F, Jacobian J, and the DIA SpMV at the bench mesh size
with in-jit repetition loops (same methodology as bench.py), printing one
line per stage. Not a driver artifact - bench.py is; this exists so
kernel work can be measured in seconds, not minutes.

Usage: python tools/microbench.py [n=55] [reps=8]
"""

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
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.reshape(-1)[:8]))


def timeit(fn, *args, r1=1, r2=2):
    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    run(1)
    t_a = run(r1)
    t_b = run(r2)
    return max((t_b - t_a) / (r2 - r1), 1e-9)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    assert solver.lctx is not None
    print(f"mesh {mesh.num_tet} tets {mesh.num_node} nodes", file=sys.stderr)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    phys, scheme = cfg.physics, cfg.time
    from dedflow_tpu.solver import newton as nt

    ctx = solver.solve_ctx

    def resid(ctx, face_ctxs, mask, wg, dwgold, dwg):
        return nt.residual(
            ctx, face_ctxs, mask, wg, dwgold, dwg, phys, scheme, True,
        )

    def jac(ctx, face_ctxs, mask, wg, dwgold, dwg):
        wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
        from dedflow_tpu.fem.lattice import assemble_jacobian_t

        return assemble_jacobian_t(ctx, face_ctxs, mask, wa, dwa, phys, scheme)

    def resid_loop(ctx, face_ctxs, mask, wg, dwgold, dwg):
        def body(_, d):
            fr = resid(ctx, face_ctxs, mask, wg, dwgold, d)
            return d + 0.0 * jnp.sum(fr)

        return resid(
            ctx, face_ctxs, mask, wg, dwgold,
            jax.lax.fori_loop(0, n_rep - 1, body, dwg),
        )

    def jac_loop(ctx, face_ctxs, mask, wg, dwgold, dwg):
        def body(_, d):
            jm = jac(ctx, face_ctxs, mask, wg, dwgold, d)
            leaf = jax.tree_util.tree_leaves(jm)[0]
            return d + 0.0 * jnp.sum(leaf)

        return jac(
            ctx, face_ctxs, mask, wg, dwgold,
            jax.lax.fori_loop(0, n_rep - 1, body, dwg),
        )

    def spmv_loop(mat, x):
        def body(_, v):
            y = mat.matvec_t(v)
            return y / jnp.linalg.norm(y.reshape(-1))

        return jax.lax.fori_loop(0, 10 * n_rep, body, x)

    cargs = (ctx, solver.face_ctxs, solver.mask)
    t0 = time.perf_counter()
    resid_loop_c = jax.jit(resid_loop).lower(*cargs, wg, dwgold, dwg).compile()
    jac_c = jax.jit(jac).lower(*cargs, wg, dwgold, dwg).compile()
    jac_loop_c = jax.jit(jac_loop).lower(*cargs, wg, dwgold, dwg).compile()
    print(f"compiled in {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    jmat = jac_c(*cargs, wg, dwgold, dwg)
    f = resid_loop_c(*cargs, wg, dwgold, dwg)
    spmv_c = jax.jit(spmv_loop).lower(jmat, f).compile()

    for name, fn, args, div in (
        ("F", resid_loop_c, (*cargs, wg, dwgold, dwg), n_rep),
        ("J", jac_loop_c, (*cargs, wg, dwgold, dwg), n_rep),
        ("SpMV", spmv_c, (jmat, f), 10 * n_rep),
    ):
        ts = sorted(timeit(fn, *args) / div for _ in range(3))
        print(f"{name}: {ts[1]*1e3:7.2f} ms   (runs: "
              + " ".join(f"{t*1e3:.2f}" for t in ts) + ")")


if __name__ == "__main__":
    main()
