"""Per-stage timing of the lattice fast path on the live device.

Splits the bench's three headline stages into their internal phases so
optimization targets the measured cost, not the guessed one:
  residual = fused t8 kernel + XLA node reduction
  jacobian = fused masked kernel (+ scal pass)
  spmv     = Pallas DIA kernel

Usage: python tools/stageprof.py [n]   (default n=55, ~1M tets)
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import _timeit  # noqa: E402
from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import lattice as lat  # noqa: E402
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    lctx = solver.lctx
    assert lctx is not None
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, jnp.float32) for x in (wg, dwgold, dwg))
    phys, scheme = cfg.physics, cfg.time
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
    wa_t, dwa_t = wa.T, dwa.T

    nrep = 8

    def loop(fn, x0, feedback):
        """In-jit repetition with a data-dependent carry (bench-style)."""

        def body(_, x):
            out = fn(x)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return x.at[(0,) * x.ndim].add(1e-6 * leaf.reshape(-1)[0])

        return jax.lax.fori_loop(0, nrep, body, x0)

    stages = {}

    # -- residual: kernel only (t8 out rows, no reduction) ---------------
    state = lat._res_state_rows(wa_t, dwa_t, None, -(-lctx.num_node // lat._EF_RES) * lat._EF_RES + lctx.dmax)

    def res_kernel_only(st):
        e = lat._EF_RES
        nb = -(-lctx.num_node // e)
        return lat._res_call(
            st, lctx.res_geom8, lctx.deltas, e=e, nb=nb, dmax=lctx.dmax,
            phys=phys, scheme=scheme, interpret=False,
        )

    # -- residual: full (kernel + reduction) ------------------------------
    def res_full(w):
        return lat.residual_fused(lctx, w, dwa_t, None, phys, scheme)

    # -- reduction only: feed a precomputed t8 out array ------------------
    out_t8 = jax.jit(res_kernel_only)(state)
    out_t8 = jax.block_until_ready(out_t8)

    def reduce_only(o):
        return lat._reduce_residual_t8(lctx, o)

    # -- jacobian: fused masked kernel via assemble_jacobian_t ------------
    mask = solver.mask

    def jac_full(w):
        return lat.assemble_jacobian_t(
            lctx, solver.face_ctxs, mask, w.T, dwa, phys, scheme
        )

    # -- jacobian: raw fused kernel (no mask/bands) ------------------------
    def jac_kernel_only(w):
        return lat.jacobian_fused(lctx, w, phys, scheme)

    for name, fn, x0 in (
        ("res_kernel", res_kernel_only, state),
        ("res_reduce", reduce_only, out_t8),
        ("res_full", res_full, wa_t),
        ("jac_kernel", jac_kernel_only, wa_t),
        ("jac_full", jac_full, wa_t),
    ):
        c = jax.jit(lambda x, fn=fn: loop(fn, x, None)).lower(x0).compile()
        t = _timeit(c, x0, r1=1, r2=3) / nrep
        stages[name] = t * 1e3
        print(f"{name:12s} {t*1e3:7.2f} ms", flush=True)

    print({k: round(v, 2) for k, v in stages.items()})


if __name__ == "__main__":
    main()
