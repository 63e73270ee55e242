"""Per-stage timing of the IRREGULAR (gather) path on the live device.

Breaks the Delaunay-tier bench stages into their internal phases so the
round-4 windowed-kernel work targets measured cost:

  residual = state row-gather + transposes + element kernel
             + tiered residual scatter
  jacobian = state row-gather + element LHS kernel + tiered matrix scatter
  spmv     = tiered-ELL x-gather + multiply-reduce + rank gather

Usage: python tools/irregprof.py [points=175616]
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
from dedflow_tpu.mesh.gen import delaunay_mesh  # noqa: E402


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
    mesh = delaunay_mesh(npts)
    cfg = reference_scenario_config()
    cfg = dataclasses.replace(
        cfg, bcs=(), scatter_method="tiered", elements_kernel="pallas",
        use_lattice="gather",
    )
    from dedflow_tpu.solver.newton import NSSolver

    t0 = time.perf_counter()
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    log(f"setup {time.perf_counter()-t0:.1f}s: {mesh.num_tet} tets "
        f"{mesh.num_node} nodes")
    ctx = solver.ctx
    plan = ctx.tiered
    log("tiers: " + ", ".join(
        f"pad={tp.pad} prt={tp.prt} rows={tp.gidx.shape[0]}"
        for tp in plan.tiers
    ))
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, jnp.float32) for x in (wg, dwgold, dwg))
    phys, scheme = cfg.physics, cfg.time
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)

    ne = ctx.num_elem
    n = ctx.num_node
    nrep = 8

    def timed(name, fn, *args):
        def loop(*a):
            def body(_, x):
                out = fn(x, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return x.at[(0,) * x.ndim].add(1e-6 * leaf.reshape(-1)[0])

            return fn(jax.lax.fori_loop(0, nrep - 1, body, a[0]), *a[1:])

        c = jax.jit(loop).lower(*args).compile()
        t = _timeit(c, *args, r1=1, r2=3) / nrep
        cost = c.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        by = float(cost.get("bytes accessed", 0.0))
        log(f"{name:28s} {t*1e3:8.2f} ms   ({by/1e9:.2f} GB accessed)")
        return t

    from dedflow_tpu.utils.xla import take_rows

    # --- residual phases -------------------------------------------------
    wd12 = jnp.concatenate([wa, dwa], axis=1)
    timed("F: state gather (ne,4,12)", lambda x: take_rows(x, ctx.ien), wd12)

    def gather_transpose(x):
        wd = take_rows(x, ctx.ien)
        we, dwe = wd[..., :6], wd[..., 6:]
        rows = lambda a: a.transpose(2, 1, 0).reshape(-1, ne)
        return (
            rows(we[..., :3]), rows(dwe[..., :3]), dwe[..., 3].T,
            we[..., 4].T, we[..., 5].T, dwe[..., 4].T, dwe[..., 5].T,
        )

    timed("F: gather + transposes", gather_transpose, wd12)

    from dedflow_tpu.fem.pallas_kernels import (
        ns_lhs_packed_pallas,
        ns_residual_pallas,
    )

    def elem_res(wa_, dwa_):
        return ns_residual_pallas(
            ctx.res_geom, ctx.ien_t, wa_, dwa_, phys, scheme
        )

    timed("F: gather+transp+elem kernel", elem_res, wa, dwa)

    fe = jax.jit(elem_res)(wa, dwa)
    from dedflow_tpu.sparse.tiered import (
        scatter_matrix_tiered,
        scatter_residual_tiered,
    )

    timed("F: tiered residual scatter", lambda v: scatter_residual_tiered(plan, v), fe)

    # --- jacobian phases --------------------------------------------------
    def elem_lhs(wa_):
        return ns_lhs_packed_pallas(ctx.lhs_geom, ctx.ien_t, wa_, phys, scheme)

    timed("J: gather+elem LHS kernel", elem_lhs, wa)
    upd = jax.jit(elem_lhs)(wa)
    timed("J: tiered matrix scatter", lambda v: scatter_matrix_tiered(plan, v), upd)

    jmat = jax.jit(lambda v: scatter_matrix_tiered(plan, v))(upd)
    f_t = jax.jit(lambda v: scatter_residual_tiered(plan, v))(fe)

    # --- spmv phases -------------------------------------------------------
    timed("S: tiered-ELL matvec", lambda x: jmat.matvec(x), f_t)

    tp0 = jmat.tiers[np.argmax([t.num_rows for t in jmat.tiers])]
    timed(
        "S: dominant-tier x gather",
        lambda x: take_rows(x, tp0.ell_col),
        f_t,
    )


if __name__ == "__main__":
    main()
