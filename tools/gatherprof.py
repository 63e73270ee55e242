"""Per-stage timing of the GENERAL (gather) assembly path on the live
device, on a genuinely irregular Delaunay mesh. Splits residual/Jacobian
into their phases so the irregular-mesh optimization targets measured
cost:

  residual = state gather + element kernel + nodal scatter
  jacobian = state gather + element kernel + ELL scatter
  spmv     = ELL gather matvec

Usage: python tools/gatherprof.py [npts] [scatter ...]
  npts: points for the Delaunay mesh (default 175616 ~ 1.18M tets)
  scatter: subset of {grouped,segment,prefix} to profile (default all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _timeit  # noqa: E402
from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import assembly, ns, weakform  # noqa: E402
from dedflow_tpu.fem import pallas_kernels as pk  # noqa: E402
from dedflow_tpu.mesh.gen import delaunay_mesh  # noqa: E402


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    args = sys.argv[1:]
    npts = int(args[0]) if args and args[0].isdigit() else 175616
    methods = [a for a in args if a in ("grouped", "segment", "prefix")] or [
        "grouped",
        "segment",
        "prefix",
    ]
    mesh = delaunay_mesh(npts)
    cfg = reference_scenario_config()
    phys, scheme = cfg.physics, cfg.time
    t0 = time.perf_counter()
    ctx = assembly.build_context(mesh, dtype=jnp.float32)
    print(
        f"mesh {mesh.num_tet} tets {mesh.num_node} nodes  "
        f"ell_width {ctx.ell_width} grp_width {ctx.grp_width}  "
        f"build {time.perf_counter()-t0:.1f}s",
        flush=True,
    )
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, jnp.float32) for x in (wg, dwgold, dwg))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)

    nrep = 8

    def loop(fn):
        """In-jit repetition with a data-dependent carry on wa."""

        def run(ctx, wa, dwa):
            def body(_, w):
                out = fn(ctx, w, dwa)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return w.at[0, 0].add(1e-6 * leaf.reshape(-1)[0])

            return fn(ctx, jax.lax.fori_loop(0, nrep - 1, body, wa), dwa)

        return run

    def timed(name, fn, flops_hint=0.0):
        c = jax.jit(loop(fn)).lower(ctx, wa, dwa).compile()
        t = _timeit(c, ctx, wa, dwa, r1=1, r2=3) / nrep
        print(f"{name:34s} {t*1e3:8.2f} ms", flush=True)
        return t

    # ---- residual phases -------------------------------------------------
    timed("F.gather x2 (ne,4,6)", lambda c, w, dw: (
        weakform.gather_fields(c.ien, w, dw)))
    timed("F.elem pallas (in: gathers)", lambda c, w, dw: pk.ns_residual_pallas(
        c.res_geom, c.ien_t, w, dw, phys, scheme))

    fe = jax.jit(
        lambda c, w, dw: pk.ns_residual_pallas(
            c.res_geom, c.ien_t, w, dw, phys, scheme
        ).astype(jnp.float32)
    )(ctx, wa, dwa)

    def scat_res(method):
        if method == "grouped":
            return lambda c, f, _: assembly.scatter_residual_grouped(c, f)
        return lambda c, f, _: assembly.scatter_residual(c, f)

    for m in dict.fromkeys(
        ["grouped" if "grouped" in methods else "segment", "segment"]
    ):
        c = jax.jit(loop(scat_res(m))).lower(ctx, fe, dwa).compile()
        t = _timeit(c, ctx, fe, dwa, r1=1, r2=3) / nrep
        print(f"{'F.scatter ' + m:34s} {t*1e3:8.2f} ms", flush=True)

    # ---- jacobian phases -------------------------------------------------
    timed("J.elem pallas (in: gathers)", lambda c, w, dw: pk.ns_lhs_packed_pallas(
        c.lhs_geom, c.ien_t, w, phys, scheme))

    upd = jax.jit(
        lambda c, w: pk.ns_lhs_packed_pallas(
            c.lhs_geom, c.ien_t, w, phys, scheme
        ).astype(jnp.float32)
    )(ctx, wa)

    for m in methods:
        try:
            c = (
                jax.jit(loop(lambda c, u, _, m=m: assembly.scatter_matrix_packed(c, u, m)))
                .lower(ctx, upd, dwa)
                .compile()
            )
            t = _timeit(c, ctx, upd, dwa, r1=1, r2=3) / nrep
            print(f"{'J.scatter ' + m:34s} {t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"J.scatter {m:24s} FAIL {type(e).__name__}: {str(e)[:160]}")

    # ---- SpMV ------------------------------------------------------------
    data = jax.jit(
        lambda c, u: assembly.scatter_matrix_packed(c, u, "segment")
    )(ctx, upd)
    mat = assembly.fsbsr_from_data(ctx, data)

    # NOTE: the matrix must be an ARGUMENT of the jitted loop - closing
    # over it would bake 700+ MB of ELL data into the HLO as constants
    # (the remote-compile tunnel rejects the request with HTTP 413).
    def loop_mat(fn):
        def run(mat, wa):
            def body(_, w):
                out = fn(mat, w)
                return w.at[0, 0].add(1e-6 * out.reshape(-1)[0])

            return fn(mat, jax.lax.fori_loop(0, nrep - 1, body, wa))

        return run

    c = jax.jit(loop_mat(lambda m, w: m.matvec(w))).lower(mat, wa).compile()
    t = _timeit(c, mat, wa, r1=1, r2=3) / nrep
    print(f"{'SpMV ELL':34s} {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
