"""Cross-check the bench's analytic byte model vs XLA's cost analysis
(VERDICT r4 item 5: the SoL denominator was self-graded).

bench.py's `vs_baseline` divides by an analytic "minimal HBM traffic"
model. This tool compiles the PURE-XLA variants of the three stages
(residual, Jacobian, 10x SpMV) at the bench mesh size and compares the
model against the compiler's `bytes accessed` for the same computation.
XLA's number counts every operand of every fusion (an upper bound that
includes re-materialization), so model <= xla is expected; the point is
the RATIO - a model far below even the logical traffic would inflate
sol_frac. No execution happens; compile-only.

Writes ROOFLINE_CHECK.json. Usage:
    python tools/roofline_check.py [n=55] [mesh=box|delaunay]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    import dataclasses

    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.fem import ns
    from dedflow_tpu.mesh.gen import box_mesh, delaunay_mesh
    from dedflow_tpu.solver import newton as nt
    from dedflow_tpu.solver.newton import NSSolver

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    kind = sys.argv[2] if len(sys.argv) > 2 else "box"
    if kind == "delaunay":
        from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh

        mesh = delaunay_mesh((n + 1) ** 3)
        mesh = reorder_mesh(
            mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node)
        )
    else:
        mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    if not mesh.boundaries:
        cfg = dataclasses.replace(cfg, bcs=())
    # the XLA lattice pipeline: same logical computation as the fused
    # Pallas kernels, fully visible to the compiler's cost analysis
    cfg = dataclasses.replace(
        cfg, lattice_backend="xla", elements_kernel="xla",
        use_lattice="auto" if kind == "box" else "winell",
    )
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    win = getattr(solver, "wctx", None) is not None
    lat = solver.lctx is not None or win
    ctx = solver.solve_ctx
    phys, scheme = cfg.physics, cfg.time
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )

    def xla_bytes(fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0))

    def resid(ctx, face_ctxs, mask, wg, dwgold, dwg):
        return nt.residual(
            ctx, face_ctxs, mask, wg, dwgold, dwg, phys, scheme, True,
            None, None, None, cfg.scatter_method, "xla",
        )

    def jac(ctx, face_ctxs, mask, wg, dwgold, dwg):
        wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
        if win:
            from dedflow_tpu.fem.win_assembly import jacobian_win

            return jacobian_win(ctx, wa, phys, scheme, backend="xla")
        if lat:
            from dedflow_tpu.fem.lattice import assemble_jacobian_t

            return assemble_jacobian_t(
                ctx, solver.face_ctxs, solver.mask, wa, dwa, phys, scheme
            )
        return ns.assemble_jacobian(
            ctx, solver.face_ctxs, solver.mask, wa, dwa, phys, scheme,
        )

    cargs = (ctx, solver.face_ctxs, solver.mask, wg, dwgold, dwg)
    by_f_xla = xla_bytes(resid, *cargs)
    jmat = jax.jit(jac).lower(*cargs).compile()(*cargs)
    by_j_xla = xla_bytes(jac, *cargs)
    f = jax.jit(resid)(*cargs)

    def spmv10(mat, x):
        def body(_, v):
            y = mat.matvec_t(v) if lat else mat.matvec(v)
            return y / jnp.linalg.norm(y.reshape(-1))

        return jax.lax.fori_loop(0, 10, body, x)

    by_s_xla = xla_bytes(spmv10, jmat, f)

    # the bench's analytic model (bench.py, kept in sync)
    ne, n_nodes = mesh.num_tet, mesh.num_node
    nnz = int(solver.sparsity.col_ind.size)
    pr = nnz / n_nodes if kind == "delaunay" else 15
    fsz = 4
    by_f = ne * (22 + 2 * 4 * 6) * fsz + n_nodes * 6 * fsz
    by_j = (
        ne * (22 + 2 * 4 * 6) * fsz
        + 3 * ne * 16 * 18 * fsz
        + n_nodes * pr * 18 * fsz
    )
    by_s = 10 * (n_nodes * pr * (18 + 6) * fsz + n_nodes * 12 * fsz)

    doc = dict(
        metric="roofline_model_vs_xla_bytes",
        mesh=kind,
        num_tet=ne,
        platform=jax.devices()[0].platform,
        stages=dict(
            residual=dict(model=by_f, xla=by_f_xla, ratio=by_f_xla / by_f),
            jacobian=dict(model=by_j, xla=by_j_xla, ratio=by_j_xla / by_j),
            spmv10=dict(model=by_s, xla=by_s_xla, ratio=by_s_xla / by_s),
        ),
        total_model=by_f + by_j + by_s,
        total_xla=by_f_xla + by_j_xla + by_s_xla,
        total_ratio=(by_f_xla + by_j_xla + by_s_xla) / (by_f + by_j + by_s),
        note=(
            "xla = compiler 'bytes accessed' of the pure-XLA stage "
            "variants (counts every fusion operand incl. "
            "re-materialization: an upper bound on true HBM traffic); "
            "model = bench.py's minimal-traffic denominator. ratio >= 1 "
            "confirms the model does not overstate the roofline (which "
            "would inflate vs_baseline)."
        ),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = (
        "ROOFLINE_CHECK.json" if kind == "box" else "ROOFLINE_CHECK_DELAUNAY.json"
    )
    with open(os.path.join(repo, name), "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
