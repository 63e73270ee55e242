"""Headline benchmark: Assembly+SpMV GFLOP/s at ~1M tets (BASELINE.json).

Prints ONE JSON line:
  {"metric": "assembly_spmv_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); its target is >60% of
TPU speed-of-light on assembly+SpMV. `vs_baseline` is therefore the
achieved fraction of the HBM-bandwidth roofline divided by 0.60, so 1.0
means the 60%-of-SoL bar is met. Roofline time = bytes-accessed (from the
compiled XLA cost analysis) / device HBM bandwidth.

Stages measured (the reference's hot loop, SURVEY.md section 3.3):
residual assembly F, Jacobian assembly J, and 6x6-block BSR SpMV - the
per-Newton-iteration work of AssembleSystemTet + MatrixMatVec
(assemble.cu:1467-1762, matrix.c:151-162). f32 on TPU (f64 is emulated);
the f64 correctness path is exercised by the test suite on CPU.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.solver.newton import NSSolver

# HBM bandwidth (bytes/s) by device kind substring; conservative default.
_HBM_BW = {
    "v4": 1.23e12,
    "v5 lite": 8.19e11,
    "v5e": 8.19e11,
    "v5p": 2.77e12,
    "v6 lite": 1.64e12,
    "v6e": 1.64e12,
    "cpu": 5.0e10,
}


def _bandwidth(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _HBM_BW.items():
        if key in kind:
            return bw
    return 8.19e11


def _sync(out):
    """Barrier that works even where block_until_ready is unreliable
    (the experimental axon TPU tunnel): fetch one scalar derived from the
    output, which cannot complete before the computation does."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf.reshape(-1)[:8]))


def _timeit(fn, *args, r1=2, r2=8):
    """Per-call seconds via rep-count differencing: the constant sync/fetch
    overhead of the device tunnel cancels in (T(r2) - T(r1)) / (r2 - r1).
    Calls are serialized by the device execution queue."""

    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    run(1)  # warm compile + sync path
    run(1)
    t_a = min(run(r1) for _ in range(2))
    t_b = min(run(r2) for _ in range(2))
    return max((t_b - t_a) / (r2 - r1), 1e-9), None


def _cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main() -> None:
    global _T0
    _T0 = time.perf_counter()
    platform = jax.devices()[0].platform
    n = int(os.environ.get("DEDFLOW_BENCH_N", 55 if platform == "tpu" else 12))
    dtype = jnp.float32
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    print(
        f"bench: platform={platform} mesh {mesh.num_tet} tets"
        f" {mesh.num_node} nodes dtype={dtype.__name__}",
        file=sys.stderr,
    )
    import dataclasses
    chunk_env = int(os.environ.get("DEDFLOW_BENCH_CHUNK", 0))
    cfg = dataclasses.replace(
        cfg,
        assembly_chunk=chunk_env or None,
        scatter_method=os.environ.get("DEDFLOW_BENCH_SCATTER", "grouped"),
        elements_kernel=os.environ.get(
            "DEDFLOW_BENCH_EKERNEL", "pallas" if platform == "tpu" else "xla"
        ),
    )
    solver = NSSolver(mesh, cfg, dtype=dtype)
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, dtype=dtype) for x in (wg, dwgold, dwg))

    phys, scheme = cfg.physics, cfg.time

    # ctx/face_ctxs/mask MUST be jit *arguments*: closing over them embeds
    # the mesh tables as XLA constants, which multiplies compile time and
    # program size by the mesh size.
    chunk = cfg.assembly_chunk

    method = cfg.scatter_method

    def resid(ctx, face_ctxs, mask, wg, dwgold, dwg):
        wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
        return ns.assemble_residual(
            ctx, face_ctxs, mask, wa, dwa, phys, scheme, True, chunk,
            None, None, method, cfg.elements_kernel,
        )

    def jac(ctx, face_ctxs, mask, wg, dwgold, dwg):
        wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
        return ns.assemble_jacobian(
            ctx, face_ctxs, mask, wa, dwa, phys, scheme, chunk, method,
            False, cfg.elements_kernel,
        )

    n_spmv = 10

    def spmv_loop(mat, x):
        def body(_, v):
            y = mat.matvec(v)
            return y / jnp.linalg.norm(y.reshape(-1))

        return jax.lax.fori_loop(0, n_spmv, body, x)

    def log(msg):
        print(f"bench[{time.perf_counter()-_T0:8.1f}s]: {msg}", file=sys.stderr, flush=True)

    cargs = (solver.ctx, solver.face_ctxs, solver.mask)
    resid_c = jax.jit(resid).lower(*cargs, wg, dwgold, dwg).compile()
    log("resid compiled")
    jac_c = jax.jit(jac).lower(*cargs, wg, dwgold, dwg).compile()
    log("jac compiled")
    jmat = jac_c(*cargs, wg, dwgold, dwg)
    f = resid_c(*cargs, wg, dwgold, dwg)
    spmv_c = jax.jit(spmv_loop).lower(jmat, f).compile()
    log("spmv compiled")

    t_f, _ = _timeit(resid_c, *cargs, wg, dwgold, dwg)
    log(f"resid timed {t_f*1e3:.1f} ms")
    t_j, _ = _timeit(jac_c, *cargs, wg, dwgold, dwg)
    log(f"jac timed {t_j*1e3:.1f} ms")
    t_s, _ = _timeit(spmv_c, jmat, f)
    log(f"spmv timed {t_s*1e3:.1f} ms")

    fl_f, _ = _cost(resid_c)
    fl_j, _ = _cost(jac_c)
    fl_s, _ = _cost(spmv_c)

    # Analytic minimal HBM traffic (roofline): geometry+gathers+updates
    # for the two assemblies, matrix+gathered x for each SpMV.
    ne = solver.ctx.num_elem
    n_nodes = solver.ctx.num_node
    pr = solver.ctx.ell_width
    fsz = jnp.dtype(dtype).itemsize
    by_f = ne * (22 + 2 * 4 * 6) * fsz + n_nodes * 6 * fsz
    by_j = ne * (22 + 2 * 4 * 6) * fsz + 3 * ne * 16 * 18 * fsz + n_nodes * pr * 18 * fsz
    by_s = n_spmv * (n_nodes * pr * (18 + 6) * fsz + n_nodes * 12 * fsz)

    total_t = t_f + t_j + t_s
    total_fl = fl_f + fl_j + fl_s
    total_by = by_f + by_j + by_s
    gflops = total_fl / total_t / 1e9
    bw = _bandwidth(jax.devices()[0])
    sol_time = total_by / bw
    sol_frac = sol_time / total_t
    print(
        f"bench: F {t_f*1e3:.1f} ms  J {t_j*1e3:.1f} ms  "
        f"{n_spmv}xSpMV {t_s*1e3:.1f} ms | "
        f"flops {total_fl/1e9:.1f} G  bytes {total_by/1e9:.2f} GB | "
        f"SoL frac {sol_frac:.3f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "assembly_spmv_gflops",
                "value": round(gflops, 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(sol_frac / 0.60, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
