"""Headline benchmark: the three BASELINE.md metrics on one device.

Prints ONE JSON line:
  {"metric": "assembly_spmv_gflops", "value": N, "unit": "GFLOP/s",
   "vs_baseline": N, "gmres_iters_per_s": N, "dem_pairs_per_s": N, ...}

- assembly+SpMV GFLOP/s at ~1M tets: residual F, Jacobian J, and ten
  6x6-block SpMVs - the per-Newton-iteration work of AssembleSystemTet +
  MatrixMatVec (assemble.cu:1467-1762, matrix.c:151-162). The reference
  publishes no numbers (BASELINE.md); its target is >60% of the TPU HBM
  roofline, so `vs_baseline` = (roofline_time / measured_time) / 0.60 and
  1.0 means the bar is met.
- GMRES iters/s at ~1M tets: a full 120-iteration right-preconditioned
  GMRES solve of J dx = F with the reference's field-split PC
  (krylov.c:56-334, 440-452), timed end to end.
- DEM contact-pairs/s at 100k particles: candidate pair-slots examined
  per second by the dense grid-resident contact sweep (dem.grid; the
  reference's DEM has no dynamics, Particle.c - capability per
  BASELINE.md config #4).

On box lattices the solver uses the gather-free structured fast path
(fem.lattice: static-shift assembly, component-major DIA matrix, fused
Pallas kernels); f32 on TPU. The f64 correctness path is exercised by the
test suite on CPU and by `--f64-check` (tools/residual_check.py).

DEDFLOW_BENCH_LATTICE selects the fast-path tier (cfg.use_lattice):
"auto" (default) uses generator metadata; "off" is metadata-blind - the
general machinery detects translation classes from the connectivity
alone, exactly as a converted (tools/mesh_convert.py) mesh would enter;
"gather" forces the fully general gather path (the floor for irregular
meshes, e.g. Delaunay).
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

_T0 = time.perf_counter()


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


def _timeit(fn, *args, r1=2, r2=8, samples=3):
    """Per-call seconds via rep-count differencing: the constant sync/fetch
    overhead of the device tunnel cancels in (T(r2) - T(r1)) / (r2 - r1).
    Calls are serialized by the device execution queue. The MEDIAN of
    `samples` independent differences is reported (the tunnel's run-to-run
    variance was the dominant noise in single-sample round-2 artifacts)."""

    def run(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    run(1)  # warm the dispatch + sync path
    ts = sorted(
        max((run(r2) - run(r1)) / (r2 - r1), 1e-9) for _ in range(samples)
    )
    return ts[samples // 2]


def _cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def log(msg):
    print(f"bench[{time.perf_counter()-_T0:8.1f}s]: {msg}", file=sys.stderr, flush=True)


def bench_assembly_spmv(platform):
    import dataclasses

    n = int(os.environ.get("DEDFLOW_BENCH_N", 55 if platform == "tpu" else 12))
    dtype = jnp.float32
    if os.environ.get("DEDFLOW_BENCH_MESH", "box") == "delaunay":
        # genuinely irregular tier: ~(n+1)^3 random points = ~box tet
        # count, RCM-reordered (the windowed kernels' locality contract;
        # production meshes get the same ordering via mesh.reorder)
        from dedflow_tpu.mesh.gen import delaunay_mesh
        from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh

        mesh = delaunay_mesh((n + 1) ** 3)
        mesh = reorder_mesh(
            mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node)
        )
    else:
        mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    if not mesh.boundaries:
        # the Delaunay floor mesh carries no boundary tables: drop the
        # scenario's BCs (assembly+SpMV throughput is BC-independent)
        cfg = dataclasses.replace(cfg, bcs=())
    chunk_env = int(os.environ.get("DEDFLOW_BENCH_CHUNK", 0))
    cfg = dataclasses.replace(
        cfg,
        assembly_chunk=chunk_env or None,
        scatter_method=os.environ.get(
            "DEDFLOW_BENCH_SCATTER",
            # irregular meshes: the degree-tiered gather plan (sparse.tiered);
            # box/class meshes: the G-uniform grouped plan
            "tiered"
            if os.environ.get("DEDFLOW_BENCH_MESH", "box") == "delaunay"
            else "grouped",
        ),
        elements_kernel=os.environ.get(
            "DEDFLOW_BENCH_EKERNEL", "pallas" if platform == "tpu" else "xla"
        ),
        use_lattice=os.environ.get(
            "DEDFLOW_BENCH_LATTICE",
            "winell"
            if os.environ.get("DEDFLOW_BENCH_MESH", "box") == "delaunay"
            else "auto",
        ),
    )
    solver = NSSolver(mesh, cfg, dtype=dtype)
    win = getattr(solver, "wctx", None) is not None
    lat = solver.lctx is not None or win
    # which fast-path mechanism is active: "lattice" = generator metadata,
    # "classes" = translation classes detected from `ien` alone (the
    # metadata-blind path converted meshes take), "winell" = windowed
    # irregular kernels (Delaunay-class), "gather" = fully general
    mech = (
        "gather" if not lat
        else "winell" if win
        else "classes" if cfg.use_lattice == "off" or mesh.lattice is None
        else "lattice"
    )
    print(
        f"bench: platform={platform} mesh {mesh.num_tet} tets"
        f" {mesh.num_node} nodes dtype={dtype.__name__} fastpath={mech}",
        file=sys.stderr,
    )
    wg, dwgold, dwg = reference_initial_state(mesh)
    wg, dwgold, dwg = (jnp.asarray(x, dtype=dtype) for x in (wg, dwgold, dwg))

    phys, scheme = cfg.physics, cfg.time
    chunk = cfg.assembly_chunk
    method = cfg.scatter_method
    ctx = solver.solve_ctx

    # ctx/face_ctxs/mask MUST be jit *arguments*: closing over them embeds
    # the mesh tables as XLA constants, which multiplies compile time and
    # program size by the mesh size.
    from dedflow_tpu.solver import newton as nt

    def resid(ctx, face_ctxs, mask, wg, dwgold, dwg):
        return nt.residual(
            ctx, face_ctxs, mask, wg, dwgold, dwg, phys, scheme, True, chunk,
            None, None, method, cfg.elements_kernel,
        )

    def jac(ctx, face_ctxs, mask, wg, dwgold, dwg):
        wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)
        if win:
            from dedflow_tpu.fem.win_assembly import jacobian_win

            return jacobian_win(ctx, wa, phys, scheme).zero_rows_t(mask.T)
        if lat:
            from dedflow_tpu.fem.lattice import assemble_jacobian_t

            return assemble_jacobian_t(
                ctx, face_ctxs, mask, wa, dwa, phys, scheme
            )
        return ns.assemble_jacobian(
            ctx, face_ctxs, mask, wa, dwa, phys, scheme, chunk, method,
            False, cfg.elements_kernel,
        )

    n_spmv = 10
    # in-jit repetitions per timed stage; the windowed-tier Jacobian's
    # transients run ~5 GB at 1.18M tets, so keep its loop short (HBM)
    n_rep = 4 if win else 8

    # Every stage is timed as an in-jit loop with a carried data
    # dependency: ONE dispatch + ONE device sync per measurement, so the
    # multi-second tunnel sync latency cannot contaminate the numbers
    # (rep-count differencing alone is sensitive to sync variance).
    def resid_loop(ctx, face_ctxs, mask, wg, dwgold, dwg):
        def body(_, d):
            fr = resid(ctx, face_ctxs, mask, wg, dwgold, d)
            # full-dependency carry XLA cannot fold away: one output
            # entry perturbs one input entry per rep (a `0.0 * sum`
            # carry was constant-folded in one r03 run, timing "0.2 ms")
            return d.at[0, 0].add(1e-6 * fr[0, 0])

        return resid(
            ctx, face_ctxs, mask, wg, dwgold,
            jax.lax.fori_loop(0, n_rep - 1, body, dwg),
        )

    def jac_loop(ctx, face_ctxs, mask, wg, dwgold, dwg):
        def body(_, d):
            jm = jac(ctx, face_ctxs, mask, wg, dwgold, d)
            leaf = jax.tree_util.tree_leaves(jm)[0]
            return d.at[0, 0].add(1e-6 * leaf.reshape(-1)[0])

        return jac(
            ctx, face_ctxs, mask, wg, dwgold,
            jax.lax.fori_loop(0, n_rep - 1, body, dwg),
        )

    def spmv_loop(mat, x):
        mv = mat.matvec_t if lat else mat.matvec

        def body(_, v):
            y = mv(v)
            return y / jnp.linalg.norm(y.reshape(-1))

        return jax.lax.fori_loop(0, n_spmv, body, x)

    # Stages are compiled, timed, and released SEQUENTIALLY: the windowed
    # tier's Jacobian transients peak at several GB, so the timing loops
    # must not coexist on the device.
    cargs = (ctx, solver.face_ctxs, solver.mask)
    resid_c = jax.jit(resid).lower(*cargs, wg, dwgold, dwg).compile()
    resid_loop_c = jax.jit(resid_loop).lower(*cargs, wg, dwgold, dwg).compile()
    log("resid compiled")
    f = resid_c(*cargs, wg, dwgold, dwg)
    t_f = _timeit(resid_loop_c, *cargs, wg, dwgold, dwg, r1=1, r2=3) / n_rep
    log(f"resid timed {t_f*1e3:.1f} ms")
    del resid_loop_c

    jac_c = jax.jit(jac).lower(*cargs, wg, dwgold, dwg).compile()
    jac_loop_c = jax.jit(jac_loop).lower(*cargs, wg, dwgold, dwg).compile()
    log("jac compiled")
    jmat = jac_c(*cargs, wg, dwgold, dwg)
    t_j = _timeit(jac_loop_c, *cargs, wg, dwgold, dwg, r1=1, r2=3) / n_rep
    log(f"jac timed {t_j*1e3:.1f} ms")
    del jac_loop_c

    spmv_c = jax.jit(spmv_loop).lower(jmat, f).compile()
    log("spmv compiled")
    t_s = _timeit(spmv_c, jmat, f, r1=2, r2=8)  # one call = 10 matvecs
    log(f"spmv timed {t_s*1e3:.1f} ms")

    fl_f, _ = _cost(resid_c)
    fl_j, _ = _cost(jac_c)
    fl_s, _ = _cost(spmv_c)
    if win:
        # XLA cost analysis cannot see inside Pallas kernels: add the
        # element-kernel flops from a small-size XLA compile, scaled.
        from dedflow_tpu.fem import pallas_kernels as pk

        m_probe = 4096

        def probe(fn, rows):
            x = jnp.ones((rows, m_probe), jnp.float32)
            c = jax.jit(lambda v: fn(v, phys, scheme, backend="xla"))
            fl, _ = _cost(c.lower(x).compile())
            return fl / m_probe

        fl_f += probe(pk.res_rows_call, 67) * mesh.num_tet
        fl_j += probe(pk.lhs_rows_call, 27) * mesh.num_tet
        fl_s += n_spmv * 2.0 * 18 * solver.sparsity.col_ind.size
    elif lat:
        # XLA cost analysis cannot see inside Pallas kernels: add their
        # flops from a small-size compile of the identical XLA body
        # (pallas_kernels._res_rows/_lhs_rows), scaled per lane.
        from dedflow_tpu.fem import pallas_kernels as pk

        m_probe = 4096
        lanes = len(ctx.deltas) * ctx.npad

        def probe(fn, rows):
            x = jnp.ones((rows, m_probe), jnp.float32)
            c = jax.jit(lambda v: fn(v, phys, scheme, backend="xla"))
            fl, _ = _cost(c.lower(x).compile())
            return fl / m_probe

        fl_f += probe(pk.res_rows_call, 67) * lanes
        fl_j += probe(pk.lhs_rows_call, 27) * lanes
        # the Pallas DIA SpMV: ~2 flops per stored component + x fuse
        fl_s += n_spmv * 2.0 * 15 * 18 * mesh.num_node

    # Analytic minimal HBM traffic (roofline): geometry+gathers+updates
    # for the two assemblies, matrix+x for each SpMV.
    ne = mesh.num_tet
    n_nodes = mesh.num_node
    # stored entries per row: the box stencil's 15, or the ACTUAL mean
    # nodal degree on irregular meshes (Delaunay ~16.5) - the minimal
    # matrix traffic is what is actually stored
    nnz = int(solver.sparsity.col_ind.size)
    pr = nnz / n_nodes if mech in ("winell", "gather") else 15
    fsz = jnp.dtype(dtype).itemsize
    by_f = ne * (22 + 2 * 4 * 6) * fsz + n_nodes * 6 * fsz
    by_j = ne * (22 + 2 * 4 * 6) * fsz + 3 * ne * 16 * 18 * fsz + n_nodes * pr * 18 * fsz
    by_s = n_spmv * (n_nodes * pr * (18 + 6) * fsz + n_nodes * 12 * fsz)

    total_t = t_f + t_j + t_s
    total_fl = fl_f + fl_j + fl_s
    total_by = by_f + by_j + by_s
    gflops = total_fl / total_t / 1e9
    bw = _bandwidth(jax.devices()[0])
    sol_frac = (total_by / bw) / total_t
    print(
        f"bench: F {t_f*1e3:.1f} ms  J {t_j*1e3:.1f} ms  "
        f"{n_spmv}xSpMV {t_s*1e3:.1f} ms | "
        f"flops {total_fl/1e9:.1f} G  bytes {total_by/1e9:.2f} GB | "
        f"SoL frac {sol_frac:.3f}",
        file=sys.stderr,
    )

    # ---- GMRES iters/s: full 120-iteration preconditioned solve --------
    from dedflow_tpu.solver.krylov import gmres

    gm_it = int(os.environ.get("DEDFLOW_BENCH_GMRES_IT", 120))  # main.c:406

    def gsolve(jm, b):
        if lat:
            from dedflow_tpu.solver.pc import NSFieldSplitPCT

            pc = NSFieldSplitPCT.from_diag_rows(jm.diag_rows())
            mv = jm.matvec_t
        else:
            from dedflow_tpu.solver.pc import NSFieldSplitPC

            pc = NSFieldSplitPC.from_matrix(jm)
            mv = jm.matvec
        # rtol=atol=0: never converges early -> exactly gm_it iterations
        return gmres(mv, b, maxit=gm_it, atol=0.0, rtol=0.0, pc=pc).x

    try:
        gsolve_c = jax.jit(gsolve).lower(jmat, f).compile()
        log("gmres compiled")
        t_g = _timeit(gsolve_c, jmat, f, r1=1, r2=3)
        gmres_iters_per_s = gm_it / t_g
        log(f"gmres timed {t_g*1e3:.1f} ms for {gm_it} iters "
            f"({gmres_iters_per_s:.0f} iters/s)")
    except Exception as e:  # noqa: BLE001 - keep the primary metric alive
        log(f"gmres bench failed ({type(e).__name__}); reporting -1")
        t_g, gmres_iters_per_s = -1.0, -1.0

    # ---- time-to-residual: wall clock to a FIXED 1e-6 relative linear
    # residual (the iters/s metric above cannot show iteration-count wins;
    # this one rewards both a stronger PC and cheaper iterations).
    solves = {}
    if win:
        from dedflow_tpu.solver.amg import AMGSchurPCT
        from dedflow_tpu.solver.pc import NSFieldSplitPCT

        # AMG plan for the pc='mg' variant: the context's own (built when
        # cfg.krylov.pc == 'mg'), else the same shared helper the context
        # uses - bench and production cannot drift
        wctx = solver.wctx
        if wctx.amg_idx is not None:
            amg_idx, amg_eon = wctx.amg_idx, wctx.amg_eon
        else:
            from dedflow_tpu.fem.win_assembly import build_win_amg

            amg_idx, amg_eon = build_win_amg(
                solver.sparsity, wctx.win_plan, mesh.num_node
            )

        win_variants = {
            "fieldsplit": lambda jm: NSFieldSplitPCT.from_diag_rows(
                jm.diag_rows()
            ),
            "mg": lambda jm: AMGSchurPCT.from_winell(jm, amg_idx, amg_eon),
        }
        # the mg variant can be skipped (DEDFLOW_BENCH_WIN_MG=0): a TPU
        # worker fault in one variant poisons the device for every later
        # section (the try/except below cannot catch a device crash)
        if os.environ.get("DEDFLOW_BENCH_WIN_MG", "1") == "0":
            win_variants.pop("mg")
        for name, mk in win_variants.items():

            def tsolve(jm, b, mk=mk):
                sol = gmres(
                    jm.matvec_t, b, maxit=400, atol=0.0, rtol=1e-6,
                    pc=mk(jm),
                )
                return sol.x, sol.iters, sol.resnorm, sol.resnorm0

            try:
                c = jax.jit(tsolve).lower(jmat, f).compile()
                x_, it_, rn, rn0 = c(jmat, f)
                t_v = _timeit(lambda jm, b: c(jm, b)[0], jmat, f, r1=1, r2=3)
                solves[name] = dict(
                    ms=t_v * 1e3,
                    iters=int(it_),
                    rel=float(rn / max(float(rn0), 1e-30)),
                )
                log(f"solve[{name}] {t_v*1e3:.1f} ms, {int(it_)} iters")
            except Exception as e:  # noqa: BLE001
                log(f"solve[{name}] failed ({type(e).__name__}: {str(e)[:120]})")
    elif lat:
        from dedflow_tpu.solver.mg import MGSIMPLEPCT
        from dedflow_tpu.solver.pc import NSFieldSplitPCT, SIMPLEPCT

        restart = int(os.environ.get("DEDFLOW_BENCH_RESTART", 0)) or None
        dims = ctx.dims
        variants = {
            "fieldsplit": (
                lambda jm: NSFieldSplitPCT.from_diag_rows(jm.diag_rows()),
                restart,
            ),
            "simple": (
                lambda jm: SIMPLEPCT.from_matrix(jm, sweeps=6, omega=0.8),
                restart,
            ),
            "mg": (
                lambda jm: MGSIMPLEPCT.from_matrix(jm, dims=dims),
                restart,
            ),
        }
        if dims is None:
            # class-tier contexts are geometry-blind, but the grid is
            # recoverable from the stencil offsets (solver.mg.infer_dims)
            from dedflow_tpu.solver.mg import infer_dims

            dims = infer_dims(ctx.offsets, ctx.num_node)
            if dims is None:
                variants.pop("mg")
        for name, (mkpc, restart) in variants.items():
            def tsolve(jm, b, mkpc=mkpc, restart=restart):
                sol = gmres(
                    jm.matvec_t, b, maxit=400, atol=0.0, rtol=1e-6,
                    pc=mkpc(jm), restart=restart,
                )
                return sol.x, sol.iters, sol.resnorm, sol.resnorm0

            try:
                c = jax.jit(tsolve).lower(jmat, f).compile()
                x_, it_, rn, rn0 = c(jmat, f)
                t_v = _timeit(lambda jm, b: c(jm, b)[0], jmat, f, r1=1, r2=3)
                solves[name] = dict(
                    ms=t_v * 1e3,
                    iters=int(it_),
                    rel=float(rn / max(float(rn0), 1e-30)),
                )
                log(f"solve[{name}] {t_v*1e3:.1f} ms, {int(it_)} iters, "
                    f"rel {solves[name]['rel']:.2e}")
            except Exception as e:  # noqa: BLE001
                log(f"solve[{name}] failed ({type(e).__name__})")

    return dict(
        solves=solves,
        gflops=gflops,
        sol_frac=sol_frac,
        gmres_iters_per_s=gmres_iters_per_s,
        t_f_ms=t_f * 1e3,
        t_j_ms=t_j * 1e3,
        t_spmv_ms=t_s * 1e3 / n_spmv,
        t_gmres_ms=t_g * 1e3,
        num_tet=ne,
        lattice=lat,
        fastpath=mech,
    )


def bench_dem(platform):
    """DEM grid-path contact sweeps (BASELINE config #4).

    Three cases, each with the cell CAPACITY chosen from the actual
    occupancy distribution (max initial occupancy + headroom) instead of
    a fixed 8 - at dilute densities the dense sweep's padded lanes are
    the whole cost, so K tracks what the packing needs:
      - uniform 100k @ ~9% solids (the round-3 configuration),
      - settled bed 100k @ ~45% solids (jittered cubic packing - the
        regime a powder-settling run actually spends its time in),
      - uniform 1M @ ~9% solids in a 2.15x box (scaling row).
    """
    from dedflow_tpu.dem.cells import cell_coords, make_grid
    from dedflow_tpu.dem.grid import grid_run, to_grid
    from dedflow_tpu.dem.integrate import DEMConfig
    from dedflow_tpu.dem.particles import particle_state

    radius = 0.006
    nsub = 10

    def run_case(name, x, box_hi):
        p = x.shape[0]
        st = particle_state(x, radius=radius, mass=1.0)
        # capacity from the actual occupancy: max + 1 headroom, >= 2
        probe = make_grid([0, 0, 0], box_hi, cell_size=2.5 * radius, capacity=2)
        cc = cell_coords(probe, jnp.asarray(x))
        cid = (
            cc[:, 0] * probe.dims[1] + cc[:, 1]
        ) * probe.dims[2] + cc[:, 2]
        occ = np.bincount(np.asarray(cid), minlength=probe.num_cell)
        k = max(2, int(occ.max()) + 1)
        grid = make_grid(
            [0, 0, 0], box_hi, cell_size=2.5 * radius, capacity=k
        )
        cfg = DEMConfig(
            grid=grid, dt=1e-5, walls_lo=(0, 0, 0), walls_hi=tuple(box_hi)
        )
        gs = to_grid(grid, st, p)
        dropped = p - int(np.asarray(jnp.sum(gs.mask)))
        run = jax.jit(lambda g: grid_run(cfg, g, 1.0, nsub))
        run(gs)  # compile
        t = _timeit(run, gs, r1=1, r2=3)
        nc = grid.num_cell
        pairs = 27.0 * k * k * nc * nsub
        # honest throughput: ACTUAL candidate pairs (occupied x occupied
        # within the 27-cell neighborhood)
        occg = np.asarray(jnp.sum(gs.mask, axis=0)).reshape(grid.dims)
        cand = 0.0
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                for dz in (-1, 0, 1):
                    sh = np.zeros_like(occg)
                    src = occg[
                        max(dx, 0) : occg.shape[0] + min(dx, 0),
                        max(dy, 0) : occg.shape[1] + min(dy, 0),
                        max(dz, 0) : occg.shape[2] + min(dz, 0),
                    ]
                    sh[
                        max(-dx, 0) : occg.shape[0] + min(-dx, 0),
                        max(-dy, 0) : occg.shape[1] + min(-dy, 0),
                        max(-dz, 0) : occg.shape[2] + min(-dz, 0),
                    ] = src
                    cand += float((occg * sh).sum())
        out = dict(
            particles=p,
            capacity=k,
            dims=list(grid.dims),
            dropped=dropped,
            t_substep_ms=t / nsub * 1e3,
            pair_slots_per_s=27.0 * k * k * nc * nsub / t,
            candidate_pairs_per_s=cand * nsub / t,
        )
        log(
            f"dem[{name}]: {p} particles K={k} grid {grid.dims} "
            f"{t/nsub*1e3:.2f} ms/substep "
            f"({out['pair_slots_per_s']/1e9:.2f} G slots/s, "
            f"{out['candidate_pairs_per_s']/1e9:.3f} G candidate-pairs/s, "
            f"dropped {dropped})"
        )
        return out

    rng = np.random.RandomState(0)
    p0 = int(os.environ.get("DEDFLOW_BENCH_DEM_P", 100_000))
    cases = {}
    x_uni = rng.uniform(0.02, 0.98, size=(p0, 3)).astype(np.float32)
    cases["uniform_100k"] = run_case("uniform_100k", x_uni, (1, 1, 1))

    # settled bed at ~45% solids: jittered cubic packing in a slab
    s = radius * (4.0 * np.pi / (3.0 * 0.45)) ** (1.0 / 3.0)
    npx = int(1.0 / s)
    nz_layers = -(-p0 // (npx * npx))
    ii = np.arange(p0)
    gx = (ii % npx + 0.5) * s
    gy = ((ii // npx) % npx + 0.5) * s
    gz = (ii // (npx * npx) + 0.5) * s
    jit = (rng.uniform(-0.08, 0.08, size=(p0, 3)) * s).astype(np.float32)
    x_bed = np.stack([gx, gy, gz], axis=1).astype(np.float32) + jit
    cases["settled_bed_100k"] = run_case("settled_bed_100k", x_bed, (1, 1, 1))

    if os.environ.get("DEDFLOW_BENCH_DEM_BIG", "1") != "0":
        p1 = 1_000_000
        side = (p1 / p0) ** (1.0 / 3.0)
        x_big = (
            rng.uniform(0.02, 0.98, size=(p1, 3)).astype(np.float32) * side
        )
        cases["uniform_1M"] = run_case("uniform_1M", x_big, (side,) * 3)

    head = cases["uniform_100k"]
    return dict(
        dem_pairs_per_s=head["pair_slots_per_s"],
        dem_candidate_pairs_per_s=max(
            c["candidate_pairs_per_s"] for c in cases.values()
        ),
        t_substep_ms=head["t_substep_ms"],
        cases=cases,
    )


def main() -> None:
    # persistent compile cache: repeat bench runs on the same host skip
    # the ~2-6 min kernel compiles
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("DEDFLOW_BENCH_CACHE", "/tmp/dedflow_jax_cache_tpu"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass
    platform = jax.devices()[0].platform
    # Each section retries once: the experimental device tunnel can throw
    # transient UNAVAILABLE faults; the primary metric must still emit.
    def attempt(fn, *a):
        try:
            return fn(*a)
        except Exception as e:  # noqa: BLE001 - deliberate fault barrier
            log(f"section {fn.__name__} failed ({type(e).__name__}: "
                f"{str(e)[:200]}); retrying once")
            # drop the failed frames' device-buffer references before the
            # retry (a RESOURCE_EXHAUSTED retry otherwise re-allocates on
            # top of the dead attempt's live arrays)
            import gc

            e.__traceback__ = None
            del e
            gc.collect()
            return fn(*a)

    if os.environ.get("DEDFLOW_BENCH_DEM_ONLY"):
        # subprocess mode (see below): emit ONLY the DEM dict as JSON
        dem = bench_dem(platform)
        print(json.dumps(dem))
        return

    asm = attempt(bench_assembly_spmv, platform)
    # The DEM section runs in a SUBPROCESS with a hard timeout: a device
    # hang (observed: a wedged TPU worker blocks the client in C with no
    # Python signal delivery) or a worker crash must not take down the
    # primary metric - in-process try/except cannot bound a hang.
    dem = None
    try:
        import subprocess

        env = dict(os.environ, DEDFLOW_BENCH_DEM_ONLY="1")
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            timeout=float(os.environ.get("DEDFLOW_BENCH_DEM_TIMEOUT", 1800)),
        )
        sys.stderr.write(r.stderr)
        if r.returncode == 0 and r.stdout.strip():
            dem = json.loads(r.stdout.strip().splitlines()[-1])
        else:
            log(f"dem subprocess rc={r.returncode}; reporting -1")
    except subprocess.TimeoutExpired:
        log("dem subprocess timed out (device hang?); reporting -1")
    except Exception as e:  # noqa: BLE001
        log(f"dem subprocess failed ({type(e).__name__}); reporting -1")
    if dem is None:
        dem = dict(dem_pairs_per_s=-1.0, t_substep_ms=-1.0)
    print(
        json.dumps(
            {
                "metric": "assembly_spmv_gflops",
                "value": round(asm["gflops"], 2),
                "unit": "GFLOP/s",
                "vs_baseline": round(asm["sol_frac"] / 0.60, 3),
                "gmres_iters_per_s": round(asm["gmres_iters_per_s"], 1),
                "dem_pairs_per_s": round(dem["dem_pairs_per_s"] / 1e9, 2),
                "dem_pairs_unit": "G pair-slots/s",
                "dem_candidate_pairs_per_s": round(
                    dem.get("dem_candidate_pairs_per_s", -1.0) / 1e9, 3
                ),
                "detail": {
                    "gmres_to_1e6": asm.get("solves"),
                    "t_f_ms": round(asm["t_f_ms"], 2),
                    "t_j_ms": round(asm["t_j_ms"], 2),
                    "t_spmv_ms": round(asm["t_spmv_ms"], 3),
                    "t_gmres120_ms": round(asm["t_gmres_ms"], 1),
                    "t_dem_substep_ms": round(dem["t_substep_ms"], 2),
                    "dem_cases": dem.get("cases"),
                    "num_tet": asm["num_tet"],
                    "lattice": asm["lattice"],
                    "fastpath": asm["fastpath"],
                },
            }
        )
    )


if __name__ == "__main__":
    main()
