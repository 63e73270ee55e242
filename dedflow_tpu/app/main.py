"""Simulation driver CLI - the configurable replacement for main.c.

The reference driver is a hard-coded program: fixed input file
(main.c:360), fixed 4000x5e-2 time loop (main.c:24, 331), hard-coded BCs
(main.c:454-477), snapshot every 10 steps (main.c:571), resume only by
editing a variable and recompiling (main.c:480-503). This CLI exposes all
of it as flags/config (SURVEY.md section 5, config/flag system):

    python -m dedflow_tpu.app.main --box 8 8 8 --steps 20 --out run/
    python -m dedflow_tpu.app.main --mesh box.h5 --config solver.json
    python -m dedflow_tpu.app.main --box 8 8 8 --resume 100 --out run/
    python -m dedflow_tpu.app.main --box 16 8 8 --devices 4   # sharded

Outputs sol.<step>.h5 snapshots in the reference layout (with added
step/time metadata), a JSONL metrics stream, and optional profiler traces.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="dedflow-tpu", description="TPU-native FEM-DEM DED solver"
    )
    m = p.add_mutually_exclusive_group()
    m.add_argument("--mesh", help="mesh HDF5 (schema of tools/mesh_convert)")
    m.add_argument(
        "--box",
        nargs=3,
        type=int,
        metavar=("NX", "NY", "NZ"),
        help="generate a structured box mesh",
    )
    p.add_argument("--config", help="solver config JSON (config.SolverConfig)")
    p.add_argument(
        "--scenario",
        choices=["reference", "melt-pool", "cavity", "coupled"],
        default="reference",
        help="built-in scenario (reference channel flow / moving-laser DED / "
        "lid-driven cavity / coupled FEM-DEM powder settling)",
    )
    p.add_argument(
        "--particles", type=int, default=1000,
        help="particle count for --scenario coupled",
    )
    p.add_argument(
        "--particle-radius", type=float, default=None,
        help="particle radius (default: ~5%% solids fraction)",
    )
    p.add_argument(
        "--dem-substeps", type=int, default=10,
        help="DEM substeps per fluid step (coupled scenario)",
    )
    p.add_argument(
        "--no-dem-grid", action="store_true",
        help="use the candidate-list DEM path instead of the dense "
        "grid-resident one",
    )
    p.add_argument(
        "--no-lattice-recover", action="store_true",
        help="skip structured-lattice detection on --mesh files (always "
        "use the general unstructured path)",
    )
    p.add_argument("--steps", type=int, default=None, help="override num_steps")
    p.add_argument("--save-every", type=int, default=None)
    p.add_argument("--out", default=".", help="output directory")
    p.add_argument("--resume", type=int, default=0, help="resume from sol.<N>.h5")
    p.add_argument("--devices", type=int, default=1, help="shard over N devices")
    p.add_argument("--dtype", choices=["f32", "f64"], default=None)
    p.add_argument("--chunk", type=int, default=None, help="assembly chunk size")
    p.add_argument("--profile", help="jax.profiler trace directory")
    p.add_argument("--metrics", help="JSONL metrics file (default out/metrics.jsonl)")
    p.add_argument("--log-level", default="info")
    p.add_argument(
        "--platform",
        choices=["tpu", "cpu"],
        default=None,
        help="force the JAX backend (the container pins the TPU plugin "
        "regardless of JAX_PLATFORMS; this wins)",
    )
    p.add_argument(
        "--pc",
        choices=["fieldsplit", "simple", "mg"],
        default=None,
        help="Krylov preconditioner (fieldsplit = reference block-Jacobi "
        "decomposition; simple = SIMPLE pressure-Schur, ~2.5x fewer "
        "GMRES iterations; mg = SIMPLE with a geometric-multigrid Schur "
        "solve, the AMG-class option - lattice fast path only)",
    )
    p.add_argument(
        "--fixed-newton",
        type=int,
        default=None,
        help="use the fully-jitted fixed-iteration step (no convergence check)",
    )
    p.add_argument(
        "--precision",
        choices=["state", "f64", "ir"],
        default=None,
        help="linear-solve precision (config.KrylovConfig.precision): "
        "state = solve in the state dtype (fast f32 path on TPU); "
        "f64 = full f64 Krylov (XLA-emulated on TPU; the reference "
        "regime, common.h:21-59); ir = f32 GMRES + f64 iterative "
        "refinement to <=1e-10 relative linear residuals",
    )
    return p


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)

    if args.platform == "cpu" and args.devices > 1:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()

    import jax

    if args.platform:
        name = "cpu" if args.platform == "cpu" else "axon,cpu"
        try:
            jax.config.update("jax_platforms", name)
        except Exception:
            pass

    if args.precision in ("f64", "ir"):
        # f64 leaves require x64 before any array is created
        jax.config.update("jax_enable_x64", True)

    # Persistent compilation cache (same policy as tests/conftest.py):
    # the driver's cost on repeat runs is dominated by XLA compiles of the
    # jitted step; cache them across invocations.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("DEDFLOW_APP_CACHE", "/tmp/dedflow_jax_cache_app"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    import dataclasses

    from dedflow_tpu.app.scenarios import (
        laser_source,
        lid_driven_cavity_config,
        lid_driven_cavity_initial_state,
        melt_pool_initial_state,
        melt_pool_scenario_config,
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.config import load_config
    from dedflow_tpu.io.h5 import read_mesh_h5, read_solution_h5, write_solution_h5
    from dedflow_tpu.mesh.gen import box_mesh
    from dedflow_tpu.solver.newton import NSSolver
    from dedflow_tpu.utils.log import MetricsWriter, get_logger
    from dedflow_tpu.utils.profiling import trace

    log = get_logger(level=args.log_level)
    os.makedirs(args.out, exist_ok=True)

    # --- device banner (the reference's, main.c:336-355, minus CUDA-isms)
    devs = jax.devices()
    log.info("devices: %s", ", ".join(f"{d.device_kind}" for d in devs))

    # --- mesh
    node_perm = None  # recovered-lattice node permutation (old -> new)
    if args.mesh:
        mesh = read_mesh_h5(args.mesh)
        log.info("mesh %s: %d nodes, %d tets", args.mesh, mesh.num_node, mesh.num_tet)
        if mesh.lattice is None and not args.no_lattice_recover:
            from dedflow_tpu.mesh.recover import recover_lattice

            rec = recover_lattice(mesh)
            if rec is not None:
                mesh, node_perm = rec
                nx_, ny_, nz_ = mesh.lattice
                log.info(
                    "recovered %dx%dx%d lattice (%d tets/cell): "
                    "gather-free fast path enabled; solutions are written "
                    "in the file's original node order",
                    nx_, ny_, nz_, len(mesh.lattice_tets),
                )
    else:
        nx, ny, nz = args.box or (8, 8, 8)
        mesh = box_mesh(nx, ny, nz)
        log.info("box mesh %dx%dx%d: %d nodes, %d tets", nx, ny, nz,
                 mesh.num_node, mesh.num_tet)

    # --- config
    if args.config:
        cfg = load_config(args.config)
    elif args.scenario == "melt-pool":
        cfg = melt_pool_scenario_config()
    elif args.scenario == "cavity":
        cfg = lid_driven_cavity_config()
    else:
        cfg = reference_scenario_config()
    overrides = {}
    if args.steps is not None:
        overrides["num_steps"] = args.steps
    if args.save_every is not None:
        overrides["save_every"] = args.save_every
    if args.chunk is not None:
        overrides["assembly_chunk"] = args.chunk
    # fast TPU defaults for built-in scenarios (explicit config wins):
    # grouped wide-row scatter + fused Pallas element kernels
    if not args.config and devs[0].platform == "tpu":
        overrides.setdefault("scatter_method", "grouped")
        # the Jacobian path falls back to XLA by itself when the scalar
        # blocks are implicit; the residual kernel supports every mode
        overrides.setdefault("elements_kernel", "pallas")
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    if args.pc:
        cfg = dataclasses.replace(
            cfg, krylov=dataclasses.replace(cfg.krylov, pc=args.pc)
        )
    if args.precision:
        cfg = dataclasses.replace(
            cfg, krylov=dataclasses.replace(cfg.krylov, precision=args.precision)
        )
    if (
        cfg.krylov.precision == "f64"
        and devs[0].platform == "tpu"
        and mesh.num_tet > 200_000
    ):
        # XLA-emulated f64 GMRES measured ~50 s/solve at 1M tets without
        # reaching 1e-6 in 200 iterations (RESIDUAL_TPU_LARGE.json); `ir`
        # reaches <=1e-10 true f64 residuals in seconds at the same size.
        log.warning(
            "--precision f64 on TPU at %d tets runs XLA-EMULATED f64 "
            "GMRES (~10x slower than f32 and unable to meet tight "
            "tolerances at this scale); use --precision ir for 1e-10 "
            "linear residuals at f32-class speed",
            mesh.num_tet,
        )
    dtype = None
    if args.dtype:
        dtype = jnp.float32 if args.dtype == "f32" else jnp.float64
    elif args.precision == "ir":
        # ir = f32 state/assembly + f64 refinement; x64 being enabled must
        # not silently promote the whole run to f64
        dtype = jnp.float32

    # --- solver (single-chip or domain-decomposed; optionally coupled)
    sharded = args.devices > 1
    coupled = args.scenario == "coupled"
    csolver = pstate = None
    dmesh = jax.make_mesh((args.devices,), ("dd",)) if sharded else None
    if coupled:
        from dedflow_tpu.app.coupled import CoupledSolver
        from dedflow_tpu.app.scenarios import coupled_scenario_setup

        ccfg, pstate = coupled_scenario_setup(
            mesh,
            num_particles=args.particles,
            radius=args.particle_radius,
            substeps=args.dem_substeps,
            use_grid=not args.no_dem_grid,
        )
        csolver = CoupledSolver(mesh, cfg, ccfg, dtype=dtype, device_mesh=dmesh)
        solver = csolver.fluid
        log.info(
            "coupled FEM-DEM: %d particles r=%.4g, %d DEM substeps/step, "
            "grid path=%s",
            pstate.num_particle,
            float(np.asarray(pstate.radius)[0]),
            args.dem_substeps,
            not args.no_dem_grid,
        )
    elif sharded:
        from dedflow_tpu.parallel.sharded import ShardedNSSolver

        solver = ShardedNSSolver(mesh, cfg, dmesh, dtype=dtype)
    else:
        solver = NSSolver(mesh, cfg, dtype=dtype)
    if hasattr(solver, "fastpath"):
        # which assembly tier this run got (lattice / classes / winell /
        # gather) - production visibility into the auto-gate decision
        log.info("assembly fastpath: %s", solver.fastpath)
    if sharded:
        to_dev = solver.shard_state
        to_host = solver.gather_state
    else:
        to_dev = lambda a: jnp.asarray(a, dtype=solver.dtype)
        to_host = np.asarray

    # --- recovered-lattice runs keep solution files in the INPUT mesh's
    # node order (sol.<N>.h5 pairs with the user's mesh file in sol2vtk)
    if node_perm is not None:
        _inv_perm = np.argsort(node_perm)
        from_file_order = lambda a: np.asarray(a)[_inv_perm]
        to_file_order = lambda a: np.asarray(a)[node_perm]
    else:
        from_file_order = to_file_order = lambda a: a

    # --- initial / resumed state (main.c:480-533)
    step0 = args.resume
    if step0:
        snap = read_solution_h5(os.path.join(args.out, f"sol.{step0}.h5"))
        wg_np = from_file_order(snap["wg"])
        dwg_np = from_file_order(snap["dwg"])
        dwgold_np = dwg_np.copy()  # reference resumes with dwgold = dwg
        log.info("resumed from step %d", step0)
    else:
        init = {
            "melt-pool": melt_pool_initial_state,
            "cavity": lid_driven_cavity_initial_state,
        }.get(args.scenario, reference_initial_state)
        wg_np, dwgold_np, dwg_np = init(mesh)
        write_solution_h5(
            os.path.join(args.out, "sol.0.h5"),
            to_file_order(wg_np), to_file_order(dwg_np), step=0, time=0.0,
        )
    wg, dwgold, dwg = to_dev(wg_np), to_dev(dwgold_np), to_dev(dwg_np)

    metrics = MetricsWriter(args.metrics or os.path.join(args.out, "metrics.jsonl"))
    dt = cfg.time.dt

    import time as _time

    with trace(args.profile):
        for step in range(step0 + 1, step0 + cfg.num_steps + 1):
            t0 = _time.perf_counter()
            src = None
            if cfg.physics.laser is not None:
                # evaluate the moving source at the generalized-alpha level
                t_alpha = (step - 1 + cfg.time.alpha_f) * dt
                src = to_dev(
                    laser_source(cfg.physics.laser, mesh.xg, t_alpha)
                )
            if coupled:
                wg, dwgold, dwg, pstate, stats = csolver.step(
                    wg, dwgold, dwg, pstate
                )
            elif args.fixed_newton:
                wg, dwgold, dwg = solver.step_fixed(
                    wg, dwgold, dwg, num_newton=args.fixed_newton, source=src
                )
                stats = None
            else:
                out = solver.step(wg, dwgold, dwg, source=src)
                wg, dwgold, dwg = out[:3]
                stats = out[3] if len(out) > 3 else None
            wall = _time.perf_counter() - t0
            rec = {"step": step, "t": step * dt, "step_wall_s": round(wall, 4)}
            if stats is not None:
                rec["newton_iters"] = len(stats.rnorms)
                rec["converged"] = bool(stats.converged)
                if stats.rnorms:
                    rec["rnorm"] = [float(v) for v in stats.rnorms[-1]]
                rec["krylov_iters"] = stats.krylov_iters
                if getattr(stats, "linear_rels", None):
                    # relative linear residual of each Krylov solve (the
                    # 1e-10 bar with --precision ir/f64, BASELINE.md)
                    rec["linear_rel"] = [
                        float(v) for v in stats.linear_rels
                    ]
            metrics.write(**rec)
            # failure detection the reference lacks (SURVEY.md section 5):
            # a diverged/NaN state is caught at the step boundary instead
            # of silently propagating through thousands of steps.
            if stats is not None and stats.rnorms:
                if not np.isfinite(stats.rnorms[-1]).all():
                    log.error("non-finite residual at step %d; aborting", step)
                    metrics.close()
                    return 2
            log.info(
                "step %d  t=%.4f  wall=%.3fs%s",
                step,
                step * dt,
                wall,
                f"  newton={rec.get('newton_iters')}" if stats else "",
            )
            if step % cfg.save_every == 0:
                write_solution_h5(
                    os.path.join(args.out, f"sol.{step}.h5"),
                    to_file_order(to_host(wg)),
                    to_file_order(to_host(dwg)),
                    step=step,
                    time=step * dt,
                )
                if coupled:
                    from dedflow_tpu.dem.particles import save_particles

                    save_particles(
                        os.path.join(args.out, f"particles.{step}.h5"),
                        "ptc", pstate,
                    )
    metrics.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
