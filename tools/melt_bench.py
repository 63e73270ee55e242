"""BASELINE config #3 artifact: moving-laser melt-pool at full size.

Runs the melt-pool scenario (implicit scalar stepping, moving volumetric
heat source) for a few steps on the current device and writes
MELT_TPU.json: per-step wall times, Newton iterations, and which assembly
path carried the run. Round 3 excluded this scenario from the fast path
(`implicit_scalars` forced the general gather path, 0.73 s/step at 511k
tets); the lattice rows kernel now emits the consistent phi/T transport
tangents (fem.pallas_kernels lhs rows `scalar_implicit`), so the one
production scenario with live thermal physics runs the same fused fast
path as the reference configuration.

Usage: python tools/melt_bench.py [box_n=44] [steps=4] [fixed_newton=2]
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DEDFLOW_BENCH_CACHE", "/tmp/dedflow_jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dedflow_tpu.app.scenarios import (  # noqa: E402
    laser_source,
    melt_pool_initial_state,
    melt_pool_scenario_config,
)
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 44
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    fixed_newton = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    dev = jax.devices()[0]
    dtype = jnp.float32 if dev.platform != "cpu" else None

    mesh = box_mesh(n, n, n)
    cfg = melt_pool_scenario_config()
    t0 = time.perf_counter()
    solver = NSSolver(mesh, cfg, dtype=dtype)
    fastpath = (
        "lattice" if solver.lctx is not None
        else "winell" if getattr(solver, "wctx", None) is not None
        else "gather"
    )
    setup_s = time.perf_counter() - t0
    print(
        f"melt-pool: {mesh.num_tet} tets, fastpath={fastpath}, "
        f"setup {setup_s:.1f}s",
        file=sys.stderr,
        flush=True,
    )
    wg, dwgold, dwg = (
        jnp.asarray(x, solver.dtype) for x in melt_pool_initial_state(mesh)
    )

    sch = cfg.time

    def src_at(t: float):
        t_alpha = t + sch.alpha_f * sch.dt
        return jnp.asarray(
            laser_source(cfg.physics.laser, mesh.xg, t_alpha), solver.dtype
        )

    # adaptive steps (the regime the r3 0.73 s/step README row measured)
    walls, newtons, t = [], [], 0.0
    for step in range(1, steps + 1):
        src = src_at(t)
        t0 = time.perf_counter()
        wg, dwgold, dwg, stats = solver.step(wg, dwgold, dwg, source=src)
        jax.block_until_ready(wg)
        float(jnp.sum(wg[:8]))  # force a device fetch through the tunnel
        walls.append(time.perf_counter() - t0)
        newtons.append(len(stats.rnorms) if stats is not None else -1)
        t += sch.dt
        print(
            f"step {step} wall={walls[-1]:.2f}s newton={newtons[-1]}",
            file=sys.stderr,
            flush=True,
        )

    # pipelined fixed-Newton steps (zero host syncs, production loop)
    npipe = 3
    out = solver.step_fixed(wg, dwgold, dwg, fixed_newton, source=src_at(t))
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    for _ in range(npipe):
        wg, dwgold, dwg = solver.step_fixed(
            wg, dwgold, dwg, fixed_newton, source=src_at(t)
        )
        t += sch.dt
    jax.block_until_ready(wg)
    float(jnp.sum(wg[:8]))
    pipelined = (time.perf_counter() - t0) / npipe
    print(f"pipelined {pipelined:.2f}s/step over {npipe}", file=sys.stderr)

    tmax = float(jnp.max(wg[:, 5] if wg.ndim == 2 else wg[5]))
    finite = bool(jnp.all(jnp.isfinite(wg)))
    print(f"T max {tmax:.3f} finite={finite}", file=sys.stderr)

    out = {
        "metric": "melt_pool_step_seconds",
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "num_tet": mesh.num_tet,
        "num_node": mesh.num_node,
        "fastpath": fastpath,
        "fixed_newton": fixed_newton,
        "implicit_scalars": True,
        "newton_iters": newtons,
        "step_wall_s": [round(w, 3) for w in walls],
        "value": round(min(walls[1:]) if len(walls) > 1 else walls[0], 3),
        "pipelined_step_s": round(pipelined, 3),
        "t_max": round(tmax, 4),
        "finite": finite,
        "r3_general_path_step_s": 0.73,
        "note": (
            "BASELINE config #3 (moving-laser DED, implicit phi/T "
            "tangents). r3 ran the general gather path at 0.73 s/step "
            "(README r3); the lattice rows kernel now carries the "
            "scalar_implicit tangents so the scenario takes the fused "
            "fast path. value = steady-state s/step (first step carries "
            "jit compilation)."
        ),
    }
    print(json.dumps(out))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "MELT_TPU.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
