"""Hardware correctness check: the 1e-10 relative-residual bar ON TPU.

BASELINE.md requires Krylov solves matching the (f64) reference to 1e-10
relative residual; the CPU test suite proves this in f64, but nothing in
round 1 demonstrated it on TPU hardware (f32 fast path). This tool solves
one ~20k-tet reference-scenario system on the current device two ways:

1. f64 GMRES (XLA-emulated f64 on TPU; the reference regime,
   common.h:21-59 + krylov.c:56-334), and
2. mixed-precision iterative refinement (solver.refine.gmres_ir): f32
   GMRES inner solves + f64 residual updates - the TPU-native route.

Prints ONE JSON line with both relative residuals and writes it to
RESIDUAL_TPU.json when run from the repo root. Pass = both <= 1e-10.

Usage:  python tools/residual_check.py [n]   (mesh = box_mesh(n,n,n))
"""

import json
import os
import sys

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.fem.lattice import (  # noqa: E402
    assemble_jacobian_t,
    assemble_residual_t,
    build_lattice_context,
)
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.krylov import gmres  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402
from dedflow_tpu.solver.pc import NSFieldSplitPCT  # noqa: E402
from dedflow_tpu.solver.refine import gmres_ir  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 15  # 15^3 * 6 = 20250 tets
    dev = jax.devices()[0]
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()

    # f64 assembly (XLA rows backend: dtype-generic)
    solver = NSSolver(mesh, cfg, dtype=jnp.float64)
    lctx64 = build_lattice_context(mesh, dtype=jnp.float64, rows_backend="xla")
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float64) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    j64 = assemble_jacobian_t(
        lctx64, solver.face_ctxs, solver.mask, wa, dwa, cfg.physics, cfg.time
    )
    f64 = assemble_residual_t(
        lctx64, solver.face_ctxs, solver.mask, wa, dwa, cfg.physics, cfg.time
    )
    j32 = type(j64)(
        data=j64.data.astype(jnp.float32),
        scal=j64.scal.astype(jnp.float32),
        offsets=j64.offsets, backend=j64.backend,
    )
    pc32 = NSFieldSplitPCT.from_diag_rows(j32.diag_rows())
    bnorm = float(jnp.linalg.norm(f64.reshape(-1)))

    # 1) straight f64 GMRES (emulated f64 on TPU)
    sol64 = gmres(
        j64.matvec_t, f64, maxit=400, atol=0.0, rtol=1e-12,
        pc=NSFieldSplitPCT.from_diag_rows(j64.diag_rows()),
    )
    r64 = float(
        jnp.linalg.norm((f64 - j64.matvec_t(sol64.x)).reshape(-1))
    ) / bnorm

    # 2) mixed-precision iterative refinement (f32 Krylov + f64 updates)
    info = gmres_ir(
        j64.matvec_t,
        j32.matvec_t,
        f64,
        pc=pc32,
        tol=1e-12,
        inner_maxit=150,
        inner_rtol=1e-5,
    )

    out = {
        "metric": "krylov_relative_residual",
        "bar": 1e-10,
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "num_tet": mesh.num_tet,
        "f64_gmres_rel_residual": r64,
        "f64_gmres_iters": int(sol64.iters),
        "ir_rel_residual": info.rel_residual,
        "ir_cycles": info.cycles,
        "ir_inner_f32_iters": info.inner_iters,
        "pass": bool(r64 <= 1e-10 and info.rel_residual <= 1e-10),
    }
    line = json.dumps(out)
    print(line)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "RESIDUAL_TPU.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
