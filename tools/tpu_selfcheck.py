"""On-hardware numerics self-check: fused Pallas vs XLA assembly paths.

The CPU test suite exercises the Pallas kernels only in interpret mode;
Mosaic (the TPU kernel compiler) could regress independently. This tool
runs on the actual device and cross-checks, at a moderate mesh size:

1. the fully-fused lattice residual kernel (fem.lattice.residual_fused)
   against the dtype-generic XLA pipeline - must agree to f32 roundoff
   (identical op order: expected exactly 0), and
2. the fully-fused lattice Jacobian kernel (jacobian_fused) against XLA -
   agree to ~1e-7 relative (benign per-slab reassociation).

Writes one JSON line to TPU_SELFCHECK.json in the repo root.

Usage: python tools/tpu_selfcheck.py [n]
"""

import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.fem.lattice import (  # noqa: E402
    _lhs_inputs,
    _reduce_lhs_planes,
    assemble_residual_t,
    build_lattice_context,
    jacobian_fused,
)
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    dev = jax.devices()[0]
    mesh = box_mesh(n, n - 2, n - 1)
    cfg = reference_scenario_config()
    s = NSSolver(mesh, cfg, dtype=jnp.float32)
    lx = build_lattice_context(mesh, dtype=jnp.float32, rows_backend="xla")
    lp = s.lctx if s.lctx is not None and s.lctx.rows_backend == "pallas" else None
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    out = {
        "metric": "tpu_selfcheck",
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "num_tet": mesh.num_tet,
        "pallas_available": lp is not None,
    }
    if lp is not None:
        # fused residual kernel (the production TPU path) vs XLA pipeline
        fp = assemble_residual_t(
            lp, s.face_ctxs, s.mask, wa, dwa, cfg.physics, cfg.time
        )
        fx = assemble_residual_t(
            lx, s.face_ctxs, s.mask, wa, dwa, cfg.physics, cfg.time
        )
        # fused Jacobian window kernel (kept as an alternative; the
        # default J path streams the unfused pipeline) vs XLA, raw
        # volume planes only
        from dedflow_tpu.fem.pallas_kernels import lhs_rows_call

        # fused kernel emits a 128-lane-aligned width W >= N whose pad
        # columns are garbage (behind FSDIAMatrixT.num_node) - compare
        # the real columns only
        jp = jacobian_fused(lp, wa.T, cfg.physics, cfg.time)[
            :, :, : lx.num_node
        ]
        jx = jnp.stack(
            _reduce_lhs_planes(
                lx,
                lhs_rows_call(
                    _lhs_inputs(lx, wa.T), cfg.physics, cfg.time,
                    backend="xla",
                ),
            )
        )[:, :16]  # fused kernel emits the 16 state-dependent comps
        r_res = float(
            jnp.abs(fp - fx).max() / (jnp.abs(fx).max() + 1e-30)
        )
        r_jac = float(
            jnp.abs(jp - jx).max() / (jnp.abs(jx).max() + 1e-30)
        )
        out.update(
            residual_fused_vs_xla_rel=r_res,
            jacobian_fused_vs_xla_rel=r_jac,
            numerics_pass=bool(r_res <= 1e-6 and r_jac <= 1e-6),
        )
    line = json.dumps(out)
    print(line)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "TPU_SELFCHECK.json"), "w") as fh:
        fh.write(line + "\n")


if __name__ == "__main__":
    main()
