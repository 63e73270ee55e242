"""Dump the optimized HLO of assemble_jacobian_t and report every op
touching >=50 MB (dev tool for hunting stray relayouts/copies)."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("DEDFLOW_BENCH_CACHE", "/tmp/dedflow_jax_cache_tpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from dedflow_tpu.app.scenarios import (  # noqa: E402
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import lattice as lat  # noqa: E402
from dedflow_tpu.fem import ns  # noqa: E402
from dedflow_tpu.mesh.gen import box_mesh  # noqa: E402
from dedflow_tpu.solver.newton import NSSolver  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    mesh = box_mesh(n, n, n)
    cfg = reference_scenario_config()
    solver = NSSolver(mesh, cfg, dtype=jnp.float32)
    lctx = solver.lctx
    phys, scheme = cfg.physics, cfg.time
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, scheme)

    def full(wa, dwa):
        return lat.assemble_jacobian_t(
            lctx, solver.face_ctxs, solver.mask, wa, dwa, phys, scheme
        ).data

    c = jax.jit(full).lower(wa, dwa).compile()
    txt = c.as_text()
    print(f"HLO: {len(txt.splitlines())} lines", file=sys.stderr)
    sizes = []
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?([\w.\-]+) = (\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(3).split(",") if d]
        nbytes = 4
        for d in dims:
            nbytes *= d
        if nbytes >= 50e6:
            op = line.strip()
            op = op[:220]
            sizes.append((nbytes, op))
    sizes.sort(reverse=True)
    for nb, op in sizes[:60]:
        print(f"{nb/1e6:8.1f} MB  {op}")


if __name__ == "__main__":
    main()
