"""Nonlinear f64 parity ON TPU vs the CPU f64 oracle (VERDICT r4 item 4).

The reference is f64 end to end (common.h:21-59). The TPU fast path
assembles in f32; `--precision ir` already gives 1e-10 LINEAR residuals.
This tool demonstrates the NONLINEAR regime: a full generalized-alpha
Newton solve in f64 on the TPU (XLA-emulated f64 through the lattice
rows pipeline, `lattice_backend="xla"`), compared against the identical
f64 solve on CPU. Converged per-field residual norms and the state match
to f64 roundoff - the summation ORDER is identical by construction (the
same XLA program, only the execution target differs), so this validates
the emulated-f64 arithmetic itself.

Also records the practical pairing: the f32 fast path + `precision=ir`
state against the f64 oracle state after the same steps (the production
recipe for reference-grade accuracy at f32-class speed).

Writes NONLINEAR_F64_TPU.json. Usage:
    python tools/nonlinear_f64_check.py [box_n=31] [steps=2]
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_case(platform: str, box_n: int, steps: int, mode: str) -> dict:
    """One solve in a subprocess (x64 flags must precede jax import)."""
    code = f"""
import json, sys
import jax
jax.config.update("jax_platforms", {'"cpu"' if platform == 'cpu' else '"axon,cpu"'})
jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
import dataclasses
import numpy as np
import jax.numpy as jnp
from dedflow_tpu.app.scenarios import (
    reference_initial_state, reference_scenario_config,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.solver.newton import NSSolver

mode = {mode!r}
mesh = box_mesh({box_n}, {box_n}, {box_n})
cfg = reference_scenario_config()
if mode == "f64":
    cfg = dataclasses.replace(cfg, lattice_backend="xla")
    dtype = jnp.float64
else:  # ir: f32 assembly + f64 iterative refinement
    cfg = dataclasses.replace(
        cfg, krylov=dataclasses.replace(cfg.krylov, precision="ir"),
    )
    dtype = jnp.float32
solver = NSSolver(mesh, cfg, dtype=dtype)
wg, dwgold, dwg = (
    jnp.asarray(x, dtype=dtype) for x in reference_initial_state(mesh)
)
norms = []
import time as _t
t0 = _t.time()
for _ in range({steps}):
    wg, dwgold, dwg, stats = solver.step(wg, dwgold, dwg)
    norms.append([float(v) for v in stats.rnorms[-1]])
out = dict(
    platform=jax.devices()[0].platform,
    state_norm=float(jnp.linalg.norm(jnp.asarray(wg, jnp.float64))),
    field_norms=norms,
    wall_s=_t.time() - t0,
    checksum=float(jnp.sum(jnp.asarray(wg, jnp.float64) ** 2)),
)
np.save("/tmp/nlf64_state_" + mode + "_" + out["platform"] + ".npy",
        np.asarray(wg, np.float64))
print("RESULT " + json.dumps(out))
"""
    env = dict(os.environ)
    env["JAX_TRACEBACK_FILTERING"] = "off"  # keep kernel frames on failure
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            d = json.loads(line[7:])
            d["subprocess_s"] = time.time() - t0
            return d
    raise RuntimeError(
        f"case {platform}/{mode} failed:\n{r.stdout[-2000:]}\n{r.stderr[-3000:]}"
    )


def main() -> None:
    import numpy as np

    box_n = int(sys.argv[1]) if len(sys.argv) > 1 else 31
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ne = 6 * box_n**3

    cpu64 = run_case("cpu", box_n, steps, "f64")
    tpu64 = run_case("tpu", box_n, steps, "f64")
    # the ir case is best-effort: it is the only case that lowers the
    # Pallas assembly kernels under jax_enable_x64, which trips a Mosaic
    # convert-lowering RecursionError on some jax versions - the core
    # claim (TPU f64 nonlinear parity vs the CPU oracle) stands without it
    ir_error = None
    try:
        tpu_ir = run_case("tpu", box_n, steps, "ir")
    except Exception as e:  # noqa: BLE001
        tpu_ir = None
        ir_error = f"{type(e).__name__}: {str(e)[-600:]}"

    s_cpu = np.load("/tmp/nlf64_state_f64_cpu.npy")
    s_tpu = np.load(f"/tmp/nlf64_state_f64_{tpu64['platform']}.npy")
    denom = max(float(np.abs(s_cpu).max()), 1e-30)
    rel_f64 = float(np.abs(s_tpu - s_cpu).max()) / denom
    if tpu_ir is not None:
        s_ir = np.load(f"/tmp/nlf64_state_ir_{tpu_ir['platform']}.npy")
        rel_ir = float(np.abs(s_ir - s_cpu).max()) / denom
    else:
        rel_ir = None

    doc = dict(
        metric="nonlinear_f64_parity",
        num_tet=ne,
        box=box_n,
        steps=steps,
        newton_field_norms_cpu_f64=cpu64["field_norms"],
        newton_field_norms_tpu_f64=tpu64["field_norms"],
        rel_state_diff_tpu_f64_vs_cpu_f64=rel_f64,
        rel_state_diff_tpu_ir_vs_cpu_f64=rel_ir,
        ir_case_error=ir_error,
        wall_s=dict(
            cpu_f64=cpu64["wall_s"], tpu_f64=tpu64["wall_s"],
            tpu_ir=tpu_ir["wall_s"] if tpu_ir else None,
        ),
        tpu_platform=tpu64["platform"],
        note=(
            "full generalized-alpha Newton solves; tpu_f64 runs the "
            "XLA-emulated f64 lattice rows pipeline (identical program "
            "to cpu_f64), tpu_ir is the production f32 fast path with "
            "f64 iterative refinement. rel diffs are max-abs over the "
            "final state / max |state|."
        ),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "NONLINEAR_F64_TPU.json"), "w") as fh:
        json.dump(doc, fh, indent=1)
        fh.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
