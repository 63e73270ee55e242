"""Probe: which in-VMEM dynamic-gather idioms does Mosaic support, and at
what throughput? Decides the design of the irregular-mesh (windowed)
assembly kernel: the reference assembles arbitrary tet meshes at full
speed (AssembleSystemTet, assemble.cu:1467-1762); our TPU equivalent
needs element gathers that do not pay the XLA HBM-gather penalty.

Findings (TPU v5e):
- Mosaic lowers ONLY the take_along_axis pattern (input == indices ==
  output shape, 2D) to tpu.dynamic_gather (jax pallas/mosaic lowering.py,
  lax.gather_p rule); plain jnp.take fails.
- XLA's own HBM row gather runs at ~300 GB/s effective on 64-byte rows.

Usage: python tools/gather_probe.py [interpret] [W]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = "interpret" in sys.argv[1:]
_pos = [a for a in sys.argv[1:] if a.isdigit()]

E = 1024  # elements per block
W = int(_pos[0]) if _pos else 4096  # node window
C = 16  # state rows gathered per node


def _onehot_kernel(idx_ref, win_ref, out_ref, *, precision):
    idx = idx_ref[:, :]  # (4, E)
    win = win_ref[:, :]  # (W, C)
    cols = jax.lax.broadcasted_iota(jnp.int32, (E, W), 1)
    for a in range(4):
        oh = (idx[a][:, None] == cols).astype(jnp.float32)  # (E, W)
        out_ref[a * C : (a + 1) * C, :] = jax.lax.dot_general(
            oh,
            win,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).T


def _tala_kernel(idx_ref, win_ref, out_ref):
    """take_along_axis with matching (C, W) shapes - the one 2D gather
    Mosaic lowers to tpu.dynamic_gather. Indices are padded to W lanes;
    only the first E output lanes are written out."""
    win = win_ref[:, :]  # (C, W)
    for a in range(4):
        idx = idx_ref[pl.ds(a * C, C), :]  # (C, W), cols >= E garbage
        g = jnp.take_along_axis(win, idx, axis=1)  # (C, W)
        out_ref[pl.ds(a * C, C), :] = g[:, :E]


def run_onehot(nb, precision, idx, win):
    return pl.pallas_call(
        functools.partial(_onehot_kernel, precision=precision),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((4, E), lambda b: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, C), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * C, E), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * C, nb * E), jnp.float32),
        interpret=INTERPRET,
    )(idx, win)


def run_tala(nb, idx_tala, win_t):
    return pl.pallas_call(
        _tala_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(
                (4 * C, W), lambda b: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((C, W), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (4 * C, E), lambda b: (0, b), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((4 * C, nb * E), jnp.float32),
        interpret=INTERPRET,
    )(idx_tala, win_t)


def timeit(fn, *args):
    """Rep-count differencing: the tunnel's ~tens-of-ms dispatch+sync
    latency is constant, so (T(r2)-T(r1))/(r2-r1) isolates compute."""
    out = jax.block_until_ready(fn(*args))

    def run(reps):
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = fn(*args)
        jax.block_until_ready(o)
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0].reshape(-1)[:8]))
        return time.perf_counter() - t0

    r1, r2 = (1, 2) if INTERPRET else (2, 12)
    ts = sorted(max((run(r2) - run(r1)) / (r2 - r1), 1e-9) for _ in range(3))
    return out, ts[1]


def report(name, dt, extra=""):
    rows = 4 * 64 * E if not INTERPRET else 4 * 4 * E
    print(
        f"{name:8s} ok  {dt*1e3:8.3f} ms  {rows/dt/1e9:8.2f} G rows/s  "
        f"{rows*C*4/dt/1e9:8.1f} GB/s effective {extra}"
    )


def main():
    nb = 4 if INTERPRET else 64
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (4, nb * E), 0, W, dtype=jnp.int32)
    win = jax.random.normal(jax.random.PRNGKey(1), (W, C), jnp.float32)

    # reference result computed with plain numpy outside any kernel:
    # out[a*C + c, b*E + e] = win[idx[a, b*E + e], c]
    import numpy as np

    win_np, idx_np = np.asarray(win), np.asarray(idx)
    ref = np.zeros((4 * C, nb * E), np.float32)
    for a in range(4):
        ref[a * C : (a + 1) * C, :] = win_np[idx_np[a]].T
    ref = jnp.asarray(ref)

    # tala indices: (nb*4C, W) - block b rows [b*4C, (b+1)*4C), row a*C+c
    # carries block b's idx[a] in its first E lanes
    blk = idx.reshape(4, nb, E).transpose(1, 0, 2)  # (nb, 4, E)
    idx_tala = jnp.zeros((nb, 4, C, W), jnp.int32)
    idx_tala = idx_tala.at[:, :, :, :E].set(
        jnp.broadcast_to(blk[:, :, None, :], (nb, 4, C, E))
    )
    idx_tala = idx_tala.reshape(nb * 4 * C, W)

    for name, fn, args in [
        ("tala", functools.partial(run_tala, nb), (idx_tala, win.T)),
        ("oh_def", functools.partial(run_onehot, nb, None), (idx, win)),
        (
            "oh_hi",
            functools.partial(run_onehot, nb, jax.lax.Precision.HIGHEST),
            (idx, win),
        ),
    ]:
        try:
            f = jax.jit(fn)
            out, dt = timeit(f, *args)
            err = float(jnp.abs(out - ref).max())
            report(name, dt, f" max|err| {err:.1e}")
        except Exception as e:  # noqa: BLE001
            print(f"{name:8s} FAIL {type(e).__name__}: {str(e)[:240]}")

    # XLA baseline: gather (nb*E, 4) wide rows from an (N, C) HBM array
    N = 200_000
    x = jax.random.normal(jax.random.PRNGKey(2), (N, C), jnp.float32)
    gidx = jax.random.randint(key, (nb * E, 4), 0, N, dtype=jnp.int32)

    @jax.jit
    def xla_gather(x, gidx):
        return x[gidx]  # (M, 4, C)

    out, dt = timeit(xla_gather, x, gidx)
    report("xla", dt)


if __name__ == "__main__":
    main()
