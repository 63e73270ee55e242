"""Pallas TPU kernel for the component-major DIA SpMV.

The XLA formulation of FSDIAMatrixT.matvec_t (15 shifted slices of x, 270
multiply-accumulate rows) runs at ~90-150 GB/s effective on v5e because
the single mega-fusion juggles ~300 input streams. This kernel streams
the matrix data once (the unavoidable traffic) and keeps a haloed window
of x in VMEM.

Full-sublane formulation (round 3): the first version accumulated 270
separate (1, E) row products - 1/8 sublane occupancy and ~17k vector-op
issues per lane block, which capped it at ~0.9 ms / 220 GB/s effective.
Here x is pre-expanded to the 18 packed-component rows (xe[c] =
x[colcomp(c)]), so each DIA plane contributes ONE dense (18, E)
fused-multiply-add against an 18-row slice of the plane data, and the 6
output rows come from a final row-group reduction. ~8x fewer vector-op
issues for identical arithmetic.

Replaces the reference's per-submatrix cuSPARSE SpMV grid
(MatrixFSAMVPBY, matrix.c:471-497) on lattice meshes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dedflow_tpu.sparse.fsbsr import COMP_SLOTS, PHIPHI, PP, PU, TT, UP, UU

_E = 8192  # lanes (rows of the matrix) per grid step

# Tests flip this to run the kernel through the Pallas interpreter on CPU
# (kept in sync with fem.lattice.INTERPRET_FUSED by the test fixtures).
INTERPRET = False

# packed component -> column (x) component it multiplies
_COL_OF_COMP = np.array([bj for _, _, bj in COMP_SLOTS])  # (18,)
# packed component -> row (y) component it accumulates into
_ROW_OF_COMP = np.array([bi for _, bi, _ in COMP_SLOTS])  # (18,)


def _mv_kernel(xe_hbm, d_ref, o_ref, win, sem, *, offsets, dpad, e):
    k = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xe_hbm.at[:, pl.ds(k * e, e + 2 * dpad)], win, sem
    )
    dma.start()
    dma.wait()
    acc = jnp.zeros((18, e), jnp.float32)
    for kk, o in enumerate(offsets):
        s = dpad + o
        acc = acc + d_ref[kk] * win[:18, s : s + e]
    rows = [None] * 6
    for c in range(18):
        r = int(_ROW_OF_COMP[c])
        term = acc[c : c + 1, :]
        rows[r] = term if rows[r] is None else rows[r] + term
    o_ref[0:6, :] = jnp.concatenate(rows, axis=0)
    o_ref[6:8, :] = jnp.zeros((2, e), jnp.float32)


def _dia_call(dmat, xe, offsets, *, e, dpad, interpret):
    """dmat (D, 18, W), xe (24, W + 2*dpad) haloed component-expanded x
    -> (8, W) product rows; W a multiple of e."""
    d, _, w = dmat.shape
    kern = functools.partial(_mv_kernel, offsets=offsets, dpad=dpad, e=e)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
        grid=(w // e,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (d, 18, e), lambda k: (0, 0, k), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((8, e), lambda k: (0, k)),
        scratch_shapes=[
            pltpu.VMEM((24, e + 2 * dpad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xe, dmat)


def _expand_x(x_t: jnp.ndarray) -> jnp.ndarray:
    """(6, N) -> (24, N): xe[c] = x[colcomp(c)], 24-row sublane padded."""
    xe = x_t.astype(jnp.float32)[jnp.asarray(_COL_OF_COMP)]
    return jnp.pad(xe, ((0, 6), (0, 0)))


def dia_matvec_pallas(
    data: jnp.ndarray,  # (D, 18, N) f32
    x_t: jnp.ndarray,  # (6, N) f32
    offsets: tuple,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(6, N) = A @ x for the component-major DIA matrix (TPU path)."""
    if interpret is None:
        interpret = INTERPRET
    d, _, n = data.shape
    dmax = max(max(abs(o) for o in offsets), 1)
    dpad = (dmax + 127) // 128 * 128
    npad = (n + _E - 1) // _E * _E
    xe = jnp.pad(_expand_x(x_t), ((0, 0), (dpad, dpad + npad - n)))
    dmat = data if npad == n else jnp.pad(data, ((0, 0), (0, 0), (0, npad - n)))
    out = _dia_call(dmat, xe, offsets, e=_E, dpad=dpad, interpret=interpret)
    return out[:6, :n]


def dia_matvec_pallas_shmap(
    data: jnp.ndarray,  # (D, 18, N) node-sharded
    x_t: jnp.ndarray,  # (6, N) node-sharded
    offsets: tuple,
    shard: tuple,  # (jax.sharding.Mesh, axis_name)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Per-shard Pallas DIA SpMV under shard_map: the x halo is the two
    dpad-wide boundary bands of the ring neighbors (2 ppermutes, no O(N)
    collective), the compute is the same fused halo-window kernel."""
    import numpy as np
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = INTERPRET
    dev_mesh, axis = shard
    nparts = int(np.prod(dev_mesh.devices.shape))
    d, _, n = data.shape
    L = n // nparts
    dmax = max(max(abs(o) for o in offsets), 1)
    dpad = (dmax + 127) // 128 * 128
    if dpad > L:
        raise ValueError(
            f"sharded DIA SpMV needs dpad ({dpad}) <= local rows ({L})"
        )
    e = next(s for s in range(min(_E, L), 127, -128) if L % s == 0)

    def local(d_l, xe_l):
        left = jax.lax.ppermute(
            xe_l[:, L - dpad :], axis,
            [(i, (i + 1) % nparts) for i in range(nparts)],
        )
        right = jax.lax.ppermute(
            xe_l[:, :dpad], axis,
            [(i, (i - 1) % nparts) for i in range(nparts)],
        )
        idx = jax.lax.axis_index(axis)
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        right = jnp.where(
            idx == nparts - 1, jnp.zeros_like(right), right
        )
        xw = jnp.concatenate([left, xe_l, right], axis=1)
        out = _dia_call(d_l, xw, offsets, e=e, dpad=dpad, interpret=interpret)
        return out[:6]

    return jax.shard_map(
        local,
        mesh=dev_mesh,
        in_specs=(P(None, None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(data.astype(jnp.float32), _expand_x(x_t))
