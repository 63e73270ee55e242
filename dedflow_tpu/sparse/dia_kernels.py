"""Pallas TPU kernel for the component-major DIA SpMV.

The XLA formulation of FSDIAMatrixT.matvec_t (15 shifted slices of x, 270
multiply-accumulate rows) runs at ~90-150 GB/s effective on v5e because
the single mega-fusion juggles ~300 input streams. This kernel streams
the matrix data once (the unavoidable traffic) and keeps a haloed window
of x in VMEM.

Full-sublane formulation (round 3): the first version accumulated 270
separate (1, E) row products - 1/8 sublane occupancy and ~17k vector-op
issues per lane block, which capped it at ~0.9 ms / 220 GB/s effective.
Here x is pre-expanded to packed-component rows (xe[c] = x[colcomp(c)]),
so each DIA plane contributes ONE dense (16, E) fused-multiply-add
against its (16, E) velocity/pressure data block, and the 4 vel/p output
rows come from a final row-group reduction. ~8x fewer vector-op issues
for identical arithmetic. The two scalar components (phi-phi / T-T) live
in the separate (2*D, N) `scal` array and are applied by a small XLA
shifted-slice pass in the wrapper: keeping the kernel's matrix operand
at 16 sublane rows makes its DMA tile-aligned AND gives the array an
XLA default layout ({2,1,0}) that matches the custom call's constraint
- with 18 rows XLA defaults to {2,0,1} and inserts a ~190 MB relayout
copy per matvec (measured 0.68 ms against a 0.35 ms kernel at 1M tets).

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


def _mv_kernel(
    xe_hbm, d_hbm, o_hbm, win, dbuf, obuf, sem_x, sem_d, sem_o,
    *, offsets, dpad, e, w, nblk,
):
    """All operands live in ANY (HBM) with manual DMA: a BlockSpec-mapped
    matrix operand makes Mosaic demand a LINEAR operand layout, and XLA
    inserts a ~190 MB relayout copy of the tiled assembly output before
    every call (measured 0.68 ms vs 0.35 ms kernel at 1M tets). The
    matrix stream is double-buffered; the final (partial) block is
    handled by CLAMPING the column start to w - e, recomputing a few
    overlap columns instead of padding the matrix."""
    k = pl.program_id(0)
    nd = len(offsets)

    def dstart(j, slot):
        c0 = pl.multiple_of(jnp.minimum(j * e, w - e), 128)
        return pltpu.make_async_copy(
            d_hbm.at[:, :, pl.ds(c0, e)], dbuf.at[slot], sem_d.at[slot]
        )

    c0 = pl.multiple_of(jnp.minimum(k * e, w - e), 128)
    cp_x = pltpu.make_async_copy(
        xe_hbm.at[:, pl.ds(c0, e + 2 * dpad)], win, sem_x
    )
    cp_x.start()

    @pl.when(k == 0)
    def _():
        dstart(0, 0).start()

    @pl.when(k + 1 < nblk)
    def _():
        dstart(k + 1, (k + 1) % 2).start()

    slot = jax.lax.rem(k, jnp.int32(2))
    dstart(k, slot).wait()
    cp_x.wait()

    acc = jnp.zeros((16, e), jnp.float32)
    for kk, o in enumerate(offsets):
        s = dpad + o
        acc = acc + dbuf[slot, kk] * win[:16, s : s + e]
    rows = [None] * 4
    for c in range(16):
        r = int(_ROW_OF_COMP[c])
        term = acc[c : c + 1, :]
        rows[r] = term if rows[r] is None else rows[r] + term
    oslot = jax.lax.rem(k, jnp.int32(2))

    @pl.when(k >= 2)
    def _():
        # the copy-out started 2 steps ago has finished by now; collect
        # its semaphore before reusing the buffer
        pltpu.make_async_copy(
            obuf.at[oslot], o_hbm.at[:, pl.ds(c0, e)], sem_o.at[oslot]
        ).wait()

    obuf[oslot, 0:4, :] = jnp.concatenate(rows, axis=0)
    obuf[oslot, 4:8, :] = jnp.zeros((4, e), jnp.float32)
    pltpu.make_async_copy(
        obuf.at[oslot], o_hbm.at[:, pl.ds(c0, e)], sem_o.at[oslot]
    ).start()

    @pl.when(k == nblk - 1)
    def _():
        pltpu.make_async_copy(
            obuf.at[oslot], o_hbm.at[:, pl.ds(c0, e)], sem_o.at[oslot]
        ).wait()

    @pl.when((k == nblk - 1) & (nblk > 1))
    def _():
        prev = jax.lax.rem(k + 1, jnp.int32(2))
        c0p = pl.multiple_of(jnp.minimum((k - 1) * e, w - e), 128)
        pltpu.make_async_copy(
            obuf.at[prev], o_hbm.at[:, pl.ds(c0p, e)], sem_o.at[prev]
        ).wait()


def _dia_call(dmat, xe, offsets, *, e, dpad, interpret):
    """dmat (D, 16, W) vel/p component rows, xe (24, W + 2*dpad) haloed
    component-expanded x -> (8, W) product rows (0..3 = u, v, w, p; the
    rest zero). W need not be a multiple of e (clamped overlapping final
    block); requires W >= e."""
    d, _, w = dmat.shape
    nblk = (w + e - 1) // e
    kern = functools.partial(
        _mv_kernel, offsets=offsets, dpad=dpad, e=e, w=w, nblk=nblk
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, w), jnp.float32),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((24, e + 2 * dpad), jnp.float32),
            pltpu.VMEM((2, d, 16, e), jnp.float32),
            pltpu.VMEM((2, 8, e), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
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
    data: jnp.ndarray,  # (D, 16, W) f32 vel/p rows, W 128-aligned
    scal: jnp.ndarray,  # (2*D, W) f32 phi-phi / T-T rows
    x_t: jnp.ndarray,  # (6, N) f32
    offsets: tuple,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """(6, N) = A @ x for the component-major DIA matrix (TPU path)."""
    if interpret is None:
        interpret = INTERPRET
    d, _, w = data.shape
    n = x_t.shape[1]
    dmax = max(max(abs(o) for o in offsets), 1)
    dpad = (dmax + 127) // 128 * 128
    if w % 128 or w < 128:
        # General-path widths: the clamped final-block DMA needs a
        # lane-aligned matrix; pad (a full copy - the lattice path avoids
        # this by emitting 128-aligned assembly output, num_node field).
        wp = max(-(-w // 128) * 128, 128)
        data = jnp.pad(data, ((0, 0), (0, 0), (0, wp - w)))
        w = wp
    e = min(_E, w)
    xe = jnp.pad(_expand_x(x_t), ((0, 0), (dpad, dpad + w - n)))
    out = _dia_call(data, xe, offsets, e=e, dpad=dpad, interpret=interpret)
    # scalar comps (phi-phi / T-T): 2*D matrix rows via an XLA
    # shifted-slice pass - see the module docstring (xe rows 16/17 are
    # x[4]/x[5] per _COL_OF_COMP)
    y45 = None
    for kk, o in enumerate(offsets):
        t = scal[2 * kk : 2 * kk + 2, :n] * jax.lax.slice_in_dim(
            xe[16:18], dpad + o, dpad + o + n, axis=1
        )
        y45 = t if y45 is None else y45 + t
    return jnp.concatenate([out[:4, :n], y45], axis=0)


def dia_matvec_pallas_shmap(
    data: jnp.ndarray,  # (D, 16, N) node-sharded vel/p rows
    scal: jnp.ndarray,  # (2*D, N) node-sharded phi-phi / T-T rows
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

    def local(d_l, s_l, xe_l):
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
        ll = xe_l.shape[1]
        y45 = None
        for kk, o in enumerate(offsets):
            t = s_l[2 * kk : 2 * kk + 2] * jax.lax.slice_in_dim(
                xw[16:18], dpad + o, dpad + o + ll, axis=1
            )
            y45 = t if y45 is None else y45 + t
        return jnp.concatenate([out[:4], y45], axis=0)

    return jax.shard_map(
        local,
        mesh=dev_mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(data.astype(jnp.float32), scal.astype(jnp.float32), _expand_x(x_t))
