"""Pallas TPU kernel for the component-major DIA SpMV.

The XLA formulation of FSDIAMatrixT.matvec_t (15 shifted slices of x, 270
multiply-accumulate rows) runs at ~90-150 GB/s effective on v5e because
the single mega-fusion juggles ~300 input streams. This kernel streams
the matrix data once (the unavoidable traffic) and keeps a haloed window
of x in VMEM.

Full-sublane formulation (round 3): the first version accumulated 270
separate (1, E) row products - 1/8 sublane occupancy and ~17k vector-op
issues per lane block, which capped it at ~0.9 ms / 220 GB/s effective.
Here the haloed x window is expanded IN VMEM to packed-component rows
(xw[c] = x[colcomp(c)], 16 static row copies per block), so each DIA
plane contributes ONE dense (16, E) fused-multiply-add against its
(16, E) velocity/pressure data block, and the 4 vel/p output rows come
from a final row-group reduction. ~8x fewer vector-op issues for
identical arithmetic. The two scalar components (phi-phi / T-T) stream
through the same kernel as a separate (2*D, E) block per step ((2, E)
fmas against x rows 4/5), so one pass over HBM produces the finished
(6, N) product - the earlier XLA side-passes (24-row x pre-expansion,
shifted-slice scal pass, final concatenate) cost a measured ~0.07 ms of
the 0.46 ms matvec at 1M tets and are deleted. Keeping the matrix
operand at 16 sublane rows makes its DMA tile-aligned AND gives the
array an XLA default layout ({2,1,0}) that matches the custom call's
constraint - with 18 rows XLA defaults to {2,0,1} and inserts a ~190 MB
relayout copy per matvec (measured 0.68 ms against a 0.35 ms kernel).

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

from dedflow_tpu.sparse.fsbsr import COMP_SLOTS

_E = 8192  # lanes (rows of the matrix) per grid step

# Tests flip this to run the kernel through the Pallas interpreter on CPU
# (kept in sync with fem.lattice.INTERPRET_FUSED by the test fixtures).
INTERPRET = False

# packed component -> column (x) component it multiplies
_COL_OF_COMP = np.array([bj for _, _, bj in COMP_SLOTS])  # (18,)
# packed component -> row (y) component it accumulates into
_ROW_OF_COMP = np.array([bi for _, bi, _ in COMP_SLOTS])  # (18,)


def _mv_kernel(
    xp_hbm, d_hbm, s_hbm, o_hbm, win, xw, dbuf, sbuf, obuf,
    sem_x, sem_d, sem_s, sem_o,
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

    def dstart(j, slot):
        c0 = pl.multiple_of(jnp.minimum(j * e, w - e), 128)
        return (
            pltpu.make_async_copy(
                d_hbm.at[:, :, pl.ds(c0, e)], dbuf.at[slot], sem_d.at[slot]
            ),
            pltpu.make_async_copy(
                s_hbm.at[:, pl.ds(c0, e)], sbuf.at[slot], sem_s.at[slot]
            ),
        )

    c0 = pl.multiple_of(jnp.minimum(k * e, w - e), 128)
    cp_x = pltpu.make_async_copy(
        xp_hbm.at[:, pl.ds(c0, e + 2 * dpad)], win, sem_x
    )
    cp_x.start()

    @pl.when(k == 0)
    def _():
        for cp in dstart(0, 0):
            cp.start()

    @pl.when(k + 1 < nblk)
    def _():
        for cp in dstart(k + 1, (k + 1) % 2):
            cp.start()

    slot = jax.lax.rem(k, jnp.int32(2))
    for cp in dstart(k, slot):
        cp.wait()
    cp_x.wait()

    # expand the x window to packed-component rows once per block
    # (16 static row copies), so the plane loop is dense (16, e) fmas
    for c in range(16):
        col = int(_COL_OF_COMP[c])
        xw[c : c + 1, :] = win[col : col + 1, :]

    acc = jnp.zeros((16, e), jnp.float32)
    acc45 = jnp.zeros((2, e), jnp.float32)
    for kk, o in enumerate(offsets):
        s = dpad + o
        acc = acc + dbuf[slot, kk] * xw[:, s : s + e]
        acc45 = acc45 + sbuf[slot, 2 * kk : 2 * kk + 2] * win[4:6, s : s + e]
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
    obuf[oslot, 4:6, :] = acc45
    obuf[oslot, 6:8, :] = jnp.zeros((2, e), jnp.float32)
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


def _dia_call(dmat, scal, xp, offsets, *, e, dpad, interpret):
    """dmat (D, 16, W) vel/p component rows, scal (2*D, W) phi-phi/T-T
    rows, xp (8, W + 2*dpad) haloed solution rows (rows 6/7 zero) ->
    (8, W) product rows (0..3 = u, v, w, p; 4/5 = phi, T; 6/7 zero).
    W need not be a multiple of e (clamped overlapping final block);
    requires W >= e."""
    d, _, w = dmat.shape
    nblk = (w + e - 1) // e
    # Mosaic DMA slices along the sublane dim must be 8-aligned: pad the
    # scalar rows (2*D is 30 for the 15-offset stencil) up to a multiple
    # of 8. The kernel's per-plane (2, e) reads are in-register vector
    # ops and carry no such constraint.
    sr = -(-scal.shape[0] // 8) * 8
    if sr != scal.shape[0]:
        scal = jnp.pad(scal, ((0, sr - scal.shape[0]), (0, 0)))
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
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((8, e + 2 * dpad), jnp.float32),
            pltpu.VMEM((16, e + 2 * dpad), jnp.float32),
            pltpu.VMEM((2, d, 16, e), jnp.float32),
            pltpu.VMEM((2, sr, e), jnp.float32),
            pltpu.VMEM((2, 8, e), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, dmat, scal)


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
        scal = jnp.pad(scal, ((0, 0), (0, wp - w)))
        w = wp
    if scal.shape[1] != w:
        scal = jnp.pad(scal, ((0, 0), (0, w - scal.shape[1])))
    e = min(_E, w)
    xp = jnp.pad(
        x_t.astype(jnp.float32), ((0, 2), (dpad, dpad + w - n))
    )
    out = _dia_call(
        data, scal.astype(jnp.float32), xp, offsets,
        e=e, dpad=dpad, interpret=interpret,
    )
    return out[:6, :n]


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

    def local(d_l, s_l, x_l):
        left = jax.lax.ppermute(
            x_l[:, L - dpad :], axis,
            [(i, (i + 1) % nparts) for i in range(nparts)],
        )
        right = jax.lax.ppermute(
            x_l[:, :dpad], axis,
            [(i, (i - 1) % nparts) for i in range(nparts)],
        )
        idx = jax.lax.axis_index(axis)
        left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        right = jnp.where(
            idx == nparts - 1, jnp.zeros_like(right), right
        )
        xw = jnp.concatenate([left, x_l, right], axis=1)
        out = _dia_call(
            d_l, s_l, xw, offsets, e=e, dpad=dpad, interpret=interpret
        )
        return out[:6]

    return jax.shard_map(
        local,
        mesh=dev_mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_vma=False,
    )(
        data.astype(jnp.float32),
        scal.astype(jnp.float32),
        jnp.pad(x_t.astype(jnp.float32), ((0, 2), (0, 0))),
    )
