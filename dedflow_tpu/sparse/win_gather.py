"""Windowed nodal-state gather: (C, N) nodal rows -> (R, ne) element rows.

The irregular path's residual/Jacobian inputs are per-element state rows
state_rows[r, e] = state[comp(r), ien[e, vert(r)]] - a 4.7M-row gather
that XLA lowers at ~0.74 G rows/s (14 ms at 1.18M tets, the largest
single cost of residual_win). This kernel exploits the same locality the
stream kernels do (RCM nodes + elements sorted by min node,
mesh.reorder): for 128 consecutive elements, each vertex's node ids fall
in ~1.05 static 512-column windows of the node axis (measured), so one
(32, 128) `take_along_axis` per (vertex, comp-group, window) gathers all
8 comps of 128 elements at once - the whole state table stays
VMEM-resident (nodal state is small: 16 rows x N).

Output rows are written in ANY static (vert, comp) -> row order the
consumer wants (`rowmap`), so the element kernels' packed input layout
comes straight out of the gather with no XLA transpose/permute pass.

This replaces the gather HALF of the irregular pipeline; the scatter
half is sparse.win_stream. Reference counterpart: the CUDA
LoadElementValueKernel gathers (assemble.cu:135-154) - the GPU leans on
cache-backed random loads, the TPU on static windows + lane gathers.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# elements per grid step (matches fem.pallas_kernels._E)
_E = 512

# Tests flip this to run through the interpreter on CPU.
INTERPRET = False


@dataclass(frozen=True, eq=False)
class GatherPlan:
    """Host plan: per-(vertex, 128-element vreg) window schedule."""

    num_elem: int
    num_node: int
    vwin: np.ndarray  # (V, ne_pad//128) int32 (wlo << 10 | nwin)
    nwin_mean: float
    nwin_max: int


def build_gather_plan(ien_t: np.ndarray, num_node: int) -> GatherPlan:
    """ien_t (V, ne) int; windows are 512 node-columns wide."""
    ien_t = np.asarray(ien_t, dtype=np.int64)
    v, ne = ien_t.shape
    ne_pad = -(-ne // _E) * _E
    # pads replicate the last element (their output is sliced away)
    idx = np.concatenate(
        [ien_t, np.repeat(ien_t[:, -1:], ne_pad - ne, axis=1)], axis=1
    )
    w = (idx >> 9).reshape(v, -1, 128)
    wlo = w.min(axis=2)
    nwin = w.max(axis=2) - wlo + 1
    assert int(nwin.max()) < 1024 and int(wlo.max()) < (1 << 21)
    return GatherPlan(
        num_elem=ne,
        num_node=num_node,
        vwin=((wlo << 10) | nwin).astype(np.int32),
        nwin_mean=float(nwin.mean()),
        nwin_max=int(nwin.max()),
    )


def _gather_kernel(
    vwin_ref, ien_ref, x_ref, o_ref, *, rowmap, ngrp
):
    """One _E-element block per grid step.

    vwin_ref: (V, ne_pad//128) SMEM window schedule
    ien_ref:  (V, _E) node ids of this block
    x_ref:    (8 * ngrp, Wn) resident state table (comp groups on rows)
    o_ref:    (R, _E) output rows
    rowmap:   static ((v, g, c) -> out_row or -1) as a tuple-of-tuples
    """
    i = pl.program_id(0)
    nt = _E // 128
    V = ien_ref.shape[0]

    # rows no (vert, comp) maps to stay zero (the real row maps cover
    # every row; this is the contract for partial maps)
    covered = {r for row in rowmap for r in row if r >= 0}
    for r in range(o_ref.shape[0]):
        if r not in covered:
            o_ref[r, :] = jnp.zeros((o_ref.shape[1],), jnp.float32)

    for a in range(V):
        for t in range(nt):
            ids = ien_ref[a : a + 1, pl.ds(t * 128, 128)]  # (1, 128)
            m32 = jnp.broadcast_to(ids & 127, (32, 128))
            par8 = jnp.broadcast_to((ids >> 7) & 3, (8, 128))
            w8 = jnp.broadcast_to(ids >> 9, (8, 128))
            sched = vwin_ref[a, i * nt + t]
            wlo = sched >> 10
            nwin = sched & 1023
            for g in range(ngrp):

                def win_body(k, gacc, a=a, g=g, m32=m32, par8=par8,
                             w8=w8, wlo=wlo):
                    w = wlo + k
                    woff = pl.multiple_of(w * 512, 128)
                    tbl = jnp.concatenate(
                        [
                            x_ref[
                                g * 8 : (g + 1) * 8,
                                pl.ds(woff + 128 * kk, 128),
                            ]
                            for kk in range(4)
                        ],
                        axis=0,
                    )  # (32, 128)
                    got = jnp.take_along_axis(tbl, m32, axis=-1)
                    for kk in range(4):
                        gacc = jnp.where(
                            (w8 == w) & (par8 == kk),
                            got[8 * kk : 8 * kk + 8],
                            gacc,
                        )
                    return gacc

                gv = win_body(0, jnp.zeros((8, 128), jnp.float32))
                gv = jax.lax.fori_loop(1, nwin, win_body, gv)
                for c in range(8):
                    r = rowmap[a][g * 8 + c]
                    if r >= 0:
                        o_ref[r, pl.ds(t * 128, 128)] = gv[c, :]


def win_gather(
    plan: GatherPlan,
    ien_t: jnp.ndarray,  # (V, ne) int32
    x: jnp.ndarray,  # (C, N) nodal rows, C <= 16
    rowmap: tuple,  # (V, C) static out row per (vert, comp), -1 = drop
    out_rows: int,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """out[rowmap[a][c], e] = x[c, ien_t[a, e]] -> (out_rows, ne)."""
    if interpret is None:
        interpret = INTERPRET
    C, n = x.shape
    V, ne = ien_t.shape
    assert C <= 16 and n == plan.num_node and ne == plan.num_elem
    ngrp = -(-C // 8)
    ne_pad = -(-ne // _E) * _E
    if ne_pad != ne:
        # pads replicate the last element (matches the plan's schedule;
        # their output columns are sliced away)
        ien_t = jnp.concatenate(
            [ien_t, jnp.repeat(ien_t[:, -1:], ne_pad - ne, axis=1)],
            axis=1,
        )
    # resident table: comp groups on 8-row tiles; over-read pad for the
    # last window's 4-tile table (+512)
    wn = -(-n // 512) * 512 + 512
    x8 = jnp.zeros((8 * ngrp, wn), jnp.float32)
    x8 = x8.at[:C, :n].set(x.astype(jnp.float32))
    rowmap_t = tuple(
        tuple(int(rowmap[a][c]) for c in range(8 * ngrp))
        if len(rowmap[a]) >= 8 * ngrp
        else tuple(
            int(rowmap[a][c]) if c < len(rowmap[a]) else -1
            for c in range(8 * ngrp)
        )
        for a in range(V)
    )
    kern = functools.partial(
        _gather_kernel, rowmap=rowmap_t, ngrp=ngrp
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_rows, ne_pad), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ne_pad // _E,),
            in_specs=[
                pl.BlockSpec(
                    (V, _E), lambda i, vwin: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),  # resident state
            ],
            out_specs=pl.BlockSpec(
                (out_rows, _E), lambda i, vwin: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(jnp.asarray(plan.vwin), ien_t, x8)
    return out[:, :ne]


def win_gather_xla(
    ien_t: jnp.ndarray, x: jnp.ndarray, rowmap: tuple, out_rows: int
) -> jnp.ndarray:
    """Reference lowering (any backend, any dtype)."""
    V, ne = ien_t.shape
    out = jnp.zeros((out_rows, ne), x.dtype)
    for a in range(V):
        ga = x[:, ien_t[a]]  # (C, ne)
        for c in range(len(rowmap[a])):
            r = int(rowmap[a][c])
            if r >= 0:
                out = out.at[r].set(ga[c])
    return out
