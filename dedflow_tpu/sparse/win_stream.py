"""Windowed stream permute/reduce kernels for irregular-mesh assembly.

The reference assembles on any tet mesh at full device speed because GPU
scatter hardware exists (ElemRHSLocal2GlobalKernel assemble.cu:188-208,
MatrixAddElemValueBlockedBatched matrix_impl.cu:257-368). The TPU has no
scatter unit; its one irregular primitive is a 128-lane in-register
gather (`jnp.take_along_axis`) plus MXU one-hot contractions for
cross-lane placement. This module turns the three irregular data motions
of FEM assembly into that shape:

  1. state gather    (N, C) nodal rows -> (C, S) element-slot rows
  2. residual scatter (C, S) element contributions -> (C, N) nodal sums
  3. matrix scatter  (16, 16*ne) element blocks -> WinELL entry values

All three are the same computation - a sparse permute-reduce
y[c, tgt(s)] += x[c, src(s)] - planned host-side as:

  * targets grouped into PACKS of SP consecutive targets,
  * contributions sorted by SOURCE column within each pack (so each
    128-entry vreg gathers from 1-2 aligned 128-lane windows; the
    window schedule is prefetched to SMEM),
  * per-pack source slab [lo, lo+W) DMA'd to VMEM (double-buffered;
    W static = the max pack span, 128-aligned) - or kept fully VMEM-
    resident when the source is small (resident=True, e.g. nodal state),
  * the reduction as quad-batched bf16-split one-hot MXU contractions,
    exact to f32 rounding (sparse.win_kernels proved the recipe).

Locality comes from the mesh ordering: RCM nodes + elements sorted by
min node (mesh.reorder) bound every pack's source span by the graph
bandwidth. Measured on a 1.18M-tet RCM Delaunay mesh: 4.5 windows per
vreg for the matrix scatter, 1.05 for the state gather.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SP = 2048  # targets per pack (matches winell.SP for the matrix scatter)

# Tests flip this to run through the interpreter on CPU.
INTERPRET = False


@dataclass(frozen=True, eq=False)
class StreamPlan:
    """Host-side plan for one permute-reduce (pure NumPy).

    Contribution slot s (sorted by source within its target pack):
      ecol[s] source column RELATIVE to its pack's slab base
      erow[s] target row local to the pack (0..SP-1)
    Pads point at the slab base with erow 0 and are killed by a zero
    source value only when the caller zero-pads the source; otherwise
    the kernel masks them via `elive` (bit 15 of the packed erow).
    """

    num_tgt: int  # real target rows
    num_pack: int
    S: int  # padded contribution count (512-multiple per pack)
    src_size: int  # source column count (for bounds/debug)
    ecol: np.ndarray  # (S,) int32 slab-relative source col
    erow: np.ndarray  # (S,) int32 pack-local target row (pads: 0)
    elive: np.ndarray  # (S,) bool real contribution
    slot_of_contrib: np.ndarray  # (n_contrib,) int64 -> slot
    pack_voff: np.ndarray  # (num_pack + 1,) int32 vreg offsets
    pack_lo: np.ndarray  # (num_pack,) int32 slab base col / 128 (the
    # kernel multiplies back so Mosaic can prove 128-divisibility)
    vwin: np.ndarray  # (S//128,) int32 (wlo << 10 | nwin), slab-relative
    W: int  # static slab width (cols, 512-multiple)
    vmax: int  # max vregs per pack (static stream DMA size)
    resident: bool  # source fully VMEM-resident (pack_lo all zero)

    @property
    def num_vreg(self) -> int:
        return self.S // 128


def build_stream_plan(
    tgt: np.ndarray,
    src: np.ndarray,
    num_tgt: int,
    src_size: int,
    sp: int = SP,
    resident: bool | None = None,
    jump_cut: int = 4096,
) -> StreamPlan:
    """Plan y[c, tgt[s]] += x[c, src[s]] over contributions s.

    tgt/src are parallel int arrays (one entry per contribution). The
    contribution order is arbitrary; `slot_of_contrib` records where each
    landed so producers can be laid out (or values pre-permuted)."""
    tgt = np.asarray(tgt, dtype=np.int64).reshape(-1)
    src = np.asarray(src, dtype=np.int64).reshape(-1)
    assert tgt.shape == src.shape
    if resident is None:
        # small sources (nodal state) stay fully VMEM-resident: one DMA
        # for the whole grid, absolute indices (pack_lo = 0)
        resident = src_size * 8 * 4 <= 24 * 1024 * 1024
    n_contrib = tgt.size
    npk = -(-num_tgt // sp)
    order = np.lexsort((src, tgt // sp))
    tgt_s, src_s = tgt[order], src[order]
    pack_of = (tgt_s // sp).astype(np.int64)
    counts = np.bincount(pack_of, minlength=npk)
    ends = np.cumsum(counts)
    starts = ends - counts
    ecol_p, erow_p, live_p, lo_p, voff = [], [], [], [], [0]
    slot_of = np.empty(n_contrib, dtype=np.int64)
    base = 0
    for p in range(npk):
        s0, s1 = starts[p], ends[p]
        # segment the pack at large source jumps (e.g. vertex-group
        # boundaries in an (a*ne + e) layout): a vreg quad must never
        # straddle a jump, or its window loop runs thousands of turns
        seg_starts = [s0]
        if s1 > s0 + 1:
            jumps = (
                np.nonzero(np.diff(src_s[s0:s1]) > jump_cut)[0] + 1 + s0
            )
            seg_starts += list(jumps)
        seg_bounds = seg_starts + [s1]
        pack_cols, pack_rows, pack_live = [], [], []
        pack_slots = 0
        for g0, g1 in zip(seg_bounds[:-1], seg_bounds[1:]):
            cnt = g1 - g0
            if cnt == 0:
                continue
            pad = (-cnt) % 512  # vreg quads for the MXU reduction
            # pad cols sit at the segment's LAST real column (col 0
            # would blow up the tail vreg's window span); pads are
            # killed via `elive`
            pad_col = src_s[g1 - 1]
            pack_cols.append(
                np.concatenate(
                    [src_s[g0:g1], np.full(pad, pad_col, dtype=np.int64)]
                )
            )
            pack_rows.append(
                np.concatenate(
                    [tgt_s[g0:g1] - p * sp, np.zeros(pad, dtype=np.int64)]
                )
            )
            pack_live.append(
                np.concatenate(
                    [np.ones(cnt, dtype=bool), np.zeros(pad, dtype=bool)]
                )
            )
            slot_of[order[g0:g1]] = base + pack_slots + np.arange(cnt)
            pack_slots += cnt + pad
        cols = (
            np.concatenate(pack_cols)
            if pack_cols
            else np.zeros(0, dtype=np.int64)
        )
        if cols.size and not resident:
            lo = (int(cols.min()) // 128) * 128
        else:
            lo = 0
        lo_p.append(lo // 128)
        ecol_p.append(cols - lo)
        erow_p.append(
            np.concatenate(pack_rows)
            if pack_rows
            else np.zeros(0, dtype=np.int64)
        )
        live_p.append(
            np.concatenate(pack_live)
            if pack_live
            else np.zeros(0, dtype=bool)
        )
        base += pack_slots
        voff.append(base // 128)
    ecol = np.concatenate(ecol_p)
    erow = np.concatenate(erow_p)
    live = np.concatenate(live_p)
    S = ecol.size
    # static slab width: max relative col + 1, rounded to 256
    Wmax = int(ecol.max()) + 1 if S else 512
    W = -(-Wmax // 512) * 512
    # per-vreg 512-lane window schedule (slab-relative): one
    # (32, 128) take_along_axis covers 4 source tiles x 8 comps and was
    # measured at ~48 cycles on v5e - HALF a (16, 128) op
    w = (ecol >> 9).reshape(-1, 128)
    wlo = w.min(axis=1).astype(np.int64)
    nwin = (w.max(axis=1) - wlo + 1).astype(np.int64)
    assert int(nwin.max()) < 1024 and int(wlo.max()) < (1 << 21)
    vwin = ((wlo << 10) | nwin).astype(np.int32)
    voff_np = np.asarray(voff, dtype=np.int64)
    vmax = int(np.diff(voff_np).max()) if npk else 0
    if resident:
        W = -(-src_size // 512) * 512
    return StreamPlan(
        resident=resident,
        num_tgt=num_tgt,
        num_pack=npk,
        S=S,
        src_size=src_size,
        ecol=ecol.astype(np.int32),
        erow=erow.astype(np.int32),
        elive=live,
        slot_of_contrib=slot_of,
        pack_voff=voff_np.astype(np.int32),
        pack_lo=np.asarray(lo_p, dtype=np.int32),
        vwin=vwin,
        W=W,
        vmax=vmax,
    )


def plan_stats(plan: StreamPlan) -> dict:
    nwin = plan.vwin & 1023
    return dict(
        S=plan.S,
        pad_frac=float(plan.S / max(plan.elive.sum(), 1) - 1.0),
        win_mean=float(nwin.mean()),
        win_p99=float(np.percentile(nwin, 99)),
        W=plan.W,
        slab_mb=plan.W * 8 * 4 / 1e6,
        stream_mb=plan.num_pack * plan.W * 8 * 4 / 1e6,
    )


def stream_index_rows(plan: StreamPlan) -> jnp.ndarray:
    """(2, S) int32 device rows: row 0 = ecol, row 1 = packed
    (erow | live << 15)."""
    packed = plan.erow.astype(np.int32) | (
        plan.elive.astype(np.int32) << 15
    )
    return jnp.asarray(np.stack([plan.ecol, packed]).astype(np.int32))


# ---------------------------------------------------------------------------
# kernel


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


HB = SP // 128


def _stream_kernel(
    voff_ref, vwin_ref, lo_ref, idx_hbm, x_hbm, o_ref,
    xbuf, ibuf, sem_x, sem_i,
    *, vmax, C, scale, resident,
):
    """One target pack per grid step. C source rows (<= 8); the slab
    x_hbm[:, lo : lo + W] is DMA'd per pack (double-buffered), or ONCE
    when `resident` (small sources, e.g. nodal state). Gathers stack
    four 128-col tiles on sublanes so one (32, 128) take_along_axis
    covers a 512-lane window of all C comps (measured ~48 cyc on v5e,
    half a (16, 128) op)."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    W = xbuf.shape[-1]

    def slab_copy(step, slot):
        # W includes the window slack for the unconditional second
        # window body (see win_stream_reduce's scratch shape)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(lo_ref[step] * 128, W)],
            xbuf.at[slot],
            sem_x.at[slot],
        )

    def idx_copy(step, slot):
        return pltpu.make_async_copy(
            idx_hbm.at[:, pl.ds(voff_ref[step] * 128, vmax * 128)],
            ibuf.at[slot],
            sem_i.at[slot],
        )

    @pl.when(i == 0)
    def _():
        if resident:
            cp = pltpu.make_async_copy(x_hbm, xbuf, sem_x)
            cp.start()
            idx_copy(0, 0).start()
            cp.wait()
        else:
            slab_copy(0, 0).start()
            idx_copy(0, 0).start()

    @pl.when(i + 1 < ni)
    def _():
        if not resident:
            slab_copy(i + 1, (i + 1) % 2).start()
        idx_copy(i + 1, (i + 1) % 2).start()

    if resident:
        xb = xbuf
    else:
        slab_copy(i, i % 2).wait()
        xb = xbuf.at[i % 2]
    idx_copy(i, i % 2).wait()
    ib = ibuf.at[i % 2]
    base = voff_ref[i]

    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def one_vreg(v):
        off = pl.multiple_of((v - base) * 128, 128)
        ecol = ib[0:1, pl.ds(off, 128)]
        epak = ib[1:2, pl.ds(off, 128)]
        erow = epak & 0x7FFF
        live = (epak >> 15) & 1
        m32 = jnp.broadcast_to(ecol & 127, (32, 128))
        par8 = jnp.broadcast_to((ecol >> 7) & 3, (8, 128))
        w8 = jnp.broadcast_to(ecol >> 9, (8, 128))
        sched = vwin_ref[v]
        wlo = sched >> 10
        nwin = sched & 1023

        def win_body(t, g):
            w = wlo + t
            woff = pl.multiple_of(w * 512, 128)
            tbl = jnp.concatenate(
                [xb[:, pl.ds(woff + 128 * k, 128)] for k in range(4)],
                axis=0,
            )  # (32, 128): four 128-col tiles on sublanes
            got = jnp.take_along_axis(tbl, m32, axis=-1)
            inw = w8 == w
            for k in range(4):
                g = jnp.where(
                    inw & (par8 == k), got[8 * k : 8 * k + 8], g
                )
            return g

        g = win_body(0, jnp.zeros((8, 128), jnp.float32))
        g = jax.lax.fori_loop(1, nwin, win_body, g)
        g = jnp.where(jnp.broadcast_to(live, (8, 128)) == 1, g, 0.0)
        p8h, p8l = _bf16_split(g)
        zb = jnp.zeros((8, 128), jnp.bfloat16)
        hi8 = jnp.broadcast_to(erow >> 7, (8, 128))
        masks = [hi8 == h for h in range(HB)]
        Ph = jnp.concatenate([jnp.where(m, p8h, zb) for m in masks], axis=0)
        Pl = jnp.concatenate([jnp.where(m, p8l, zb) for m in masks], axis=0)
        ohT = (
            jnp.broadcast_to(erow & 127, (128, 128)) == lo_iota
        ).astype(jnp.bfloat16)
        return Ph, Pl, ohT

    def quad_body(qd, acc):
        v0 = base + qd * 4
        phs, pls, ohs = [], [], []
        for d in range(4):
            ph, plo, oh = one_vreg(v0 + d)
            phs.append(ph)
            pls.append(plo)
            ohs.append(oh)
        P = jnp.concatenate(
            [jnp.concatenate(phs, axis=1), jnp.concatenate(pls, axis=1)],
            axis=0,
        )  # (256, 512)
        OH = jnp.concatenate(ohs, axis=1)  # (128, 512)
        out = jax.lax.dot_general(
            P, OH, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 128)
        return acc + out[: 8 * HB] + out[8 * HB :]

    nquads = (voff_ref[i + 1] - voff_ref[i]) // 4
    acc = jax.lax.fori_loop(
        0, nquads, quad_body, jnp.zeros((8 * HB, 128), jnp.float32)
    )
    for h in range(HB):
        for c in range(C):
            o_ref[c, h * 128 : (h + 1) * 128] = acc[h * 8 + c, :] * scale
        for c in range(C, 8):
            o_ref[c, h * 128 : (h + 1) * 128] = jnp.zeros(
                (128,), jnp.float32
            )


def win_stream_reduce(
    plan: StreamPlan,
    idx_rows: jnp.ndarray,  # (2, S) from stream_index_rows
    x: jnp.ndarray,  # (C, src_size) source rows, C <= 8
    scale: float = 1.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y[c, t] = scale * sum_{s: tgt(s)=t} x[c, src(s)] -> (C, num_tgt)."""
    if interpret is None:
        interpret = INTERPRET
    C, n_src = x.shape
    assert C <= 8
    npk, vmax, W = plan.num_pack, plan.vmax, plan.W
    resident = plan.resident
    x8 = jnp.zeros((8, n_src), jnp.float32).at[:C].set(
        x.astype(jnp.float32)
    )
    # slab over-read: the last window's 4-tile table may extend past the
    # source (+512); streamed slabs may start near the end (+W)
    x8 = jnp.pad(x8, ((0, 0), (0, (W - n_src if resident else W) + 512)))
    # index over-read: the fixed-size (vmax) index DMA runs past S on
    # the last pack (same zero tail the WinELL matvec installs)
    idx_rows = jnp.pad(idx_rows, ((0, 0), (0, vmax * 128)))

    kern = functools.partial(
        _stream_kernel, vmax=vmax, C=C, scale=float(scale),
        resident=resident,
    )
    xbuf_shape = (
        pltpu.VMEM((8, W + 512), jnp.float32)
        if resident
        else pltpu.VMEM((2, 8, W + 512), jnp.float32)
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(npk,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, SP), lambda i, voff, vwin, lo: (0, i)),
        scratch_shapes=[
            xbuf_shape,
            pltpu.VMEM((2, 2, vmax * 128), jnp.int32),
            pltpu.SemaphoreType.DMA(() if resident else (2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, npk * SP), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(plan_voff(plan), plan_vwin(plan), plan_lo(plan), idx_rows, x8)
    return out[:C, : plan.num_tgt]


def plan_voff(plan: StreamPlan) -> jnp.ndarray:
    return jnp.asarray(plan.pack_voff)


def plan_vwin(plan: StreamPlan) -> jnp.ndarray:
    return jnp.asarray(plan.vwin)


def plan_lo(plan: StreamPlan) -> jnp.ndarray:
    return jnp.asarray(plan.pack_lo)


def stream_reduce_xla(
    plan: StreamPlan, x: jnp.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """Reference lowering (any backend): flat gather + segment-sum."""
    C = x.shape[0]
    src = plan.ecol.astype(np.int64) + np.repeat(
        plan.pack_lo.astype(np.int64) * 128,
        np.diff(plan.pack_voff.astype(np.int64)) * 128,
    )
    tgt = plan.erow.astype(np.int64) + (
        np.repeat(
            np.arange(plan.num_pack, dtype=np.int64),
            np.diff(plan.pack_voff.astype(np.int64)) * 128,
        )
        * SP
    )
    live = jnp.asarray(plan.elive)
    vals = x[:, jnp.asarray(np.clip(src, 0, x.shape[1] - 1))]
    vals = jnp.where(live[None, :], vals, 0.0)
    y = jax.ops.segment_sum(
        vals.T, jnp.asarray(tgt.astype(np.int32)),
        num_segments=plan.num_pack * SP,
    )
    return scale * y[: plan.num_tgt].T.astype(x.dtype)
