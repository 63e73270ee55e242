"""Chunk-major ring-accumulated permute-reduce for the WinELL Jacobian
scatter (sparse.win_stream's problem 3: (C, 16*ne) element-block updates
-> WinELL entry values).

Why the slab-streaming kernel (win_stream) cannot carry this scatter:
its target packs are 2048 consecutive WinELL entries, which are
COLUMN-sorted inside 2048-row superpacks (the matvec's x-gather wants
column locality, sparse.winell) - so one pack's contributing elements
spread over the whole superpack's row range. Measured on the 1.18M-tet
RCM Delaunay bench mesh: p50 pack source span 872k columns of 18.9M, a
2.1M-column static slab (VMEM overflow), 96 GB of slab traffic if it
fit, and no useful core window (a 256k cap still strands 26% of
contributions).

The fix inverts the loop structure: the SOURCE table streams once,
sequentially, in fixed CHUNK-column slabs (perfect DMA), while the
OUTPUT lives in VMEM - a ring of per-pack accumulators. Source
locality guarantees the ring stays small: at any stream position only
the packs whose element range covers it are live (~70 at bench scale).
Per (pack, chunk) CELL the contributions are pre-sorted by source
column, gathered from the resident chunk with the same (32, 128)
take_along_axis windows as win_stream, and reduced into the pack's
accumulator with the same quad-batched bf16-split one-hot MXU
contraction (exact to f32 rounding). A pack flushes to HBM at its last
cell; every pack flushes exactly once.

Traffic: 2 passes x (read 600 MB chunk stream + write 107 MB entries)
at 1.18M tets vs the 96 GB slab plan - and no gather leaves VMEM.

SMEM budget: the scalar-prefetch operands must fit the core's 1 MB
SMEM. A per-VREG window schedule (S/128 words) overflows it at bench
scale (704 KB + cell tables > 1 MB, measured on v5e at 1.18M tets), so
the schedule is per-QUAD (S/512 words) - which also lets the four
vregs of a quad share each window's gather table - and the per-cell
control words are packed into two int32 arrays (cell_a/cell_b). The
builder checks the estimate and raises so callers can fall back.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SP = 1024  # targets per pack (r5: 2048 -> 1024 halves the one-hot
# P-stack per quad; with the 16-row single-pass kernel the matmul work
# per quad matches the old 8-row/SP=2048 shape at HALF the quad count)

# flag bits (per cell)
F_FIRST_OF_PACK = 1
F_LAST_OF_PACK = 2
F_FIRST_OF_CHUNK = 4
F_LAST_OF_CHUNK = 8

# Tests flip this to run through the interpreter on CPU.
INTERPRET = False


@dataclass(frozen=True, eq=False)
class RingPlan:
    """Host-side plan (pure NumPy). Cells are (pack, chunk) groups of
    contributions, CHUNK-major ordered; slots within a cell are sorted
    by source column and padded to 512 (vreg quads)."""

    num_tgt: int
    num_pack: int
    num_cell: int
    S: int  # padded slot count (512-multiple per cell)
    src_size: int
    sp: int  # targets per pack
    chunk: int  # source columns per streamed slab
    num_ring: int  # ring slots (max live packs + margin)
    ecol: np.ndarray  # (S,) int32 chunk-relative source col
    erow: np.ndarray  # (S,) int32 pack-local target row
    elive: np.ndarray  # (S,) bool
    slot_of_contrib: np.ndarray  # (n_contrib,) int64
    cell_voff: np.ndarray  # (num_cell + 1,) int32 vreg offsets
    # packed per-cell control words (SMEM budget - see module docstring):
    # cell_a = chunk | next_chunk << 12 | (chunk_ord & 1) << 24 | flags << 25
    # cell_b = pack | ring << 22
    cell_a: np.ndarray  # (num_cell,) int32
    cell_b: np.ndarray  # (num_cell,) int32
    vwin: np.ndarray  # (S//512,) int32 trip count of the hop list, per QUAD
    hops: np.ndarray  # (S//512, 128) int32 distinct chunk-relative windows
    vmax: int  # max vregs per cell (static idx DMA size)

    @property
    def num_vreg(self) -> int:
        return self.S // 128

    # unpacked views (host-side introspection / the XLA reference path)
    @property
    def cell_chunk(self) -> np.ndarray:
        return self.cell_a & 0xFFF

    @property
    def cell_next_chunk(self) -> np.ndarray:
        return (self.cell_a >> 12) & 0xFFF

    @property
    def cell_flags(self) -> np.ndarray:
        return (self.cell_a >> 25) & 0xF

    @property
    def cell_pack(self) -> np.ndarray:
        return self.cell_b & 0x3FFFFF

    @property
    def cell_ring(self) -> np.ndarray:
        return self.cell_b >> 22


def build_ring_plan(
    tgt: np.ndarray,
    src: np.ndarray,
    num_tgt: int,
    src_size: int,
    chunk: int = 1 << 17,
    sp: int = SP,
    ring_margin: int = 8,
) -> RingPlan:
    """Plan y[c, tgt[s]] += x[c, src[s]]. Requires every pack's
    contribution stream to fit the ring while live; num_ring is computed
    from the actual liveness intervals (greedy interval assignment)."""
    tgt = np.asarray(tgt, dtype=np.int64).reshape(-1)
    src = np.asarray(src, dtype=np.int64).reshape(-1)
    assert tgt.shape == src.shape
    n_contrib = tgt.size
    npk = -(-num_tgt // sp)
    order = np.lexsort((src, tgt // sp))
    tgt_s, src_s = tgt[order], src[order]
    pack_s = tgt_s // sp
    chunk_s = src_s // chunk

    # cell boundaries: change of (pack, chunk) in pack-major order
    key_change = np.nonzero(
        (np.diff(pack_s) != 0) | (np.diff(chunk_s) != 0)
    )[0]
    cell_start = np.concatenate([[0], key_change + 1])
    cell_end = np.concatenate([key_change + 1, [n_contrib]])
    cpack = pack_s[cell_start].astype(np.int64)
    cchunk = chunk_s[cell_start].astype(np.int64)
    ncell = cell_start.size

    # chunk-major execution order (stable: cells of one pack stay
    # src-ordered, which the flush logic relies on)
    cell_order = np.argsort(cchunk, kind="stable")
    cpack = cpack[cell_order]
    cchunk = cchunk[cell_order]
    cs = cell_start[cell_order]
    ce = cell_end[cell_order]

    # liveness: pack live from its first to its last cell (exec order)
    first_cell = np.full(npk, -1, dtype=np.int64)
    last_cell = np.full(npk, -1, dtype=np.int64)
    for i in range(ncell):
        p = cpack[i]
        if first_cell[p] < 0:
            first_cell[p] = i
        last_cell[p] = i
    live_packs = np.nonzero(first_cell >= 0)[0]
    # greedy ring assignment over liveness intervals
    events = []
    for p in live_packs:
        events.append((first_cell[p], 0, p))
        events.append((last_cell[p], 1, p))
    events.sort()
    free: list[int] = []
    next_slot = 0
    ring_of = np.full(npk, -1, dtype=np.int64)
    for _, kind, p in events:
        if kind == 0:
            if free:
                ring_of[p] = free.pop()
            else:
                ring_of[p] = next_slot
                next_slot += 1
        else:
            free.append(ring_of[p])
    num_ring = next_slot + 0
    # margin so an off-by-one in liveness can never alias live packs
    num_ring = next_slot + ring_margin

    # per-cell slot layout: pad each cell to 512 (vreg quads)
    ecol_p, erow_p, live_p = [], [], []
    slot_of = np.empty(n_contrib, dtype=np.int64)
    voff = [0]
    base = 0
    flags = np.zeros(ncell, dtype=np.int64)
    for i in range(ncell):
        g0, g1 = cs[i], ce[i]
        cnt = g1 - g0
        pad = (-cnt) % 512
        pad_col = src_s[g1 - 1]
        lo = cchunk[i] * chunk
        ecol_p.append(
            np.concatenate(
                [src_s[g0:g1] - lo, np.full(pad, pad_col - lo, np.int64)]
            )
        )
        erow_p.append(
            np.concatenate(
                [tgt_s[g0:g1] - cpack[i] * sp, np.zeros(pad, np.int64)]
            )
        )
        live_p.append(
            np.concatenate([np.ones(cnt, bool), np.zeros(pad, bool)])
        )
        slot_of[order[g0:g1]] = base + np.arange(cnt)
        base += cnt + pad
        voff.append(base // 128)
        f = 0
        if first_cell[cpack[i]] == i:
            f |= F_FIRST_OF_PACK
        if last_cell[cpack[i]] == i:
            f |= F_LAST_OF_PACK
        if i == 0 or cchunk[i] != cchunk[i - 1]:
            f |= F_FIRST_OF_CHUNK
        if i == ncell - 1 or cchunk[i + 1] != cchunk[i]:
            f |= F_LAST_OF_CHUNK
        flags[i] = f

    ecol = np.concatenate(ecol_p) if ecol_p else np.zeros(0, np.int64)
    erow = np.concatenate(erow_p) if erow_p else np.zeros(0, np.int64)
    live = np.concatenate(live_p) if live_p else np.zeros(0, bool)
    S = ecol.size

    # chunk ordinals (DMA double-buffer parity) + next chunk to prefetch
    chunk_changes = np.concatenate([[True], np.diff(cchunk) != 0])
    cord = np.cumsum(chunk_changes) - 1
    nxt = np.empty(ncell, dtype=np.int64)
    nxt[-1] = cchunk[-1]  # harmless self-prefetch on the last chunk
    for i in range(ncell - 2, -1, -1):
        nxt[i] = cchunk[i + 1] if cchunk[i + 1] != cchunk[i] else nxt[i + 1]

    # per-QUAD window HOP LIST (chunk-relative 512-col window ids; the
    # +512 slack keeps the 4-tile gather table inside the padded
    # buffer). r4 iterated the DENSE range [wlo, wlo+span) - measured
    # span mean 23.5 vs 10.0 DISTINCT windows per quad on the 287k-tet
    # bench mesh (slots cluster, they are not uniform), so the r5 loop
    # visits an explicit list of the touched windows only. The list
    # rides idx row 2 (lanes qd*512+k, k < 128 - distinct counts are
    # bounded by the 128 slots of a vreg times clustering; measured max
    # 65); vwin keeps only the trip count. The four vregs of a quad
    # still share each window's gather table.
    w = (ecol >> 9).reshape(-1, 512)  # non-decreasing per quad (src sort)
    chg = np.diff(w, axis=1) != 0
    ndist = chg.sum(axis=1).astype(np.int64) + 1
    if int(ndist.max() if ndist.size else 0) > 128:
        raise ValueError(
            f"ring plan quad touches {int(ndist.max())} > 128 distinct "
            "gather windows; use a coarser chunk or the pull path"
        )
    nq = w.shape[0]
    hops = np.repeat(w[:, -1:], 128, axis=1)
    if nq:
        hops[:, 0] = w[:, 0]
        rows_c, cols_c = np.nonzero(chg)  # row-major, cols ascending
        cnt = chg.sum(axis=1)
        kpos = np.arange(rows_c.size) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
        )
        hops[rows_c, kpos + 1] = w[rows_c, cols_c + 1]
    vwin = ndist.astype(np.int32)
    voff_np = np.asarray(voff, dtype=np.int64)
    vmax = int(np.diff(voff_np).max()) if ncell else 0

    # pack the per-cell control words (field-width contracts)
    nchunk_tot = int(cchunk.max()) + 1 if ncell else 0
    if nchunk_tot > 0xFFF or npk > 0x3FFFFF or num_ring > (1 << 10) - 1:
        raise ValueError(
            f"ring plan exceeds packed-word widths: chunks={nchunk_tot} "
            f"(<=4095), packs={npk} (<=4194303), ring={num_ring} (<=1023)"
        )
    cell_a = (
        cchunk | (nxt << 12) | ((cord & 1) << 24) | (flags << 25)
    ).astype(np.int32)
    cell_b = (cpack | (ring_of[cpack] << 22)).astype(np.int32)

    # SMEM budget: scalar-prefetch operands must fit the 1 MB core SMEM
    smem_bytes = 4 * (voff_np.size + vwin.size + 2 * ncell)
    if smem_bytes > 900 * 1024:
        raise ValueError(
            f"ring plan scalar-prefetch footprint {smem_bytes/1024:.0f} KB "
            "exceeds the SMEM budget; use a coarser chunk or the pull path"
        )

    return RingPlan(
        num_tgt=num_tgt,
        num_pack=npk,
        sp=sp,
        num_cell=ncell,
        S=S,
        src_size=src_size,
        chunk=chunk,
        num_ring=num_ring,
        ecol=ecol.astype(np.int32),
        erow=erow.astype(np.int32),
        elive=live,
        slot_of_contrib=slot_of,
        cell_voff=voff_np.astype(np.int32),
        cell_a=cell_a,
        cell_b=cell_b,
        vwin=vwin,
        hops=hops.astype(np.int32),
        vmax=max(vmax, 1),
    )


def ring_plan_stats(plan: RingPlan) -> dict:
    nwin = plan.vwin
    return dict(
        S=plan.S,
        cells=plan.num_cell,
        pad_frac=float(plan.S / max(plan.elive.sum(), 1) - 1.0),
        win_mean=float(nwin.mean()) if nwin.size else 0.0,
        win_p99=float(np.percentile(nwin, 99)) if nwin.size else 0.0,
        num_ring=plan.num_ring,
        acc_mb=plan.num_ring * 128 * 128 * 4 / 1e6,
        stream_mb=plan.src_size * 8 * 4 / 1e6,
    )


def ring_index_rows(plan: RingPlan) -> jnp.ndarray:
    """(2, S) int32 device rows: row 0 = ecol, row 1 = erow | live<<15.
    The per-quad hop lists travel separately (ring_hop_rows) and are
    DMA'd to SMEM so the window loop reads them as native scalars."""
    packed = plan.erow.astype(np.int32) | (
        plan.elive.astype(np.int32) << 15
    )
    return jnp.asarray(np.stack([plan.ecol, packed]).astype(np.int32))


def ring_hop_rows(plan: RingPlan) -> jnp.ndarray:
    """(num_quad + vmax//4, 128) int32: row q = quad q's distinct-window
    hop list (padded by repeating; tail rows pad the per-cell DMA)."""
    pad = max(plan.vmax // 4, 1)
    return jnp.asarray(
        np.concatenate(
            [plan.hops, np.zeros((pad, 128), plan.hops.dtype)]
        ).astype(np.int32)
    )


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ring_kernel(
    # scalar prefetch
    voff_ref, vwin_ref, ca_ref, cb_ref,
    # inputs
    idx_hbm, hop_hbm, x_hbm, o_hbm,
    # scratch
    xbuf, ibuf, hbuf, acc, sbuf, sem_x, sem_i, sem_h, sem_o,
    *, vmax, C, R, HB, SPK, scale, chunkw, blocked=False,
):
    """R = source value rows carried per pass (8 or 16; C <= R real),
    HB = SPK // 128 row-blocks per pack accumulator."""
    i = pl.program_id(0)
    ni = pl.num_programs(0)
    ca = ca_ref[i]
    flags = (ca >> 25) & 0xF
    cchunk = ca & 0xFFF
    cnext = (ca >> 12) & 0xFFF
    parity = (ca >> 24) & 1
    cb = cb_ref[i]

    def chunk_copy(cid, slot):
        if blocked:  # (nchunk, R, chunkw) pre-blocked source
            return pltpu.make_async_copy(
                x_hbm.at[cid], xbuf.at[slot], sem_x.at[slot]
            )
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(cid * chunkw, chunkw + 512)],
            xbuf.at[slot],
            sem_x.at[slot],
        )

    def idx_copy(step, slot):
        return pltpu.make_async_copy(
            idx_hbm.at[:, pl.ds(voff_ref[step] * 128, vmax * 128)],
            ibuf.at[slot],
            sem_i.at[slot],
        )

    vmaxq = max(vmax // 4, 1)

    def hop_copy(step, slot):
        return pltpu.make_async_copy(
            hop_hbm.at[pl.ds(voff_ref[step] // 4, vmaxq), :],
            hbuf.at[slot],
            sem_h.at[slot],
        )

    @pl.when(i == 0)
    def _():
        chunk_copy(ca_ref[0] & 0xFFF, 0).start()
        idx_copy(0, 0).start()
        hop_copy(0, 0).start()

    # prefetch the NEXT chunk as soon as this chunk starts (the rest of
    # the chunk's cells overlap the copy)
    @pl.when(
        jnp.logical_and(flags & F_FIRST_OF_CHUNK != 0, i + 1 < ni)
    )
    def _():
        @pl.when(cnext != cchunk)
        def _():
            chunk_copy(cnext, 1 - parity).start()

    @pl.when(i + 1 < ni)
    def _():
        idx_copy(i + 1, (i + 1) % 2).start()
        hop_copy(i + 1, (i + 1) % 2).start()

    @pl.when(flags & F_FIRST_OF_CHUNK != 0)
    def _():
        chunk_copy(cchunk, parity).wait()

    idx_copy(i, i % 2).wait()
    hop_copy(i, i % 2).wait()
    xb = xbuf.at[parity]
    ib = ibuf.at[i % 2]
    hb_s = hbuf.at[i % 2]
    base = voff_ref[i]

    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def quad_body(qd, cacc):
        # one window HOP LIST per QUAD (idx row 2, lanes qd*512+k): the
        # loop visits only the distinct windows the quad touches
        # (measured: 10.0 distinct vs 23.5 in the r4 dense-range span);
        # the four vregs share each window's gather table
        nwin = vwin_ref[base // 4 + qd]
        meta = []
        for d in range(4):
            off = pl.multiple_of((qd * 4 + d) * 128, 128)
            ecol = ib[0:1, pl.ds(off, 128)]
            epak = ib[1:2, pl.ds(off, 128)]
            erow = epak & 0x7FFF
            live = (epak >> 15) & 1
            m4r = jnp.broadcast_to(ecol & 127, (4 * R, 128))
            parr = jnp.broadcast_to((ecol >> 7) & 3, (R, 128))
            wr = jnp.broadcast_to(ecol >> 9, (R, 128))
            meta.append((m4r, parr, wr, erow, live))

        def win_body(t, gs):
            w = hb_s[qd, t]  # native SMEM scalar load
            woff = pl.multiple_of(w * 512, 128)
            tbl = jnp.concatenate(
                [xb[:, pl.ds(woff + 128 * k, 128)] for k in range(4)],
                axis=0,
            )  # (4R, 128)
            new = []
            for d in range(4):
                m4r, parr, wr, _, _ = meta[d]
                got = jnp.take_along_axis(tbl, m4r, axis=-1)
                inw = wr == w
                g = gs[d]
                for k in range(4):
                    g = jnp.where(
                        inw & (parr == k), got[R * k : R * k + R], g
                    )
                new.append(g)
            return tuple(new)

        zR = jnp.zeros((R, 128), jnp.float32)
        gs = win_body(0, (zR, zR, zR, zR))
        gs = jax.lax.fori_loop(1, nwin, win_body, gs)

        phs, pls, ohs = [], [], []
        zb = jnp.zeros((R, 128), jnp.bfloat16)
        for d in range(4):
            _, _, _, erow, live = meta[d]
            g = jnp.where(jnp.broadcast_to(live, (R, 128)) == 1, gs[d], 0.0)
            pRh, pRl = _bf16_split(g)
            hiR = jnp.broadcast_to(erow >> 7, (R, 128))
            masks = [hiR == h for h in range(HB)]
            phs.append(
                jnp.concatenate([jnp.where(m, pRh, zb) for m in masks], axis=0)
            )
            pls.append(
                jnp.concatenate([jnp.where(m, pRl, zb) for m in masks], axis=0)
            )
            ohs.append(
                (
                    jnp.broadcast_to(erow & 127, (128, 128)) == lo_iota
                ).astype(jnp.bfloat16)
            )
        P = jnp.concatenate(
            [jnp.concatenate(phs, axis=1), jnp.concatenate(pls, axis=1)],
            axis=0,
        )  # (2*R*HB, 512)
        OH = jnp.concatenate(ohs, axis=1)  # (128, 512)
        out = jax.lax.dot_general(
            P, OH, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return cacc + out[: R * HB] + out[R * HB :]

    nquads = (voff_ref[i + 1] - voff_ref[i]) // 4
    cacc = jax.lax.fori_loop(
        0, nquads, quad_body, jnp.zeros((R * HB, 128), jnp.float32)
    )

    r = cb >> 22

    @pl.when(flags & F_FIRST_OF_PACK != 0)
    def _():
        acc[r] = cacc

    @pl.when(flags & F_FIRST_OF_PACK == 0)
    def _():
        acc[r] = acc[r] + cacc

    @pl.when(flags & F_LAST_OF_PACK != 0)
    def _():
        a = acc[r]
        for h in range(HB):
            for c in range(C):
                sbuf[c, h * 128 : (h + 1) * 128] = a[h * R + c, :] * scale
            for c in range(C, R):
                sbuf[c, h * 128 : (h + 1) * 128] = jnp.zeros(
                    (128,), jnp.float32
                )
        cp = pltpu.make_async_copy(
            sbuf,
            o_hbm.at[:, pl.ds((cb & 0x3FFFFF) * SPK, SPK)],
            sem_o,
        )
        cp.start()
        cp.wait()


def win_ring_reduce(
    plan: RingPlan,
    idx_rows: jnp.ndarray,  # (2, S) from ring_index_rows
    x: jnp.ndarray,  # (C, src_size) rows OR (nchunk, C, chunk) blocks
    scale: float = 1.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y[c, t] = scale * sum_{s: tgt(s)=t} x[c, src(s)] -> (C, num_tgt).

    C <= 16: all component rows ride ONE pass (r5; the r4 kernel was
    C <= 8, so the 16/18-component Jacobian scatter paid the per-cell
    DMA, metadata, and gather-window costs twice).

    x may be pre-blocked (nchunk, C, plan.chunk): source column
    chunk*plan.chunk + col lives at x[chunk, :, col]. The windowed
    Jacobian path emits its G-blocked update table in exactly this
    shape as a VIEW of the element-kernel output - no relayout pass."""
    if interpret is None:
        interpret = INTERPRET
    if x.ndim == 3:
        nchunk, C, cw_x = x.shape
        assert cw_x == plan.chunk, (cw_x, plan.chunk)
        assert C <= 16
        R = 8 if C <= 8 else 16
        HB = plan.sp // 128
        vmax, cw = plan.vmax, plan.chunk
        xr = x.astype(jnp.float32)
        if C < R:
            xr = jnp.pad(xr, ((0, 0), (0, R - C), (0, 0)))
        idx_rows = jnp.pad(idx_rows, ((0, 0), (0, vmax * 128)))
        return _ring_call(
            plan, idx_rows, xr, C, R, HB, vmax, cw, scale, interpret,
            blocked=True,
        )
    C, n_src = x.shape
    assert C <= 16
    R = 8 if C <= 8 else 16
    HB = plan.sp // 128
    vmax, cw = plan.vmax, plan.chunk
    nchunks_cov = -(-n_src // cw)
    xr = jnp.zeros((R, n_src), jnp.float32).at[:C].set(x.astype(jnp.float32))
    # pad so the last chunk's slab and its +512 window slack are in-bounds
    xr = jnp.pad(xr, ((0, 0), (0, nchunks_cov * cw - n_src + cw + 512)))
    idx_rows = jnp.pad(idx_rows, ((0, 0), (0, vmax * 128)))
    return _ring_call(
        plan, idx_rows, xr, C, R, HB, vmax, cw, scale, interpret,
        blocked=False,
    )


def _ring_call(
    plan, idx_rows, xr, C, R, HB, vmax, cw, scale, interpret, blocked
):

    kern = functools.partial(
        _ring_kernel, vmax=vmax, C=C, R=R, HB=HB, SPK=plan.sp,
        scale=float(scale), chunkw=cw, blocked=blocked,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(plan.num_cell,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, R, cw if blocked else cw + 512), jnp.float32),
            pltpu.VMEM((2, 2, vmax * 128), jnp.int32),
            pltpu.SMEM((2, max(vmax // 4, 1), 128), jnp.int32),
            pltpu.VMEM((plan.num_ring, R * HB, 128), jnp.float32),
            pltpu.VMEM((R, plan.sp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(
            (R, plan.num_pack * plan.sp), jnp.float32
        ),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(plan.cell_voff),
        jnp.asarray(plan.vwin),
        jnp.asarray(plan.cell_a),
        jnp.asarray(plan.cell_b),
        idx_rows,
        ring_hop_rows(plan),
        xr,
    )
    return out[:C, : plan.num_tgt]


def ring_reduce_xla(
    plan: RingPlan, x: jnp.ndarray, scale: float = 1.0
) -> jnp.ndarray:
    """Reference lowering (any backend): flat gather + segment-sum."""
    if x.ndim == 3:  # (nchunk, C, chunk) pre-blocked source
        x = x.transpose(1, 0, 2).reshape(x.shape[1], -1)
    src = plan.ecol.astype(np.int64) + np.repeat(
        plan.cell_chunk.astype(np.int64) * plan.chunk,
        np.diff(plan.cell_voff.astype(np.int64)) * 128,
    )
    tgt = plan.erow.astype(np.int64) + (
        np.repeat(
            plan.cell_pack.astype(np.int64),
            np.diff(plan.cell_voff.astype(np.int64)) * 128,
        )
        * plan.sp
    )
    live = jnp.asarray(plan.elive)
    vals = x[:, jnp.asarray(np.clip(src, 0, x.shape[1] - 1))]
    vals = jnp.where(live[None, :], vals, 0.0)
    y = jax.ops.segment_sum(
        vals.T, jnp.asarray(tgt.astype(np.int32)),
        num_segments=plan.num_pack * plan.sp,
    )
    return scale * y[: plan.num_tgt].T.astype(x.dtype)
