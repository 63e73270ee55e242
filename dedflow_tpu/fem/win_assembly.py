"""Irregular-mesh (Delaunay-class) assembly on the WinELL/stream kernels.

This is the round-4 hot path for meshes with NO translation structure -
the input class where the reference's AssembleSystemTet runs at full
device speed with zero structure assumptions (assemble.cu:1467-1762).
The TPU pipeline (mesh RCM-reordered + elements sorted by min node,
mesh.reorder):

  residual F:  one flat row-gather (ne, 4, 12) with a FUSED transpose to
               (48, ne) state rows (measured 14 ms at 1.18M tets - the
               transpose rides the gather for free, separate XLA
               transposes cost 22 ms), -> fused Pallas element kernel
               (fem.pallas_kernels._res_kernel) -> windowed stream
               scatter (sparse.win_stream) into (6, N).
  jacobian J:  row-gather u -> fused LHS element kernel -> scatter of
               the (ne, 16, 18) packed blocks into WinELL entry values
               (sparse.winell), either through the stream kernel
               (comps split 8+8) or the sorted segment-sum oracle.
  SpMV:        sparse.win_kernels.winell_matvec (4.9 ms at 1.18M tets).

The general gather path (fem.assembly + sparse.tiered) remains the
oracle; equivalence is tested in tests/test_win_assembly.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.fem import pallas_kernels as pk
from dedflow_tpu.sparse import fsbsr as fs
from dedflow_tpu.sparse import win_stream as ws
from dedflow_tpu.sparse import winell as we

# row permutation: element-kernel input rows from the (48, ne) fused
# gather-transpose of take_rows(concat(wa, dwa), ien) (rows a*12+c):
#   u rows i*4+a, du rows i*4+a, p (dwa comp 3), phi, T, dphi, dT
_STATE_PERM = np.array(
    [a * 12 + i for i in range(3) for a in range(4)]  # u (wa 0:3)
    + [a * 12 + 6 + i for i in range(3) for a in range(4)]  # du (dwa 0:3)
    + [a * 12 + 9 for a in range(4)]  # p (dwa 3)
    + [a * 12 + 4 for a in range(4)]  # phi (wa 4)
    + [a * 12 + 5 for a in range(4)]  # T (wa 5)
    + [a * 12 + 10 for a in range(4)]  # dphi (dwa 4)
    + [a * 12 + 11 for a in range(4)]  # dT (dwa 5)
)

# windowed-gather row maps (sparse.win_gather): state-table row c of
# vertex a -> element-kernel input row (the order _STATE_PERM encodes).
# State table layout: rows 0-5 = wa comps, 6 = source, 8-13 = dwa comps.
_RES_ROWMAP = tuple(
    tuple(
        (c * 4 + a) if c < 3  # u
        else (28 + a) if c == 4  # phi
        else (32 + a) if c == 5  # T
        else (44 + a) if c == 6  # source
        else (12 + (c - 8) * 4 + a) if 8 <= c <= 10  # du
        else (24 + a) if c == 11  # p (rate slot)
        else (36 + a) if c == 12  # dphi
        else (40 + a) if c == 13  # dT
        else -1
        for c in range(16)
    )
    for a in range(4)
)
_JAC_ROWMAP = tuple(
    tuple((c * 4 + a) if c < 3 else -1 for c in range(8)) for a in range(4)
)

# pull-path Jacobian memory caps (see jacobian_win): elements per
# LHS-element-kernel chunk (transient ~ 2*18*16*chunk floats ~ 600 MB)
# and gathered update ROWS (= tier_rows * pad) per tier-gather chunk
# (transient ~ 18 * rows * 4 B ~ 580 MB)
_JAC_EKERNEL_CHUNK = 1 << 18
_JAC_GATHER_ELEMS = 1 << 23

# ring-path update-table element-block size: source column
# blk(e)*16G + ab*G + (e % G). The r4 e-major layout (col = e*16 + ab)
# needed a (16, 18, ne) -> (18, 16*ne) lane-interleaving transpose that
# measured 19 ms at 287k tets - as much as the whole ring reduce; the
# G-blocked layout builds from the element-kernel output with a row
# permute + an OUTER-axes transpose (contiguous 16G inner dim, near
# bandwidth). Cost: gather windows per quad 10.0 -> 15.0 (sources
# fragment into 16 ab-runs per block) - measured net win. G*16 must not
# exceed the ring chunk (sparse.win_ring, 128k cols).
_JAC_GBLK = 8192




@jax.tree_util.register_dataclass
@dataclass
class WinAssemblyContext:
    """Device tables + host plans for the windowed irregular path."""

    # element tables
    res_geom: jnp.ndarray  # (19, ne) pk.res_geom_rows
    lhs_geom: jnp.ndarray  # (15, ne) pk.lhs_geom_rows
    ien: jnp.ndarray  # (ne, 4) int32
    # residual scatter (4 per-vertex passes)
    fsc_idx: tuple  # 4x (2, S) stream_index_rows
    # jacobian scatter (targets = WinELL entry slots)
    jsc_idx: jnp.ndarray | None  # (2, SJ) or None (xla scatter)
    upd_perm: jnp.ndarray | None  # (ne*16,) int32 sorted-by-entry order
    upd_tgt: jnp.ndarray | None  # (ne*16,) int32 entry slot, sorted
    # pull tiers: tuple of (eidx (nt, pad), slots (nt,)) degree tiers
    pull_tiers: tuple | None
    mult_win: jnp.ndarray  # (2, S_w) static phi/T diagonal values
    num_node: int = dataclass_field(metadata=dict(static=True))
    num_elem: int = dataclass_field(metadata=dict(static=True))
    # host-side plans (hashable statics)
    fsc_plan: object = dataclass_field(default=None, metadata=dict(static=True))
    jsc_plan: object = dataclass_field(default=None, metadata=dict(static=True))
    win_plan: object = dataclass_field(default=None, metadata=dict(static=True))
    gat_plan: object = dataclass_field(default=None, metadata=dict(static=True))
    jac_scatter: str = dataclass_field(default="stream", metadata=dict(static=True))
    # "pallas" on TPU, "xla" elsewhere (CPU tests / f64 oracle)
    backend: str = dataclass_field(default="pallas", metadata=dict(static=True))
    # algebraic-multigrid plan for pc='mg' (solver.amg.AMGIndices, pytree)
    # + the WinELL entry slot of each CSR entry (level-0 value gather)
    amg_idx: object | None = None
    amg_eon: jnp.ndarray | None = None

    @property
    def dia_offsets(self):  # parity with LatticeContext for callers
        return None


def attach_face_win_plans(face_ctxs, sparsity, win_plan):
    """Attach WinELL-entry scatter plans to weak-BC face contexts so the
    windowed irregular path can assemble facet (Nitsche) terms
    (assemble.cu:1764-1964): each facet (f, ab) contribution maps to the
    parent element's CSR nnz slot and from there to its WinELL entry.
    Returns the face contexts with win_perm/win_seg/win_uniq populated.

    The compact unique-entry segment-sum keeps the per-assembly facet
    scatter O(boundary), not O(matrix): nu <= nf*16 << S."""
    import dataclasses as _dc

    out = []
    for fctx in face_ctxs:
        nnz16 = np.asarray(sparsity.elem_nnz, dtype=np.int64).reshape(
            -1, 16
        )[np.asarray(fctx.f2e)]
        tgt = win_plan.entry_of_nnz[nnz16.ravel()]
        perm = np.argsort(tgt, kind="stable")
        tgt_s = tgt[perm]
        uniq, seg = np.unique(tgt_s, return_inverse=True)
        out.append(
            _dc.replace(
                fctx,
                win_perm=jnp.asarray(perm.astype(np.int32)),
                win_seg=jnp.asarray(seg.astype(np.int32)),
                win_uniq=jnp.asarray(uniq.astype(np.int32)),
                win_num_uniq=int(uniq.size),
            )
        )
    return tuple(out)


def build_win_amg(sparsity, win_plan, n: int, min_nodes: int = 2048):
    """(amg_idx, amg_eon) for pc='mg' on the windowed path: the
    pattern-only solver.amg hierarchy over the nodal sparsity plus the
    WinELL entry slot of each CSR entry (the level-0 value gather).
    Shared by build_win_context(with_amg=True) and bench.py so the two
    cannot drift."""
    from dedflow_tpu.solver.amg import AMGIndices, build_amg_plan

    rp = np.asarray(sparsity.row_ptr, dtype=np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), np.diff(rp))
    amg_idx = AMGIndices.from_plan(
        build_amg_plan(rows, sparsity.col_ind, n, min_nodes=min_nodes)
    )
    amg_eon = jnp.asarray(win_plan.entry_of_nnz.astype(np.int32))
    return amg_idx, amg_eon


def build_win_context(
    mesh, sparsity, dtype=jnp.float32, jac_scatter: str = "pull",
    backend: str | None = None, with_amg: bool = False,
    amg_min_nodes: int = 2048, with_win_gather: bool = False,
) -> WinAssemblyContext:
    """mesh must be RCM-reordered with elements sorted by min node
    (mesh.reorder.reorder_mesh) - locality is what bounds the stream
    windows. `sparsity` = sparse.topology.build_sparsity(ien, n)."""
    from dedflow_tpu.fem.assembly import tet_geometry

    if backend is None:
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    ien = np.asarray(mesh.ien, dtype=np.int64)
    ne, n = ien.shape[0], mesh.num_node
    xg = jnp.asarray(mesh.xg, dtype=jnp.float32)
    geom = tet_geometry(xg[jnp.asarray(ien)])
    res_geom = pk.res_geom_rows(geom.shgrad, geom.det_j, geom.metric)
    lhs_geom = pk.lhs_geom_rows(geom.shgrad, geom.det_j, geom.metric)

    # residual scatter: FOUR per-vertex passes (pass a: contribution
    # e -> node ien[e, a], source col e). The kernel's source rows are
    # then direct slices of the element-kernel output - a combined
    # (4, 6, ne) -> (6, ne, 4) relayout puts 4 in the minor dim, which
    # XLA moves at ~24 ms/113 MB (measured); the slices are free.
    src = np.arange(ne, dtype=np.int64)
    fsc_plan = tuple(
        ws.build_stream_plan(ien[:, a], src, n, ne) for a in range(4)
    )
    fsc_idx = tuple(ws.stream_index_rows(pl) for pl in fsc_plan)

    # WinELL matrix plan on the nodal sparsity
    win_plan = we.build_winell_plan(
        sparsity.row_ptr, sparsity.col_ind, n
    )

    # jacobian scatter: contribution (e, ab) -> entry slot
    elem_nnz = np.asarray(sparsity.elem_nnz, dtype=np.int64).reshape(ne, 16)
    entry_tgt = win_plan.entry_of_nnz[elem_nnz]  # (ne, 16)
    jsc_idx = jsc_plan = upd_perm = upd_tgt = None
    pull_tiers = None
    if jac_scatter == "stream":
        # source col e*16 + ab (e-major; see the residual scatter note)
        jtgt = entry_tgt.reshape(-1)
        jsrc = np.arange(16 * ne, dtype=np.int64)
        jsc_plan = ws.build_stream_plan(jtgt, jsrc, win_plan.S, 16 * ne)
        jsc_idx = ws.stream_index_rows(jsc_plan)
    elif jac_scatter == "ring":
        # chunk-major ring-accumulated scatter (sparse.win_ring): the
        # slab-stream plan cannot carry the matrix scatter (column-sorted
        # entry packs draw from ~900k-column source spans; see the
        # win_ring module docstring). Sources live in the G-blocked
        # update-table layout (_JAC_GBLK).
        from dedflow_tpu.sparse import win_ring as wr

        jtgt = entry_tgt.reshape(-1)
        gblk = _JAC_GBLK
        ne_pad = -(-ne // gblk) * gblk
        ee = np.repeat(np.arange(ne, dtype=np.int64), 16)
        ab = np.tile(np.arange(16, dtype=np.int64), ne)
        jsrc = (ee // gblk) * 16 * gblk + ab * gblk + (ee % gblk)
        try:
            jsc_plan = wr.build_ring_plan(
                jtgt, jsrc, win_plan.S, 16 * ne_pad
            )
            jsc_idx = wr.ring_index_rows(jsc_plan)
        except ValueError:
            # plan exceeds a packed-word / SMEM budget (very large or
            # badly-ordered mesh): fall back to the pull path
            jac_scatter = "pull"
    if jac_scatter == "pull":
        # per-ENTRY pull: each WinELL entry gathers its incident
        # contribution rows (mean 6.6 on Delaunay) from the flat
        # (ne*16, 16) update array, padded in degree tiers. Converts the
        # scatter into wide row-gathers - the cost law XLA is actually
        # good at (utils.xla.take_rows ~0.74 G rows/s) - and writes
        # winell entry order directly.
        flat_tgt = entry_tgt.reshape(-1)
        order = np.argsort(flat_tgt, kind="stable")
        tgt_s = flat_tgt[order]
        counts = np.bincount(tgt_s, minlength=win_plan.S)
        ends = np.cumsum(counts)
        fill = 16 * ne  # appended zero row
        ladder = [8, 12, 16, 24, 32, 48, 64, 128, 256, 512]
        deg = counts
        real = np.zeros(win_plan.S, dtype=bool)
        real[win_plan.entry_of_nnz] = True
        # extend the ladder so every real entry lands in a tier - a
        # silent drop would zero its Jacobian contributions (ADVICE r4)
        max_deg = int(deg[real].max()) if real.any() else 0
        while ladder[-1] < max_deg:
            ladder.append(ladder[-1] * 2)
        tiers = []
        for i, pad in enumerate(ladder):
            lo = ladder[i - 1] if i else 0
            sel = np.nonzero(real & (deg > lo) & (deg <= pad))[0]
            if sel.size == 0:
                continue
            c = counts[sel]
            starts = ends[sel] - c
            k = np.arange(pad)
            pos = np.minimum(starts[:, None] + k[None, :], order.size - 1)
            eidx = np.where(k[None, :] < c[:, None], order[pos], fill)
            tiers.append(
                (jnp.asarray(eidx.astype(np.int32)),
                 jnp.asarray(sel.astype(np.int32)))
            )
        pull_tiers = tuple(tiers)
    elif jac_scatter not in ("stream", "ring"):
        flat_tgt = entry_tgt.reshape(-1)
        perm = np.argsort(flat_tgt, kind="stable")
        upd_perm = jnp.asarray(perm.astype(np.int32))
        upd_tgt = jnp.asarray(flat_tgt[perm].astype(np.int32))

    # windowed state-gather plan (sparse.win_gather): per-(vertex, vreg)
    # node-window schedule for the in-kernel element state gather.
    # MEASURED SLOW at bench scale (residual 189.9 ms via win_gather vs
    # 33.4 ms via the flat take_rows gather+fused transpose at 1.18M
    # tets, r5 winfix_probe) - kept for the kernel's tests but NOT built
    # by default; pass with_win_gather=True to opt in.
    gat_plan = None
    if with_win_gather:
        from dedflow_tpu.sparse.win_gather import build_gather_plan

        gat_plan = build_gather_plan(ien.T, n)

    # static phi/T identity diagonals (frozen mode): nodal tet
    # multiplicity at the diagonal entries (assemble.cu:757-758)
    mult = np.bincount(ien.ravel(), minlength=n).astype(np.float32)
    mw = np.zeros((2, win_plan.S), np.float32)
    mw[:, win_plan.diag_entry] = mult[None, :]

    # algebraic-multigrid index hierarchy for pc='mg' (solver.amg):
    # pattern-only, built once per mesh
    amg_idx = amg_eon = None
    if with_amg:
        amg_idx, amg_eon = build_win_amg(
            sparsity, win_plan, n, min_nodes=amg_min_nodes
        )
    return WinAssemblyContext(
        res_geom=res_geom.astype(jnp.float32),
        lhs_geom=lhs_geom.astype(jnp.float32),
        ien=jnp.asarray(ien.astype(np.int32)),
        fsc_idx=fsc_idx,
        jsc_idx=jsc_idx,
        upd_perm=upd_perm,
        upd_tgt=upd_tgt,
        mult_win=jnp.asarray(mw),
        num_node=n,
        num_elem=ne,
        fsc_plan=fsc_plan,
        jsc_plan=jsc_plan,
        win_plan=win_plan,
        gat_plan=gat_plan,
        jac_scatter=jac_scatter,
        pull_tiers=pull_tiers,
        backend=backend,
        amg_idx=amg_idx,
        amg_eon=amg_eon,
    )


# ---------------------------------------------------------------------------


def residual_win(
    ctx: WinAssemblyContext,
    w_alpha: jnp.ndarray,  # (N, 6)
    dw_alpha: jnp.ndarray,  # (N, 6)
    phys,
    scheme,
    source=None,
    backend: str | None = None,
    interpret: bool = False,
    face_ctxs=(),
) -> jnp.ndarray:
    """(6, N) component-major residual: volume terms + weak-BC facet
    terms (assemble.cu:1068-1126) for any face context carrying the
    standard node scatter plan. Facet work is O(boundary) - the plain
    sorted segment-sum is ~free against the volume stream scatter."""
    if backend is None:
        backend = ctx.backend

    f32 = jnp.float32
    ne = ctx.num_elem
    if backend == "pallas" and ctx.gat_plan is not None:
        # windowed in-kernel state gather (sparse.win_gather): emits the
        # element-kernel rows directly - no XLA row-gather / transpose
        from dedflow_tpu.sparse.win_gather import win_gather

        x16 = jnp.zeros((14, ctx.num_node), f32)
        x16 = x16.at[:6].set(w_alpha.T.astype(f32))
        x16 = x16.at[8:14].set(dw_alpha.T.astype(f32))
        if source is not None:
            x16 = x16.at[6].set(source.astype(f32))
        gathered = win_gather(
            ctx.gat_plan, ctx.ien.T, x16, _RES_ROWMAP, 48,
            interpret=interpret,
        )
        inp = jnp.concatenate([ctx.res_geom, gathered])  # (67, ne)
    else:
        from dedflow_tpu.utils.xla import take_rows

        wd = take_rows(
            jnp.concatenate(
                [w_alpha.astype(f32), dw_alpha.astype(f32)], axis=1
            ),
            ctx.ien,
        ).reshape(ne, 48)
        state_rows = wd.T[jnp.asarray(_STATE_PERM)]  # (44, ne)
        src_rows = (
            jnp.zeros((4, ne), f32)
            if source is None
            else take_rows(source.astype(f32), ctx.ien).T
        )
        inp = jnp.concatenate(
            [ctx.res_geom, state_rows, src_rows]
        )  # (67, ne)
    out24 = pk.res_rows_call(
        inp, phys, scheme, backend=backend, interpret=interpret
    )
    y = None
    for a in range(4):
        fv = out24[a * 6 : (a + 1) * 6]
        if backend == "xla":
            ya = ws.stream_reduce_xla(ctx.fsc_plan[a], fv)
        else:
            ya = ws.win_stream_reduce(
                ctx.fsc_plan[a], ctx.fsc_idx[a], fv, interpret=interpret
            )
        y = ya if y is None else y + ya
    if face_ctxs:
        from dedflow_tpu.fem.face import (
            face_residual_elements,
            scatter_face_residual,
        )

        for fctx in face_ctxs:
            ef = face_residual_elements(
                fctx, w_alpha.astype(f32), dw_alpha.astype(f32), phys
            )
            y = y + scatter_face_residual(fctx, ef, ctx.num_node).T
    return y


def jacobian_win(
    ctx: WinAssemblyContext,
    w_alpha: jnp.ndarray,  # (N, 6)
    phys,
    scheme,
    backend: str | None = None,
    interpret: bool = False,
    dw_alpha: jnp.ndarray | None = None,  # (N, 6); needed for face terms
    face_ctxs=(),
    scalar_implicit: bool = False,
) -> we.WinELLMatrix:
    """WinELL field-split Jacobian.

    scalar_implicit=True routes the implicit phi/T transport tangents
    (melt-pool runs; pallas_kernels._lhs_rows comps 16/17) through the
    same entry scatter as the velocity-pressure comps; the frozen mode
    installs the static identity diagonals instead. face_ctxs adds the
    weak-BC facet blocks (assemble.cu:1127-1193) via the compact
    WinELL-entry plans attached by attach_face_win_plans."""
    if backend is None:
        backend = ctx.backend

    f32 = jnp.float32
    ne = ctx.num_elem
    if backend == "pallas" and ctx.gat_plan is not None:
        from dedflow_tpu.sparse.win_gather import win_gather

        u_rows = win_gather(
            ctx.gat_plan, ctx.ien.T, w_alpha[:, :3].T.astype(f32),
            _JAC_ROWMAP, 12, interpret=interpret,
        )  # (12, ne) rows i*4+a
    else:
        from dedflow_tpu.utils.xla import take_rows

        ue = take_rows(w_alpha[:, :3].astype(f32), ctx.ien).reshape(ne, 12)
        u_rows = ue.T[
            jnp.asarray(
                np.array([a * 3 + i for i in range(3) for a in range(4)])
            )
        ]  # (12, ne) rows i*4+a
    geo_rows = [ctx.lhs_geom[:12], u_rows, ctx.lhs_geom[12:]]
    if scalar_implicit:
        # the implicit phi/T taus use the residual's metric form
        # t1 = u.G.u: append the 6 packed metric rows (res_geom 13:19)
        geo_rows.append(ctx.res_geom[13:19])
    inp = jnp.concatenate(geo_rows)  # (27|33, ne)
    # rows (ab)*18 + c; frozen mode scatters comps 0..15 (16/17 are the
    # static identity diagonals, installed below), implicit mode all 18
    ncs = 18 if scalar_implicit else 16
    plan = ctx.win_plan
    ekb = "xla" if backend == "xla" else "pallas"
    if ctx.jac_scatter == "pull":
        # element kernel + comp-major transpose in element CHUNKS written
        # into a preallocated update table: the full (288, ne) kernel
        # output plus its (ncs, 16*ne) transpose peak at ~2.6 GB live at
        # 1.18M tets (measured RESOURCE_EXHAUSTED alongside the tier
        # gathers on a 16 GB chip); chunking caps the transient at
        # ~2*ncs*16*chunk floats while the table itself stays the only
        # full-size buffer. Last column is the zero fill target.
        ck = _JAC_EKERNEL_CHUNK
        upd = jnp.zeros((ncs, 16 * ne + 1), jnp.float32)
        for lo in range(0, ne, ck):
            hi = min(ne, lo + ck)
            outk = pk.lhs_rows_call(
                inp[:, lo:hi], phys, scheme, backend=ekb,
                interpret=interpret, scalar_implicit=scalar_implicit,
            )
            blk = (
                outk.reshape(16, 18, hi - lo)[:, :ncs]
                .transpose(1, 2, 0)
                .reshape(ncs, 16 * (hi - lo))
            )
            upd = jax.lax.dynamic_update_slice(upd, blk, (0, 16 * lo))
        ent = jnp.zeros((ncs, plan.S), jnp.float32)
        for eidx, slots in ctx.pull_tiers:
            nt, pad = eidx.shape
            # chunk the per-tier row gathers too: the dominant tier's
            # (ncs, nt*pad) temp is ~1.2 GB at 1.18M tets
            rck = max(1, _JAC_GATHER_ELEMS // max(pad, 1))
            for rlo in range(0, nt, rck):
                rhi = min(nt, rlo + rck)
                got = upd[:, eidx[rlo:rhi].reshape(-1)].reshape(
                    ncs, rhi - rlo, pad
                )
                ent = ent.at[:, slots[rlo:rhi]].set(got.sum(axis=2))
    elif ctx.jac_scatter == "ring":
        # chunk-major ring scatter (sparse.win_ring). The update table
        # uses the G-blocked layout (_JAC_GBLK): per G-element block the
        # element-kernel output needs only a static ROW permute + an
        # outer-axes transpose (contiguous 16G inner dim) - the r4
        # e-major layout's (16, 18, ne) -> (18, 16ne) lane interleave
        # measured 19 ms at 287k tets, as much as the ring reduce.
        from dedflow_tpu.sparse import win_ring as wr

        gblk = _JAC_GBLK
        ne_pad = -(-ne // gblk) * gblk
        nblk = ne_pad // gblk
        # edge-replicate pad columns: zero geometry would emit NaNs
        inp_pad = (
            jnp.pad(inp, ((0, 0), (0, ne_pad - ne)), mode="edge")
            if ne_pad != ne
            else inp
        )
        xs = inp_pad.reshape(inp.shape[0], nblk, gblk).transpose(1, 0, 2)

        def blk_kernel(x):
            # comp_major: rows c*16+ab, so the ring's (nblk, C, 16G)
            # chunk-blocked source below is a pure VIEW of the output
            return pk.lhs_rows_call(
                x, phys, scheme, backend=ekb, interpret=interpret,
                scalar_implicit=scalar_implicit, comp_major=True,
            )

        outs = jax.lax.map(blk_kernel, xs)  # (nblk, 288, G) rows c*16+ab
        # comps ride ONE <=16-row ring pass (+ a 2-row pass for the
        # implicit phi/T tangents); each slice is a contiguous view
        parts = []
        for lo in range(0, ncs, 16):
            hi = min(ncs, lo + 16)
            x3d = outs[:, 16 * lo : 16 * hi, :].reshape(
                nblk, hi - lo, 16 * gblk
            )
            if backend == "xla":
                parts.append(wr.ring_reduce_xla(ctx.jsc_plan, x3d))
            else:
                parts.append(
                    wr.win_ring_reduce(
                        ctx.jsc_plan, ctx.jsc_idx, x3d, interpret=interpret
                    )
                )
        ent = jnp.concatenate(parts, axis=0)  # (ncs, S_w)
    elif ctx.jac_scatter == "stream":
        out288 = pk.lhs_rows_call(
            inp, phys, scheme, backend=ekb, interpret=interpret,
            scalar_implicit=scalar_implicit,
        )
        # comps ride <=8-row stream passes; source col e*16 + ab:
        # one transpose pass over the LHS output
        src = (
            out288.reshape(16, 18, ne)[:, :ncs]
            .transpose(1, 2, 0)
            .reshape(ncs, 16 * ne)
        )
        parts = []
        for lo in range(0, ncs, 8):
            rows = src[lo : lo + 8]
            if backend == "xla":
                parts.append(ws.stream_reduce_xla(ctx.jsc_plan, rows))
            else:
                parts.append(
                    ws.win_stream_reduce(
                        ctx.jsc_plan, ctx.jsc_idx, rows, interpret=interpret
                    )
                )
        ent = jnp.concatenate(parts, axis=0)  # (ncs, S_w)
    else:
        # sorted segment-sum oracle (indices precomputed)
        out288 = pk.lhs_rows_call(
            inp, phys, scheme, backend=ekb, interpret=interpret,
            scalar_implicit=scalar_implicit,
        )
        upd = out288.reshape(16, 18, ne)[:, :ncs]  # (16ab, c, ne)
        flat = upd.transpose(2, 0, 1).reshape(ne * 16, ncs)
        flat = flat[ctx.upd_perm]
        summed = jax.ops.segment_sum(
            flat, ctx.upd_tgt, num_segments=plan.S,
            indices_are_sorted=True,
        )  # (S, ncs)
        ent = summed.T
    # weak-BC facet blocks: compact unique-entry segment-sum, O(boundary)
    for fctx in face_ctxs:
        if fctx.win_uniq is None:
            raise ValueError(
                "face context lacks a WinELL scatter plan - call "
                "fem.win_assembly.attach_face_win_plans at solver setup"
            )
        from dedflow_tpu.fem.face import face_lhs_packed

        fupd = face_lhs_packed(
            fctx, w_alpha.astype(f32), dw_alpha.astype(f32), phys, scheme
        )  # (nf*16, 18) fsbsr comp order; comps 15..17 are zero
        compact = jax.ops.segment_sum(
            fupd[fctx.win_perm, :ncs],
            fctx.win_seg,
            num_segments=fctx.win_num_uniq,
            indices_are_sorted=True,
        )  # (nu, ncs)
        ent = ent.at[:, fctx.win_uniq].add(compact.T)
    # WinELL component order: fsbsr comps 0..ncs-1 -> COMP2WIN rows
    vals = jnp.zeros((we.WIN_ROWS, plan.S), jnp.float32)
    vals = vals.at[jnp.asarray(we.COMP2WIN[:ncs]), :].set(ent)
    if not scalar_implicit:
        vals = vals.at[16:18, :].set(ctx.mult_win)
    return we.winell_matrix(plan, vals, backend=backend)
