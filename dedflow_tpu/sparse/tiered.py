"""Degree-tiered ELL storage + grouped scatters for irregular meshes.

The general (gather) assembly path exists for meshes with no exploitable
translation structure at all (fem.lattice covers boxes and translation-
class meshes). On TPU its cost law is per-INDEX, not per-byte
(utils.xla.take_rows: row gathers run ~0.74 G rows/s flat in row width;
XLA scatter/segment-sum ~0.12 G rows/s), so the design here minimizes
index-op COUNT and converts every scatter into a gather:

- **Tiered grouped scatter**: the reference scatters per (element, a, b)
  pair with a linear column search (matrix_impl.cu:88-202). Here each
  node row GATHERS its incident (element, a) updates as wide 72-float
  rows and reduces them into ELL slots with a one-hot contraction. On
  irregular meshes the incident count is long-tailed (Delaunay: mean 27,
  max ~110), so nodes are sorted into PADDING TIERS (24/32/48/...):
  padding the plan to the global max would cost 4x the gather rows, the
  tiers cost ~1.2x. (The box-lattice grouped plan, fem.assembly, is the
  G-uniform special case of this.)
- **Tiered ELL SpMV**: rows sorted by nonzero count, per-tier ELL width
  = the tier's max row degree. The x-gather of an irregular SpMV is
  N*PR rows; Delaunay row degrees are mean 16.5 / max ~62, so global-max
  ELL pays 3.4x the gather rows of the tiered layout.

Rows live in TIER ORDER internally; every vector-valued result is mapped
back with one wide-row gather via `trank` (natural row -> concatenated
tier position). Column ids stay in natural order, so matvec inputs need
no permutation. Tier node counts are padded to the einsum chunk size:
pad rows carry zero data, point their columns at row 0, and are never
selected by `trank`, so they are benign everywhere by construction.

Parity anchor: this is the irregular-mesh counterpart of the reference's
MatrixFS + AssembleSystemTet scatter (matrix.h:93-103, assemble.cu:
1467-1762), which makes no structure assumption about the mesh.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.sparse.fsbsr import FSBSRMatrix
from dedflow_tpu.utils.xla import take_rows

# Tier pad ladder for the grouped (e, a)-per-node plan and row degrees.
PAD_LADDER = (16, 24, 32, 48, 64, 96, 128, 192, 256, 384, 512)
# nodes per einsum chunk cap, scaled down for wide tiers (see _chunk_for)
_CHUNK_BYTES = 192 * 1024 * 1024


@jax.tree_util.register_dataclass
@dataclass
class TierPlan:
    """One padding tier of the grouped scatter plan (tier-local rows)."""

    gidx: jnp.ndarray  # (nt, pad) int32 -> rows of the (ne*4, .) update
    slot: jnp.ndarray  # (nt, pad, 4) int32 ELL slot of (group, b)
    nodes: jnp.ndarray  # (nt,) natural node id (pad rows: 0)
    ell_col: jnp.ndarray  # (nt, prt) int32 natural column ids
    diag_slot: jnp.ndarray  # (nt,) int32
    pad: int = field(metadata=dict(static=True))
    prt: int = field(metadata=dict(static=True))  # tier ELL width
    chunk: int = field(metadata=dict(static=True))  # einsum chunk rows


@jax.tree_util.register_dataclass
@dataclass
class TieredPlan:
    tiers: tuple  # tuple[TierPlan, ...]
    trank: jnp.ndarray  # (N,) natural node -> concatenated tier position
    num_node: int = field(metadata=dict(static=True))
    fill: int = field(metadata=dict(static=True))  # = ne*4 (OOB gather id)


def _chunk_for(pad: int, width: int) -> int:
    """Einsum chunk rows so the materialized one-hot stays bounded."""
    c = _CHUNK_BYTES // max(pad * 4 * width * 4, 1)
    return int(max(256, min(8192, (c // 256) * 256)))


def build_tiered_plan(
    node_perm: np.ndarray,  # (ne*4,) (e,a) rows sorted by node
    gcounts: np.ndarray,  # (N,) incident (e,a) count per node
    slot_tbl: np.ndarray,  # (ne*4, 4) ELL slot of (e*4+a, b)
    lens: np.ndarray,  # (N,) row degree
    ell_col: np.ndarray,  # (N, PR) natural column ids
    diag_slot: np.ndarray,  # (N,)
    pads=PAD_LADDER,
) -> TieredPlan:
    """Host-side tier construction. Nodes are bucketed by incident-count
    into the pad ladder; buckets below a minimum population merge upward
    (few compile variants, bounded padding waste)."""
    n = gcounts.shape[0]
    m = node_perm.shape[0]
    pads = [p for p in pads if p >= int(gcounts.min() or 1)] or [pads[-1]]
    while pads[-1] < gcounts.max():
        pads.append(pads[-1] * 2)
    tier_of = np.searchsorted(np.asarray(pads), gcounts, side="left")
    # merge sparse tiers upward
    min_pop = max(1024, n // 256)
    for t in range(len(pads) - 1):
        if 0 < np.sum(tier_of == t) < min_pop:
            tier_of[tier_of == t] = t + 1
    goff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(gcounts, out=goff[1:])

    tiers = []
    order = []
    for t in range(len(pads)):
        nodes = np.where(tier_of == t)[0]
        if nodes.size == 0:
            continue
        pad = int(pads[t])
        prt = int(lens[nodes].max())
        chunk = _chunk_for(pad, prt)
        nt = (nodes.size + chunk - 1) // chunk * chunk
        if nt > nodes.size * 2 and nt > chunk:
            nt = (nodes.size + chunk - 1) // chunk * chunk
        order.append(nodes)
        npad = nt - nodes.size
        gidx = np.full((nt, pad), m, dtype=np.int64)
        jj = np.arange(pad)[None, :]
        valid = jj < gcounts[nodes][:, None]
        gidx[:nodes.size][valid] = node_perm[
            (goff[nodes][:, None] + jj)[valid]
        ]
        slot = np.zeros((nt, pad, 4), dtype=np.int32)
        slot[:nodes.size][valid] = slot_tbl[gidx[:nodes.size][valid]]
        cols = np.zeros((nt, prt), dtype=np.int64)
        cols[:nodes.size] = ell_col[nodes, :prt]
        dslot = np.zeros((nt,), dtype=np.int32)
        dslot[:nodes.size] = diag_slot[nodes]
        nodes_pad = np.zeros((nt,), dtype=np.int64)
        nodes_pad[:nodes.size] = nodes
        tiers.append(
            TierPlan(
                gidx=jnp.asarray(gidx.astype(np.int32)),
                slot=jnp.asarray(slot),
                nodes=jnp.asarray(nodes_pad.astype(np.int32)),
                ell_col=jnp.asarray(cols.astype(np.int32)),
                diag_slot=jnp.asarray(dslot),
                pad=pad,
                prt=prt,
                chunk=chunk,
            )
        )
        del npad

    # natural node -> position in the concatenation of (padded) tiers
    trank = np.empty(n, dtype=np.int64)
    base = 0
    for tp, nodes in zip(tiers, order):
        trank[nodes] = base + np.arange(nodes.size)
        base += int(tp.nodes.shape[0])
    return TieredPlan(
        tiers=tuple(tiers),
        trank=jnp.asarray(trank.astype(np.int32)),
        num_node=n,
        fill=m,
    )


# ---------------------------------------------------------------------------
# scatters


def _slot_reduce(vals, slot, prt, chunk):
    """(nt, pad4, 18) update rows + (nt, pad4) slots -> (nt, prt, 18) ELL
    rows via a one-hot contraction, chunked over nodes so the one-hot
    stays bounded. precision="highest": the TPU default would round the
    VALUE operand to bf16 (the 0/1 one-hot is bf16-exact either way)."""
    nt = vals.shape[0]

    def red(v, s):
        onehot = (
            s[..., None] == jnp.arange(prt, dtype=jnp.int32)[None, None, :]
        ).astype(v.dtype)
        return jnp.einsum("ngc,ngp->npc", v, onehot, precision="highest")

    if nt <= chunk:
        return red(vals, slot)
    nc = nt // chunk
    out = jax.lax.map(
        lambda args: red(*args),
        (
            vals.reshape(nc, chunk, *vals.shape[1:]),
            slot.reshape(nc, chunk, slot.shape[1]),
        ),
    )
    return out.reshape(nt, prt, vals.shape[-1])


def scatter_matrix_tiered(plan: TieredPlan, upd: jnp.ndarray) -> "FSTieredMatrix":
    """(ne*16, 18) packed element updates -> tiered ELL field-split matrix.
    One wide (e, a)-row gather + one-hot slot reduction per tier; zero
    scatter ops."""
    upd4 = upd.reshape(-1, 4 * upd.shape[1])  # (ne*4, 72)
    mats = []
    for tp in plan.tiers:
        rows = take_rows(upd4, tp.gidx, fill=True)  # (nt, pad, 72)
        nt, pad = tp.gidx.shape
        vals = rows.reshape(nt, pad * 4, upd.shape[1])
        data = _slot_reduce(
            vals, tp.slot.reshape(nt, pad * 4), tp.prt, tp.chunk
        )
        mats.append(
            FSBSRMatrix(data=data, ell_col=tp.ell_col, diag_slot=tp.diag_slot)
        )
    return FSTieredMatrix(
        tiers=tuple(mats),
        nodes=tuple(tp.nodes for tp in plan.tiers),
        trank=plan.trank,
    )


def scatter_residual_tiered(plan: TieredPlan, elem_f: jnp.ndarray) -> jnp.ndarray:
    """(ne, 4, 6) element residuals -> (N, 6) nodal sums via per-tier
    grouped gathers (no scatter/segment ops)."""
    ne4 = elem_f.shape[0] * 4
    flat = elem_f.reshape(ne4, -1)
    outs = []
    for tp in plan.tiers:
        rows = take_rows(flat, tp.gidx, fill=True)  # (nt, pad, 6)
        outs.append(rows.sum(axis=1))
    return take_rows(jnp.concatenate(outs, axis=0), plan.trank)


# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclass
class FSTieredMatrix:
    """Field-split matrix stored as degree-tiered ELL blocks (rows in
    tier order; columns natural). Downstream contract matches FSBSRMatrix
    (sparse.fsbsr): matvec/matvec_up/pu/pp, diagonal extraction, row
    masking - each delegating per tier and re-ranking rows with one wide
    gather."""

    tiers: tuple  # tuple[FSBSRMatrix, ...]
    nodes: tuple  # tuple[(nt,) natural node ids; pad rows carry id 0]
    trank: jnp.ndarray  # (N,)

    @property
    def num_rows(self) -> int:
        return int(self.trank.shape[0])

    def _rank(self, parts) -> jnp.ndarray:
        return take_rows(jnp.concatenate(parts, axis=0), self.trank)

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        return self._rank([t.matvec(x) for t in self.tiers])

    def matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        return self._rank([t.matvec_up(p) for t in self.tiers])

    def matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        return self._rank([t.matvec_pu(u) for t in self.tiers])

    def matvec_pp(self, p: jnp.ndarray) -> jnp.ndarray:
        return self._rank([t.matvec_pp(p) for t in self.tiers])

    def _diag(self, comp: int) -> jnp.ndarray:
        return self._rank([t._diag(comp) for t in self.tiers])

    def diag_vel_blocks(self) -> jnp.ndarray:
        return self._rank([t.diag_vel_blocks() for t in self.tiers])

    def diag_p(self) -> jnp.ndarray:
        return self._rank([t.diag_p() for t in self.tiers])

    def add_ell_delta(self, delta: jnp.ndarray) -> "FSTieredMatrix":
        """Add a natural-order (N, PR, 18) ELL delta (e.g. the facet
        assembly, fem.face.scatter_face_matrix_packed). Pad rows (node id
        0) pick up row 0's delta - junk, but benign: no consumer ever
        selects a pad row (trank points only at real rows)."""
        out = []
        for t, nd in zip(self.tiers, self.nodes):
            d = take_rows(delta, nd)[:, : t.row_width, :]
            out.append(
                FSBSRMatrix(
                    data=t.data + d, ell_col=t.ell_col, diag_slot=t.diag_slot
                )
            )
        return FSTieredMatrix(tiers=tuple(out), nodes=self.nodes, trank=self.trank)

    def zero_rows(self, row_mask: jnp.ndarray, unit_diag: bool = True) -> "FSTieredMatrix":
        out = []
        for t, nd in zip(self.tiers, self.nodes):
            m = take_rows(row_mask, nd)
            out.append(t.zero_rows(m, unit_diag=unit_diag))
        return FSTieredMatrix(tiers=tuple(out), nodes=self.nodes, trank=self.trank)

    def to_block_dense(self) -> np.ndarray:
        """Debug/test helper: dense (N*6, N*6) (pad rows dropped)."""
        from dedflow_tpu.sparse.fsbsr import COMP_SLOTS

        n = self.num_rows
        dense = np.zeros((n * 6, n * 6))
        trank = np.asarray(self.trank)
        base = 0
        for t, nd in zip(self.tiers, self.nodes):
            nt = t.num_rows
            # a tier row is real iff trank maps its natural node id back
            # to this very position (pad rows alias node 0's id but not
            # its trank position)
            rows_nat = np.asarray(nd)
            sel = trank[rows_nat] == base + np.arange(nt)
            cols = np.asarray(t.ell_col)
            d = np.asarray(t.data)
            for comp, bi, bj in COMP_SLOTS:
                for p in range(t.row_width):
                    rr = rows_nat[sel]
                    cc = cols[sel, p]
                    np.add.at(
                        dense, (rr * 6 + bi, cc * 6 + bj), d[sel, p, comp]
                    )
            base += nt
        return dense
