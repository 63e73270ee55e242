"""Explicit-collectives SPMD kernels (shard_map + psum/all_gather).

parallel.sharded drives multi-chip execution through GSPMD (sharding
propagation chooses the collectives). This module is the explicit
counterpart for the distributed-Krylov core (SURVEY.md section 7, M5):
hand-written `shard_map` kernels where the communication is visible -
`all_gather` for the SpMV halo and `psum` for the Krylov reductions -
so the collective schedule can be controlled and profiled directly.

The mesh axes follow parallel.partition: nodes/rows are RCB-reordered
into equal contiguous subdomain blocks, so shard d owns rows
[d*N/P, (d+1)*N/P).

Two SpMV variants:
- `dia_matvec_ppermute`: the banded (lattice / natural-ordered) matrix in
  component-major DIA storage. The column stencil is bounded by dmax =
  max|offset|, so the halo is EXACTLY the two dmax-wide boundary bands of
  the ring neighbors: two `ppermute`s of (6, dmax) each (~78 KB at 1M
  nodes) instead of gathering the (6, N) vector. This is the textbook
  halo exchange, TPU-native (ICI neighbor hops), and the HLO provably
  contains no all-gather (tests/test_sharding.py).
- `fsbsr_matvec_halo`: the general unstructured ELL matrix with an
  EXPLICIT boundary-band exchange: the RCB partition makes off-part
  columns O(surface), so a static per-hop plan (build_halo_plan) sends
  only the referenced columns with thin ppermutes - no O(N) collective
  (HLO-asserted in tests/test_sharding.py).
- `fsbsr_matvec_shardmap`: the conservative all_gather fallback for
  matrices whose partition is unknown.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import PartitionSpec as P

from dedflow_tpu.sparse.fsbsr import PHIPHI, PP, PU, TT, UP, UU


def fsbsr_matvec_shardmap(device_mesh: DeviceMesh, axis: str):
    """Returns matvec(data, ell_col, x) with explicit collectives:
    data/ell_col/x sharded on rows over `axis`, one all_gather for the
    column halo, local dense ELL multiply-reduce, output row-sharded."""

    def kernel(data, ell_col, x):
        # data (Nloc, PR, 18), ell_col (Nloc, PR) GLOBAL column ids,
        # x (Nloc, 6) -> y (Nloc, 6)
        x_full = jax.lax.all_gather(x, axis, tiled=True)  # (N, 6) halo
        xc = x_full[ell_col]  # (Nloc, PR, 6)
        c = lambda k: data[..., k]
        yu = [
            jnp.sum(
                c(UU(i, 0)) * xc[..., 0]
                + c(UU(i, 1)) * xc[..., 1]
                + c(UU(i, 2)) * xc[..., 2]
                + c(UP(i)) * xc[..., 3],
                axis=1,
            )
            for i in range(3)
        ]
        yp = jnp.sum(
            c(PU(0)) * xc[..., 0]
            + c(PU(1)) * xc[..., 1]
            + c(PU(2)) * xc[..., 2]
            + c(PP) * xc[..., 3],
            axis=1,
        )
        yphi = jnp.sum(c(PHIPHI) * xc[..., 4], axis=1)
        yt = jnp.sum(c(TT) * xc[..., 5], axis=1)
        return jnp.stack(yu + [yp, yphi, yt], axis=-1)

    spec = P(axis)
    return jax.shard_map(
        kernel,
        mesh=device_mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )


def build_halo_plan(ell_col, num_parts: int):
    """Static halo-exchange tables for a row-partitioned ELL matrix whose
    rows are contiguous equal blocks of L = N/P (the RCB layout,
    parallel.partition).

    For every hop s != 0 present in the sparsity (receiver d needs
    columns owned by part d+s), the plan records:
      - send_idx[s]: (P, H_s) LOCAL indices each part must send to its
        (d-s) neighbor (sorted, padded with 0 - padding values are never
        referenced);
      - the receiver's ell_col remapped into the extended local vector
        [own L rows | hop s1 buffer | hop s2 buffer | ...].
    The exchange is O(surface) per hop; hops with no referenced columns
    are dropped at build time, so a well-partitioned mesh does 2-6 thin
    ppermutes instead of an O(N) all_gather.
    """
    import numpy as np

    ell = np.asarray(ell_col, dtype=np.int64)
    n, pr = ell.shape
    assert n % num_parts == 0, "rows must be an exact multiple of parts"
    L = n // num_parts
    rows_part = np.repeat(np.arange(num_parts), L)[:, None]  # (N, 1)
    col_part = ell // L
    hop_of = col_part - rows_part  # (N, PR)
    hops = sorted(int(h) for h in np.unique(hop_of) if h != 0)

    # needed[d][s] = sorted unique off-part columns, per hop
    send_idx = {}
    needed_sorted = {}
    for s in hops:
        per_d = []
        for d in range(num_parts):
            sel = ell[d * L : (d + 1) * L][hop_of[d * L : (d + 1) * L] == s]
            per_d.append(np.unique(sel))
        h_s = max((v.size for v in per_d), default=0)
        if h_s == 0:
            continue
        needed_sorted[s] = per_d
        tbl = np.zeros((num_parts, h_s), dtype=np.int32)
        for d in range(num_parts):
            src = d + s  # owner of the needed columns
            if 0 <= src < num_parts:
                vals = per_d[d] - src * L  # sender-local indices
                tbl[src, : vals.size] = vals
        send_idx[s] = tbl
    hops = [s for s in hops if s in send_idx]

    # remap ell_col into the extended local vector
    ell_local = np.empty_like(ell, dtype=np.int32)
    offs, run = {}, L
    for s in hops:
        offs[s] = run
        run += send_idx[s].shape[1]
    for d in range(num_parts):
        blk = ell[d * L : (d + 1) * L]
        hb = hop_of[d * L : (d + 1) * L]
        out = (blk - d * L).astype(np.int64)
        for s in hops:
            m = hb == s
            if not m.any():
                continue
            pos = np.searchsorted(needed_sorted[s][d], blk[m])
            out[m] = offs[s] + pos
        ell_local[d * L : (d + 1) * L] = out.astype(np.int32)
    return hops, {s: jnp.asarray(send_idx[s]) for s in hops}, jnp.asarray(
        ell_local
    ), run


def fsbsr_matvec_halo(
    device_mesh: DeviceMesh, axis: str, ell_col, num_parts: int
):
    """Explicit boundary-band SpMV for the RCB-partitioned ELL matrix:
    O(surface) ppermutes per sparsity hop instead of the O(N) all_gather
    of fsbsr_matvec_shardmap. Returns matvec(data, x)."""
    hops, send_tbl, ell_local, _ = build_halo_plan(ell_col, num_parts)
    spec = P(axis)

    def kernel(data, ell_loc, x, *tables):
        parts = [x]
        for s, tbl in zip(hops, tables):
            payload = x[tbl[0]]  # (H_s, 6) sender-local gather
            pairs = [
                (i, i - s)
                for i in range(num_parts)
                if 0 <= i - s < num_parts
            ]
            parts.append(jax.lax.ppermute(payload, axis, pairs))
        x_ext = jnp.concatenate(parts, axis=0)
        xc = x_ext[ell_loc]  # (Nloc, PR, 6)
        c = lambda k: data[..., k]
        yu = [
            jnp.sum(
                c(UU(i, 0)) * xc[..., 0]
                + c(UU(i, 1)) * xc[..., 1]
                + c(UU(i, 2)) * xc[..., 2]
                + c(UP(i)) * xc[..., 3],
                axis=1,
            )
            for i in range(3)
        ]
        yp = jnp.sum(
            c(PU(0)) * xc[..., 0]
            + c(PU(1)) * xc[..., 1]
            + c(PU(2)) * xc[..., 2]
            + c(PP) * xc[..., 3],
            axis=1,
        )
        yphi = jnp.sum(c(PHIPHI) * xc[..., 4], axis=1)
        yt = jnp.sum(c(TT) * xc[..., 5], axis=1)
        return jnp.stack(yu + [yp, yphi, yt], axis=-1)

    inner = jax.shard_map(
        kernel,
        mesh=device_mesh,
        in_specs=(spec, spec, spec) + tuple(P(axis, None) for _ in hops),
        out_specs=spec,
        check_vma=False,
    )

    def matvec(data, x):
        return inner(
            data, ell_local, x, *(send_tbl[s] for s in hops)
        )

    return matvec


def dot_shardmap(device_mesh: DeviceMesh, axis: str):
    """Distributed dot product: local partial + explicit psum (the
    distributed-Krylov reduction; reference analogue: cublasDdot on one
    GPU, krylov.c:163-186)."""

    def kernel(a, b):
        return jax.lax.psum(jnp.vdot(a.reshape(-1), b.reshape(-1)), axis)

    spec = P(axis)
    return jax.shard_map(
        kernel, mesh=device_mesh, in_specs=(spec, spec), out_specs=P()
    )


def norm_shardmap(device_mesh: DeviceMesh, axis: str):
    """Distributed 2-norm via psum of local squared sums."""

    def kernel(a):
        return jnp.sqrt(
            jax.lax.psum(jnp.sum(a.reshape(-1) ** 2), axis)
        )

    return jax.shard_map(
        kernel, mesh=device_mesh, in_specs=(P(axis),), out_specs=P()
    )


def dia_matvec_ppermute(device_mesh: DeviceMesh, axis: str, offsets: tuple):
    """Returns matvec(data_t, scal_t, x_t) for the component-major DIA
    matrix (sparse.fsbsr.FSDIAMatrixT layout) with data (D, 16, N),
    scal (2*D, N) and x (6, N) all sharded on the node axis over `axis`,
    using ppermute boundary bands as the ONLY communication.

    Requires the banded structure of contiguous-ordered meshes:
    max|offset| <= local rows per shard. Ring wrap contributions are
    masked to zero (the matrix has no wrap-around couplings)."""
    from dedflow_tpu.sparse.fsbsr import PP, PU, UP, UU

    nparts = int(device_mesh.devices.size)
    dmax = max(max(abs(o) for o in offsets), 1)

    def kernel(data_l, scal_l, x_l):
        # data_l (D, 16, L), scal_l (2D, L), x_l (6, L) local rows
        l = x_l.shape[1]
        if dmax > l:
            raise ValueError(
                f"dia_matvec_ppermute requires max|offset| ({dmax}) <= "
                f"local rows per shard ({l}): the 2-ppermute halo only "
                "covers the immediate ring neighbors. Use fewer shards "
                "or the all-gather fallback (fsbsr_matvec_shardmap)."
            )
        idx = jax.lax.axis_index(axis)
        # halo from the LEFT neighbor (its last dmax rows) ...
        from_left = jax.lax.ppermute(
            x_l[:, l - dmax :], axis,
            [(i, (i + 1) % nparts) for i in range(nparts)],
        )
        # ... and from the RIGHT neighbor (its first dmax rows)
        from_right = jax.lax.ppermute(
            x_l[:, :dmax], axis,
            [(i, (i - 1) % nparts) for i in range(nparts)],
        )
        zero = jnp.zeros_like(from_left)
        from_left = jnp.where(idx == 0, zero, from_left)
        from_right = jnp.where(idx == nparts - 1, zero, from_right)
        xpad = jnp.concatenate([from_left, x_l, from_right], axis=1)
        d = data_l
        xs = jnp.stack(
            [
                jax.lax.slice_in_dim(xpad, dmax + o, dmax + o + l, axis=1)
                for o in offsets
            ]
        )  # (D, 6, L)
        y = [
            jnp.sum(
                d[:, UU(i, 0)] * xs[:, 0]
                + d[:, UU(i, 1)] * xs[:, 1]
                + d[:, UU(i, 2)] * xs[:, 2]
                + d[:, UP(i)] * xs[:, 3],
                axis=0,
            )
            for i in range(3)
        ]
        y.append(
            jnp.sum(
                d[:, PU(0)] * xs[:, 0]
                + d[:, PU(1)] * xs[:, 1]
                + d[:, PU(2)] * xs[:, 2]
                + d[:, PP] * xs[:, 3],
                axis=0,
            )
        )
        # constructors store scal sublane-padded (fsbsr.pad_scal_rows):
        # narrow to the logical 2*D rows before the plane reshape
        sc = scal_l[: 2 * len(offsets)].reshape(len(offsets), 2, l)
        y.append(jnp.sum(sc[:, 0] * xs[:, 4], axis=0))
        y.append(jnp.sum(sc[:, 1] * xs[:, 5], axis=0))
        return jnp.stack(y)

    return jax.shard_map(
        kernel,
        mesh=device_mesh,
        in_specs=(P(None, None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
    )
