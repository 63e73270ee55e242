"""Explicit-collectives SPMD kernels (shard_map + psum/all_gather).

parallel.sharded drives multi-chip execution through GSPMD (sharding
propagation chooses the collectives). This module is the explicit
counterpart for the distributed-Krylov core (SURVEY.md section 7, M5):
hand-written `shard_map` kernels where the communication is visible -
`all_gather` for the SpMV halo and `psum` for the Krylov reductions -
so the collective schedule can be controlled and profiled directly.

The mesh axes follow parallel.partition: nodes/rows are RCB-reordered
into equal contiguous subdomain blocks, so shard d owns rows
[d*N/P, (d+1)*N/P). With spatial ordering the halo a shard actually
reads is a thin neighbor band; this v1 exchanges the full vector
(all_gather over ICI) - replacing it with ppermute'd boundary bands is
the planned refinement and changes only `_spmv_kernel`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

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
