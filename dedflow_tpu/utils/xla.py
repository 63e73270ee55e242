"""XLA-lowering helpers shared by the hot paths.

`take_rows` exists because of a measured TPU lowering cliff: a row gather
driven by a MULTI-dimensional index array (`x[ien]` with ien (ne, 4))
lowers to a gather that runs ~4x slower than the SAME gather with the
index flattened to 1-D (0.18 vs 0.74 G rows/s on v5e, 2M x 12f rows;
tools/gather_probe.py documents the wider sweep: throughput is flat in
row width 6..72 floats and in index sortedness, so the row COUNT and the
index RANK are the only levers). Every hot row gather in the framework
funnels through here so the flattening is applied (and documented) once.
"""

from __future__ import annotations

import jax.numpy as jnp


def take_rows(x: jnp.ndarray, idx: jnp.ndarray, fill: bool = False):
    """x[idx] for a (...,)-shaped integer index over axis 0 of x, lowered
    via a flat 1-D index. With fill=True, out-of-range indices (e.g. the
    padded slots of a grouped scatter plan) read as zero rows instead of
    clamping."""
    flat = idx.reshape(-1)
    if fill:
        out = jnp.take(x, flat, axis=0, mode="fill", fill_value=0)
    else:
        out = x[flat]
    return out.reshape(idx.shape + x.shape[1:])
