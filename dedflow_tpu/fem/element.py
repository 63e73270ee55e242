"""Batched linear-tet element geometry (JAX).

TPU-native replacement for the reference's per-color-batch pipeline
GetElemJ3DKernel -> cublasDgetrfBatched -> GetElemDetJKernel ->
cublasDgetriBatched (assemble.cu:321-357, 1245-1291): the 3x3 inverse is
closed-form (adjugate / determinant), which is exact, cheaper than batched
LU, and vectorizes onto the VPU with no batched-pointer plumbing
(SURVEY.md section 7, design delta 4).

Conventions (matching the reference):
- J columns are edge vectors: J[:, c] = x_{c+1} - x_0 (assemble.cu:336-346),
  so x(xi) = x_0 + J @ xi.
- detJ is the *absolute* determinant (GetElemDetJKernel takes fabs of the
  LU diagonal product, assemble.cu:356).
- shape gradient of node a>0 is row a-1 of inv(J); node 0 is minus the sum
  (GetShapeGradKernel, assemble.cu:1308-1328).
- metric G = inv(J) @ inv(J)^T, exactly as the reference's
  DgemmStridedBatched computes it (assemble.cu:1586-1593). Note this is
  J^-1 J^-T (so u.G.u = |J^-T u|^2); the LHS kernel's tau instead uses
  |J^-1 u|^2 via shconv (assemble.cu:592-601) - both are reproduced
  faithfully where they are used.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dedflow_tpu.fem import quadrature as quad


class TetGeometry(NamedTuple):
    inv_j: jnp.ndarray  # (ne, 3, 3) inverse Jacobian (signed)
    det_j: jnp.ndarray  # (ne,) |det J|
    shgrad: jnp.ndarray  # (ne, 4, 3) physical shape gradients
    metric: jnp.ndarray  # (ne, 3, 3) G = inv(J) @ inv(J)^T


def tet_jacobian(x_elem: jnp.ndarray) -> jnp.ndarray:
    """x_elem (..., 4, 3) -> J (..., 3, 3) with columns = edge vectors."""
    edges = x_elem[..., 1:, :] - x_elem[..., :1, :]  # (..., 3, 3): row c = x_{c+1}-x_0
    return jnp.swapaxes(edges, -1, -2)


def inv3x3(j: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form inverse and signed determinant of (..., 3, 3)."""
    c0, c1, c2 = j[..., :, 0], j[..., :, 1], j[..., :, 2]
    r0 = jnp.cross(c1, c2)
    r1 = jnp.cross(c2, c0)
    r2 = jnp.cross(c0, c1)
    det = jnp.einsum("...i,...i->...", c0, r0)
    inv = jnp.stack([r0, r1, r2], axis=-2) / det[..., None, None]
    return inv, det


def tet_geometry(x_elem: jnp.ndarray) -> TetGeometry:
    """Batched geometry for element coordinate gathers x_elem (ne, 4, 3).

    Degenerate (zero-volume) elements - used as padding by the partitioned
    mesh layout (parallel.partition) - get zero inv_j/shgrad/metric and
    det_j = 0, so every one of their weak-form contributions vanishes.
    """
    j = tet_jacobian(x_elem)
    c0, c1, c2 = j[..., :, 0], j[..., :, 1], j[..., :, 2]
    r0 = jnp.cross(c1, c2)
    r1 = jnp.cross(c2, c0)
    r2 = jnp.cross(c0, c1)
    det = jnp.einsum("...i,...i->...", c0, r0)
    valid = det != 0.0
    safe_det = jnp.where(valid, det, 1.0)
    inv_j = (
        jnp.stack([r0, r1, r2], axis=-2)
        / safe_det[..., None, None]
        * valid[..., None, None]
    )
    det_j = jnp.abs(det)
    # grads[a] = row a-1 of inv(J) for a in 1..3; grads[0] = -sum of rows.
    g123 = inv_j  # (ne, 3, 3): row i = grad of node i+1
    g0 = -jnp.sum(g123, axis=-2, keepdims=True)
    shgrad = jnp.concatenate([g0, g123], axis=-2)  # (ne, 4, 3)
    metric = jnp.einsum("...ik,...jk->...ij", inv_j, inv_j)
    return TetGeometry(inv_j=inv_j, det_j=det_j, shgrad=shgrad, metric=metric)


def face_normals(
    inv_j: jnp.ndarray, det_j: jnp.ndarray, forn: jnp.ndarray
) -> jnp.ndarray:
    """Nanson-formula facet normals (not unit length).

    nv = detJ * J^-T @ n_ref[forn] (GetElemFaceNVKernel, assemble.cu:305-317).
    |nv| integrates to the physical facet area against the GWB weights.
    """
    nref = jnp.asarray(quad.REF_FACE_NORMALS, dtype=inv_j.dtype)[forn]  # (nf, 3)
    return det_j[:, None] * jnp.einsum("fkn,fk->fn", inv_j, nref)
