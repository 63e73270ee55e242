"""Preconditioners as pytrees + pure functions.

Replaces the reference's PC vtable (pc.h:32-47, pc.c):
- PCNone (copy, pc.c:23-27)            -> identity_pc
- PCJacobi bs=1 (pointwise inverse)    -> JacobiPC
- PCJacobi bs>1 (cublasDgetrfBatched/
  getriBatched inverse of bs x bs diag
  blocks, pc.c:44-114)                 -> BlockJacobiPC with closed-form
                                          3x3 inverses (design delta 4)
- PCDecomposition (per-field-section
  child PCs, pc.c:116-158)             -> NSFieldSplitPC: one fused per-node
                                          apply over the (N, 6) state layout.

The reference's hard-coded decomposition (krylov.c:440-452) - block-Jacobi
3x3 on velocity, Jacobi on pressure, identity on phi and T - is
NSFieldSplitPC.from_bsr(J) here: all sections read from the single 6x6 BSR
diagonal instead of four submatrices.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from dedflow_tpu.fem.element import inv3x3
from dedflow_tpu.sparse.bsr import BSRMatrix


def identity_pc(x: jnp.ndarray) -> jnp.ndarray:
    return x


@jax.tree_util.register_dataclass
@dataclass
class JacobiPC:
    """Pointwise inverse-diagonal (reference PCJacobi bs=1, pc.c:58-60)."""

    inv_diag: jnp.ndarray  # same shape as the vectors it applies to

    @staticmethod
    def from_diag(diag: jnp.ndarray) -> "JacobiPC":
        return JacobiPC(inv_diag=1.0 / diag)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * self.inv_diag


@jax.tree_util.register_dataclass
@dataclass
class BlockJacobiPC:
    """Inverse of bs x bs diagonal blocks (reference PCJacobi bs>1)."""

    inv_blocks: jnp.ndarray  # (N, bs, bs)

    @staticmethod
    def from_blocks(blocks: jnp.ndarray) -> "BlockJacobiPC":
        if blocks.shape[-1] == 3:
            inv, _ = inv3x3(blocks)
        else:
            inv = jnp.linalg.inv(blocks)
        return BlockJacobiPC(inv_blocks=inv)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.einsum("nij,nj->ni", self.inv_blocks, x)


@jax.tree_util.register_dataclass
@dataclass
class NSFieldSplitPC:
    """The reference decomposition PC over (N, 6) vectors
    (krylov.c:440-452): y_vel = invD3 @ x_vel, y_p = x_p / d_p, plus
    Jacobi on phi/T - which degenerates to the reference's identity
    sections exactly when the phi/T blocks are the frozen identities."""

    inv_vel_blocks: jnp.ndarray  # (N, 3, 3)
    inv_p_diag: jnp.ndarray  # (N,)
    inv_phi_diag: jnp.ndarray  # (N,)
    inv_t_diag: jnp.ndarray  # (N,)

    @staticmethod
    def from_bsr(mat: BSRMatrix) -> "NSFieldSplitPC":
        d = mat.diag_blocks()  # (N, 6, 6)
        inv_vel, _ = inv3x3(d[:, :3, :3])
        return NSFieldSplitPC(
            inv_vel_blocks=inv_vel,
            inv_p_diag=1.0 / d[:, 3, 3],
            inv_phi_diag=1.0 / d[:, 4, 4],
            inv_t_diag=1.0 / d[:, 5, 5],
        )

    @staticmethod
    def from_matrix(mat) -> "NSFieldSplitPC":
        """Build from either the dense-block BSRMatrix or the packed
        component-major FSBSRMatrix (sparse.fsbsr)."""
        if hasattr(mat, "diag_vel_blocks"):
            from dedflow_tpu.sparse.fsbsr import PHIPHI, TT

            inv_vel, _ = inv3x3(mat.diag_vel_blocks())
            return NSFieldSplitPC(
                inv_vel_blocks=inv_vel,
                inv_p_diag=1.0 / mat.diag_p(),
                inv_phi_diag=1.0 / mat._diag(PHIPHI),
                inv_t_diag=1.0 / mat._diag(TT),
            )
        return NSFieldSplitPC.from_bsr(mat)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (N, 6) -> (N, 6)."""
        y_vel = jnp.einsum("nij,nj->ni", self.inv_vel_blocks, x[:, :3])
        y_p = x[:, 3] * self.inv_p_diag
        y_phi = x[:, 4] * self.inv_phi_diag
        y_t = x[:, 5] * self.inv_t_diag
        return jnp.concatenate(
            [y_vel, y_p[:, None], y_phi[:, None], y_t[:, None]], axis=1
        )
