"""Strong (Dirichlet) boundary conditions as boolean nodal masks.

Reference counterpart: `Dirichlet` (dirichlet.h:8-36, dirichlet.c) - a
per-boundary list of per-component BC_STRONG flags, applied by zeroing
residual rows (ApplyBCVecNodalKernel, dirichlet_impl.cu:16-21) and zeroing
matrix rows with unit diagonal (DirichletApplyMat -> MatrixZeroRow,
dirichlet.c:47-61).

Here the same information is a single (N, bs) boolean mask built
declaratively from (boundary index, components) specs - the declarative
form the reference lacks (its BCs are hard-coded in main.c:454-477;
SURVEY.md section 7, hard part 5). Application is a masked where /
BSRMatrix.zero_rows, race-free by construction.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.sparse.bsr import BSRMatrix


@dataclass(frozen=True)
class StrongBC:
    """One strong BC: zero the listed solution components on a boundary."""

    boundary: int
    components: tuple[int, ...]


def build_mask(mesh: Mesh, bcs: Sequence[StrongBC], bs: int) -> np.ndarray:
    """(N, bs) boolean mask; True = constrained (node, component)."""
    mask = np.zeros((mesh.num_node, bs), dtype=bool)
    for bc in bcs:
        nodes = mesh.boundaries[bc.boundary].nodes
        for c in bc.components:
            mask[nodes, c] = True
    return mask


def apply_vec(mask: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Zero constrained residual entries (dirichlet_impl.cu:16-21)."""
    return jnp.where(mask, jnp.zeros((), dtype=f.dtype), f)


def apply_mat(mask: jnp.ndarray, mat: BSRMatrix) -> BSRMatrix:
    """Zero constrained rows, unit diagonal (dirichlet.c:47-61)."""
    return mat.zero_rows(mask, unit_diag=True)
