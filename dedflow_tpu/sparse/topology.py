"""Nodal sparsity pattern and element->nnz scatter maps (host side).

Replaces the reference's host hashmap CSR construction (csr.c:81-190, with
its 64-neighbor cap and binary-search inserts) and the GPU block-pattern
expansion (CSRAttrCreateBlock, csr.c:193-218): on TPU a single *nodal*
pattern is kept and the Jacobian is stored as one BSR matrix of 6x6 blocks
(SURVEY.md section 7, design deltas 2-3). The expensive part of assembly -
finding where each element 4x4-block-pair lands in the global matrix - is
precomputed here once as a dense (ne, 4, 4) int32 map, replacing the
reference's per-entry linear column search at scatter time
(matrix_impl.cu:103-107).

A C++ fast path for very large meshes lives in native/ (same outputs);
this NumPy version is the oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from dedflow_tpu.utils.dtypes import INDEX_DTYPE


@dataclass(frozen=True)
class Sparsity:
    """CSR-structured nodal sparsity plus assembly scatter maps."""

    num_node: int
    row_ptr: np.ndarray  # (N+1,) int
    col_ind: np.ndarray  # (nnz,) int, sorted within each row
    row_ids: np.ndarray  # (nnz,) int: row of each nnz (sorted, for segment_sum)
    elem_nnz: np.ndarray  # (ne, 4, 4) int: nnz index of pair (ien[e,a], ien[e,b])
    diag_idx: np.ndarray  # (N,) int: nnz index of the diagonal entry of each row

    @property
    def nnz(self) -> int:
        return int(self.col_ind.shape[0])

    @property
    def max_row(self) -> int:
        """Max nonzeros in any row (the ELL width)."""
        return int(np.diff(self.row_ptr).max())

    def ell_tables(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """ELL-padded row layout (SURVEY.md section 7, design delta 3).

        Returns (ell_col (N, PR), nnz_to_ell (nnz,), ell_valid (N, PR)):
        slot (r, p) holds the p-th nonzero of row r; padding slots point
        at the row itself (so gathers stay in range) and are flagged
        invalid. `nnz_to_ell` relabels CSR positions to r*PR + p - it is
        strictly increasing, so sorted-by-CSR scatter plans stay sorted.
        """
        n, pr = self.num_node, self.max_row
        lens = np.diff(self.row_ptr)
        ell_col = np.repeat(np.arange(n, dtype=np.int64), pr).reshape(n, pr)
        slots = np.arange(pr)[None, :]
        valid = slots < lens[:, None]
        pos = self.row_ptr[:-1, None] + slots
        ell_col[valid] = self.col_ind[pos[valid]]
        nnz_to_ell = (
            np.repeat(np.arange(n, dtype=np.int64) * pr, lens)
            + (np.arange(self.nnz) - np.repeat(self.row_ptr[:-1], lens))
        )
        return (
            ell_col.astype(INDEX_DTYPE),
            nnz_to_ell.astype(np.int64),
            valid,
        )


def build_sparsity(
    ien: np.ndarray,
    num_node: int,
    native: bool = True,
    extra_ien: list | None = None,
) -> Sparsity:
    """Build the nodal sparsity of the tet mesh and the element scatter map.

    The flat key (row * N + col) of the unique node pairs, sorted ascending,
    *is* the CSR ordering, so the per-element nnz indices are a single
    searchsorted - no hashmaps (csr.c) and no per-scatter linear col search
    (matrix_impl.cu:103-107).

    `extra_ien` is a list of mixed-cell connectivity tables ((nc, 6)
    prisms, (nc, 8) hexes): their node-pair stencils enter the sparsity
    exactly as in the reference (csr.c:107-130) even though, also like the
    reference, only tets are assembled over. Their pairs get no entries in
    `elem_nnz` (which is the tet scatter map).

    With `native` (default), the C++ fast path (native/topology.cpp) does
    the key sort; this NumPy body is the oracle and fallback.
    """
    if extra_ien:
        native = False  # mixed stencils take the NumPy path
    if native:
        from dedflow_tpu import native as _native

        out = _native.topology(ien, num_node)
        if out is not None:
            row_ptr, col_ind, elem_nnz, _, _ = out
            n = int(num_node)
            lens = np.diff(row_ptr)
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            # diagonal position: search the globally sorted keys
            keys = row_ids * n + col_ind
            diag_idx = np.searchsorted(keys, np.arange(n) * (n + 1))
            assert (keys[diag_idx] == np.arange(n) * (n + 1)).all()
            return Sparsity(
                num_node=n,
                row_ptr=row_ptr.astype(INDEX_DTYPE),
                col_ind=col_ind.astype(INDEX_DTYPE),
                row_ids=row_ids.astype(INDEX_DTYPE),
                elem_nnz=elem_nnz.astype(INDEX_DTYPE),
                diag_idx=diag_idx.astype(INDEX_DTYPE),
            )
    ien = np.asarray(ien, dtype=np.int64)
    ne = ien.shape[0]
    n = int(num_node)
    rows = np.repeat(ien, 4, axis=1)  # (ne, 16): a index slow
    cols = np.tile(ien, (1, 4))  # (ne, 16): b index fast
    keys = (rows * n + cols).ravel()
    # Every node keeps a diagonal entry even if no element references it
    # (isolated nodes exist as padding in partitioned meshes; their rows
    # become unit-diagonal Dirichlet rows).
    diag_keys = np.arange(n, dtype=np.int64) * (n + 1)
    all_keys = [keys, diag_keys]
    for tbl in extra_ien or ():
        t = np.asarray(tbl, dtype=np.int64)
        k = t.shape[1]
        r = np.repeat(t, k, axis=1)
        c = np.tile(t, (1, k))
        all_keys.append((r * n + c).ravel())
    uniq = np.unique(np.concatenate(all_keys))
    col_ind = (uniq % n).astype(INDEX_DTYPE)
    row_of = (uniq // n).astype(np.int64)
    counts = np.bincount(row_of, minlength=n)
    row_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=row_ptr[1:])
    elem_nnz = np.searchsorted(uniq, keys).reshape(ne, 4, 4).astype(INDEX_DTYPE)
    diag_keys = np.arange(n, dtype=np.int64) * (n + 1)
    diag_idx = np.searchsorted(uniq, diag_keys).astype(INDEX_DTYPE)
    assert (uniq[diag_idx] == diag_keys).all(), "missing diagonal entries"
    return Sparsity(
        num_node=n,
        row_ptr=row_ptr.astype(INDEX_DTYPE),
        col_ind=col_ind,
        row_ids=row_of.astype(INDEX_DTYPE),
        elem_nnz=elem_nnz,
        diag_idx=diag_idx,
    )


def scatter_permutation(elem_nnz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-scatter plan: permutation making the flat elem->nnz targets
    non-decreasing, enabling `segment_sum(..., indices_are_sorted=True)`
    instead of random-order scatter-add (SURVEY.md section 7, hard part 3).

    Returns (perm, sorted_targets), both (ne*16,) int32.
    """
    flat = np.asarray(elem_nnz, dtype=np.int64).ravel()
    perm = np.argsort(flat, kind="stable").astype(INDEX_DTYPE)
    return perm, flat[perm].astype(INDEX_DTYPE)
