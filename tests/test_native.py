"""Native (C++) topology/partition fast paths == NumPy oracles."""

import numpy as np
import pytest

from dedflow_tpu import native
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.parallel.partition import rcb_parts
from dedflow_tpu.sparse.topology import build_sparsity, scatter_permutation


@pytest.fixture(scope="module")
def built():
    if native.load() is None:
        pytest.skip("native library unavailable (no compiler)")
    return True


def test_native_topology_matches_numpy(built):
    mesh = box_mesh(4, 3, 5)
    a = build_sparsity(mesh.ien, mesh.num_node, native=True)
    b = build_sparsity(mesh.ien, mesh.num_node, native=False)
    np.testing.assert_array_equal(a.row_ptr, b.row_ptr)
    np.testing.assert_array_equal(a.col_ind, b.col_ind)
    np.testing.assert_array_equal(a.row_ids, b.row_ids)
    np.testing.assert_array_equal(a.elem_nnz, b.elem_nnz)
    np.testing.assert_array_equal(a.diag_idx, b.diag_idx)


def test_native_mat_perm_matches_numpy(built):
    mesh = box_mesh(3, 3, 3)
    sp = build_sparsity(mesh.ien, mesh.num_node, native=False)
    out = native.topology(mesh.ien, mesh.num_node)
    assert out is not None
    _, _, elem_nnz, mat_perm, node_perm = out
    ref_perm, _ = scatter_permutation(sp.elem_nnz.reshape(-1, 16))
    np.testing.assert_array_equal(mat_perm, ref_perm)
    ref_node = np.argsort(np.asarray(mesh.ien).ravel(), kind="stable")
    np.testing.assert_array_equal(node_perm, ref_node)


def test_native_rcb_matches_numpy(built):
    rng = np.random.default_rng(0)
    xg = rng.normal(size=(500, 3))
    for p in (2, 4, 6, 8):
        a = native.rcb(xg, p)
        counts = np.bincount(a, minlength=p)
        assert counts.min() >= 500 // p - 1
        # same part sizes as the python RCB (identical median-split logic)
        b_counts = np.bincount(rcb_parts(xg, p, native=False), minlength=p)
        np.testing.assert_array_equal(np.sort(counts), np.sort(b_counts))
