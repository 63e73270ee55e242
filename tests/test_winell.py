"""WinELL (sparse.winell) vs the FSBSR/dense oracles on a small
irregular (Delaunay) mesh. The Pallas matvec runs through the
interpreter on CPU (sparse.win_kernels.INTERPRET via the interpret
flag)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dedflow_tpu.mesh.gen import delaunay_mesh
from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh
from dedflow_tpu.sparse.topology import build_sparsity
from dedflow_tpu.sparse.winell import (
    build_winell_plan,
    plan_stats,
    winell_from_packed_updates,
    winell_matrix,
)


@pytest.fixture(scope="module")
def small_setup():
    mesh = delaunay_mesh(500, seed=3)
    mesh = reorder_mesh(mesh, rcm_order(np.asarray(mesh.ien), mesh.num_node))
    sp = build_sparsity(np.asarray(mesh.ien), mesh.num_node)
    plan = build_winell_plan(sp.row_ptr, sp.col_ind, mesh.num_node)
    rng = np.random.default_rng(0)
    upd = jnp.asarray(
        rng.normal(size=(mesh.num_tet * 16, 18)).astype(np.float32)
    )
    vals = winell_from_packed_updates(
        plan, np.asarray(sp.elem_nnz).reshape(-1, 16), upd
    )
    return mesh, sp, plan, upd, vals


def _oracle_dense(mesh, sp, upd):
    """Dense (N*6, N*6) from the packed updates via the FSBSR path."""
    from dedflow_tpu.fem.assembly import build_context, fsbsr_from_data, scatter_matrix_packed

    ctx = build_context(mesh, sp, dtype=jnp.float32)
    data = scatter_matrix_packed(ctx, upd, "segment")
    return fsbsr_from_data(ctx, data).to_block_dense()


def test_winell_matches_fsbsr_dense(small_setup):
    mesh, sp, plan, upd, vals = small_setup
    mat = winell_matrix(plan, vals, backend="xla")
    dense_win = mat.to_block_dense()
    dense_ref = _oracle_dense(mesh, sp, upd)
    np.testing.assert_allclose(dense_win, dense_ref, rtol=2e-5, atol=1e-5)


def test_winell_matvec_xla_oracle(small_setup):
    mesh, sp, plan, upd, vals = small_setup
    mat = winell_matrix(plan, vals, backend="xla")
    n = mesh.num_node
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    y = np.asarray(mat.matvec_t(x))
    dense = mat.to_block_dense()
    # dense uses interleaved (node*6+comp) layout
    xi = np.asarray(x).T.reshape(-1)
    yi = (dense @ xi).reshape(n, 6).T
    np.testing.assert_allclose(y, yi, rtol=2e-4, atol=2e-4)


def test_winell_matvec_pallas_interpret(small_setup):
    mesh, sp, plan, upd, vals = small_setup
    from dedflow_tpu.sparse.win_kernels import winell_matvec

    mat = winell_matrix(plan, vals, backend="xla")
    n = mesh.num_node
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(6, n)).astype(np.float32))
    y_ref = np.asarray(mat.matvec_t(x))
    y_pl = np.asarray(winell_matvec(mat, x, interpret=True))
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-4, atol=2e-4)


def test_winell_zero_rows_and_diag(small_setup):
    mesh, sp, plan, upd, vals = small_setup
    mat = winell_matrix(plan, vals, backend="xla")
    n = mesh.num_node
    rng = np.random.default_rng(3)
    mask = jnp.asarray(rng.random((6, n)) < 0.2)
    zm = mat.zero_rows_t(mask)
    dense = zm.to_block_dense()
    mask_np = np.asarray(mask)
    for comp in range(6):
        rows = np.nonzero(mask_np[comp])[0]
        for r in rows[:10]:
            rowv = dense[r * 6 + comp]
            assert rowv[r * 6 + comp] == pytest.approx(1.0)
            rowv = rowv.copy()
            rowv[r * 6 + comp] = 0.0
            assert np.abs(rowv).max() == 0.0
    # index rows must be untouched by the masking
    assert np.array_equal(
        np.asarray(zm.vals)[18:20], np.asarray(mat.vals)[18:20]
    )
    # diag extraction matches the dense diagonal blocks
    d18 = np.asarray(mat.diag_rows())
    dense0 = mat.to_block_dense()
    from dedflow_tpu.sparse.fsbsr import COMP_SLOTS

    for comp, bi, bj in COMP_SLOTS[:9]:
        got = d18[comp]
        want = dense0[np.arange(n) * 6 + bi, np.arange(n) * 6 + bj]
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_plan_stats_reasonable(small_setup):
    mesh, sp, plan, upd, vals = small_setup
    st = plan_stats(plan)
    assert st["pad_frac"] < 0.6  # tiny mesh: mostly one superpack
    # spans are bounded by the x-tile count
    assert st["span_max"] <= -(-plan.num_node // 128) + 1
