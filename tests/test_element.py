"""Element geometry and sparsity/BSR unit tests."""

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.fem import quadrature as quad
from dedflow_tpu.fem.element import face_normals, tet_geometry
from dedflow_tpu.mesh import box_mesh, single_tet_mesh
from dedflow_tpu.sparse.bsr import BSRMatrix, bsr_to_dense, bsr_zeros
from dedflow_tpu.sparse.topology import build_sparsity


def _geom(mesh):
    x = jnp.asarray(mesh.xg)[jnp.asarray(mesh.ien)]
    return tet_geometry(x)


def test_unit_tet_geometry():
    g = _geom(single_tet_mesh())
    assert np.allclose(g.det_j, 1.0)
    assert np.allclose(g.inv_j[0], np.eye(3))
    # grads: node0 = (-1,-1,-1), node i = e_{i-1}
    expect = np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    assert np.allclose(g.shgrad[0], expect)
    assert np.allclose(g.metric[0], np.eye(3))


def test_geometry_random_affine():
    """detJ = 6*vol; grads reproduce gradients of linear functions."""
    rng = np.random.default_rng(3)
    mesh = box_mesh(2, 2, 2, lengths=(1.3, 0.7, 2.1))
    g = _geom(mesh)
    assert np.allclose(np.asarray(g.det_j), 6.0 * mesh.tet_volumes)
    # A linear field f = a.x + b must have exact constant gradient a.
    a = rng.normal(size=3)
    f = mesh.xg @ a + 0.3
    fe = f[mesh.ien]  # (ne, 4)
    grad = np.einsum("ea,eai->ei", fe, np.asarray(g.shgrad))
    assert np.allclose(grad, a[None, :], atol=1e-12)


def test_quadrature_integrates_polynomials():
    """4-pt tet rule integrates quadratics exactly; weights sum to 1/6."""
    assert np.isclose(quad.GW.sum(), 1.0 / 6.0, atol=1e-12)
    # Partition of unity at every quadrature point.
    assert np.allclose(quad.SHL.sum(axis=1), 1.0)
    # Integrate x^2 over the unit tet via nodal quadratic interp is not exact
    # for P1 shape functions; instead check the rule integrates the
    # barycentric monomial N_1 (degree 1) exactly: int over ref tet = 1/24.
    val = (quad.GW * quad.SHL[:, 1]).sum()
    assert np.isclose(val, 1.0 / 24.0, atol=1e-12)
    # Degree-2: int N_1^2 = V/10 * ... known: int li^2 = V/10 with V=1/6.
    val2 = (quad.GW * quad.SHL[:, 1] ** 2).sum()
    assert np.isclose(val2, (1.0 / 6.0) / 10.0, atol=1e-12)
    # Cross term: int l1*l2 = V/20.
    val3 = (quad.GW * quad.SHL[:, 1] * quad.SHL[:, 2]).sum()
    assert np.isclose(val3, (1.0 / 6.0) / 20.0, atol=1e-12)


def test_facet_rule_and_normals():
    """Facet weights/normals integrate facet areas exactly on the unit tet."""
    mesh = single_tet_mesh()
    g = _geom(mesh)
    for forn, area in [(0, np.sqrt(3) / 2), (1, 0.5), (2, 0.5), (3, 0.5)]:
        nv = face_normals(g.inv_j, g.det_j, jnp.asarray([forn]))
        a = quad.GWB.sum() * np.linalg.norm(np.asarray(nv[0]))
        assert np.isclose(a, area, atol=1e-12), (forn, a, area)
    # Outward orientation: face 3 (z=0) must have normal -z.
    nv = np.asarray(face_normals(g.inv_j, g.det_j, jnp.asarray([3])))[0]
    assert nv[2] < 0 and np.allclose(nv[:2], 0.0)
    # shlub partition of unity
    assert np.allclose(quad.SHLB.sum(axis=2), 1.0)


def test_sparsity_and_bsr_spmv():
    mesh = box_mesh(2, 2, 2)
    sp = build_sparsity(mesh.ien, mesh.num_node)
    # Symmetric pattern, full diagonal.
    assert sp.nnz > mesh.num_node
    assert (np.asarray(sp.col_ind)[sp.diag_idx] == np.arange(mesh.num_node)).all()
    # elem_nnz correctness: col_ind[elem_nnz[e,a,b]] == ien[e,b] and row == ien[e,a]
    rows = sp.row_ids[sp.elem_nnz]
    cols = sp.col_ind[sp.elem_nnz]
    assert (rows == mesh.ien[:, :, None]).all()
    assert (cols == mesh.ien[:, None, :]).all()

    rng = np.random.default_rng(5)
    mat = bsr_zeros(sp, 2, 2, jnp.float64)
    data = rng.normal(size=(sp.nnz, 2, 2))
    mat = BSRMatrix(
        data=jnp.asarray(data),
        col_ind=mat.col_ind,
        row_ids=mat.row_ids,
        diag_idx=mat.diag_idx,
    )
    x = rng.normal(size=(mesh.num_node, 2))
    y = np.asarray(mat.matvec(jnp.asarray(x)))
    dense = bsr_to_dense(mat)
    y_ref = (dense @ x.ravel()).reshape(-1, 2)
    assert np.allclose(y, y_ref, atol=1e-12)


def test_bsr_zero_rows():
    mesh = box_mesh(2, 1, 1)
    sp = build_sparsity(mesh.ien, mesh.num_node)
    rng = np.random.default_rng(7)
    mat = bsr_zeros(sp, 3, 3, jnp.float64)
    mat = BSRMatrix(
        data=jnp.asarray(rng.normal(size=(sp.nnz, 3, 3))),
        col_ind=mat.col_ind,
        row_ids=mat.row_ids,
        diag_idx=mat.diag_idx,
    )
    mask = np.zeros((mesh.num_node, 3), dtype=bool)
    mask[2, 1] = True
    mask[0, 0] = True
    out = mat.zero_rows(jnp.asarray(mask))
    dense = bsr_to_dense(out)
    r1 = 2 * 3 + 1
    r2 = 0
    for r in (r1, r2):
        expect = np.zeros(dense.shape[1])
        expect[r] = 1.0
        assert np.allclose(dense[r], expect)
    # Unconstrained rows untouched.
    orig = bsr_to_dense(mat)
    keep = np.ones(dense.shape[0], dtype=bool)
    keep[[r1, r2]] = False
    assert np.allclose(dense[keep], orig[keep])
