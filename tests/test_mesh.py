"""Mesh generation, boundary tables, and HDF5 round-trip."""

import numpy as np
import pytest

from dedflow_tpu.io.h5 import (
    read_mesh_h5,
    read_solution_h5,
    reference_flat_to_state,
    state_to_reference_flat,
    write_mesh_h5,
    write_solution_h5,
)
from dedflow_tpu.mesh import box_mesh, single_tet_mesh


def test_single_tet():
    m = single_tet_mesh()
    assert m.num_node == 4 and m.num_tet == 1
    assert np.allclose(m.tet_volumes, [1.0 / 6.0])


def test_box_mesh_counts_and_volume():
    m = box_mesh(3, 2, 2, lengths=(3.0, 2.0, 2.0))
    assert m.num_node == 4 * 3 * 3
    assert m.num_tet == 6 * 3 * 2 * 2
    # Kuhn tets are positively oriented and tile the box exactly.
    assert (m.tet_volumes > 0).all()
    assert np.isclose(m.tet_volumes.sum(), 12.0)


def test_box_mesh_boundaries():
    m = box_mesh(2, 2, 2)
    assert m.num_bound == 6
    m.validate()
    # Each side of a 2x2x2 box has 2*2*2 = 8 boundary triangles.
    for b in m.boundaries:
        assert b.num_facet == 8
        assert b.num_node == 9
    # x- boundary nodes all have x == 0.
    assert np.allclose(m.xg[m.boundaries[0].nodes][:, 0], 0.0)
    assert np.allclose(m.xg[m.boundaries[5].nodes][:, 2], 1.0)
    # total boundary facets = surface triangles: 6 sides * 8
    total = sum(b.num_facet for b in m.boundaries)
    assert total == 48


def test_mesh_h5_roundtrip(tmp_path):
    m = box_mesh(2, 3, 2)
    path = str(tmp_path / "mesh.h5")
    write_mesh_h5(path, m)
    m2 = read_mesh_h5(path)
    assert np.allclose(m.xg, m2.xg)
    assert (m.ien == m2.ien).all()
    assert m2.num_bound == 6
    for b1, b2 in zip(m.boundaries, m2.boundaries):
        assert (b1.nodes == b2.nodes).all()
        assert (b1.ien == b2.ien).all()
        assert (b1.f2e == b2.f2e).all()
        assert (b1.forn == b2.forn).all()
    m2.validate()


def test_state_layout_roundtrip():
    rng = np.random.default_rng(0)
    state = rng.normal(size=(11, 6))
    flat = state_to_reference_flat(state)
    # velocity interleaved first (SURVEY.md 3.5)
    assert np.allclose(flat[:3], state[0, :3])
    assert np.allclose(flat[3 * 11 : 3 * 11 + 3], state[:3, 3])
    back = reference_flat_to_state(flat)
    assert np.allclose(back, state)


def test_solution_h5_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    wg = rng.normal(size=(7, 6))
    dwg = rng.normal(size=(7, 6))
    path = str(tmp_path / "sol.10.h5")
    write_solution_h5(path, wg, dwg, step=10, time=0.5)
    out = read_solution_h5(path)
    # wg round-trips u/phi/T; p column is not stored in wg (reference parity:
    # pressure lives in the dwg slot, main.c:584).
    assert np.allclose(out["wg"][:, :3], wg[:, :3])
    assert np.allclose(out["wg"][:, 4:], wg[:, 4:])
    assert np.allclose(out["dwg"], dwg)
    assert out["step"] == 10 and out["time"] == 0.5


def test_mixed_cell_mesh_roundtrip(tmp_path):
    """Prism/hex connectivity survives the HDF5 round trip and enters the
    sparsity stencil (reference parity: MeshData.h:27-29, csr.c:107-130;
    assembly stays tet-only like the reference's)."""
    from dedflow_tpu.io.h5 import read_mesh_h5, write_mesh_h5
    from dedflow_tpu.sparse.topology import build_sparsity

    mesh = box_mesh(2, 2, 2)
    n = mesh.num_node
    # a prism and a hex over existing nodes (stencil-only tables)
    mesh.ien_prism = np.array([[0, 1, 3, 9, 10, 12]], dtype=np.int32)
    mesh.ien_hex = np.array([[0, 1, 4, 3, 9, 10, 13, 12]], dtype=np.int32)
    path = str(tmp_path / "mixed.h5")
    write_mesh_h5(path, mesh)
    back = read_mesh_h5(path)
    np.testing.assert_array_equal(back.ien_prism, mesh.ien_prism)
    np.testing.assert_array_equal(back.ien_hex, mesh.ien_hex)
    back.validate()

    sp_tet = build_sparsity(mesh.ien, n)
    sp_mix = build_sparsity(mesh.ien, n, extra_ien=back.extra_cells)
    assert sp_mix.nnz > sp_tet.nnz
    # every prism pair is present in the mixed sparsity
    dense = np.zeros((n, n), dtype=bool)
    dense[sp_mix.row_ids, sp_mix.col_ind] = True
    pr = mesh.ien_prism[0]
    assert dense[np.repeat(pr, 6), np.tile(pr, 6)].all()
    hx = mesh.ien_hex[0]
    assert dense[np.repeat(hx, 8), np.tile(hx, 8)].all()
    # the tet scatter map is unaffected (still valid CSR positions)
    keys_mix = sp_mix.row_ids[sp_mix.elem_nnz.ravel()]
    np.testing.assert_array_equal(
        keys_mix.reshape(-1), np.repeat(mesh.ien, 4, axis=1).ravel()
    )
