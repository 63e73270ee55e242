"""Structured-lattice recovery (mesh.recover) on converted-style meshes.

The reference's production input is a gmsh box converted to the flat HDF5
schema - a structured lattice stored as an unstructured tet soup with
arbitrary node numbering (tools/mesh_convert.py; Mesh3DCreateH5,
Mesh.c:78). recover_lattice must find the structure, and the lattice fast
path on the recovered mesh must agree with the general gather path on the
original shuffled mesh.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns
from dedflow_tpu.fem.lattice import (
    assemble_jacobian_t,
    assemble_residual_t,
)
from dedflow_tpu.mesh.gen import box_mesh
from dedflow_tpu.mesh.mesh import Boundary, Mesh
from dedflow_tpu.mesh.recover import recover_lattice
from dedflow_tpu.solver.newton import NSSolver


def _shuffled(mesh: Mesh, seed=0, grade=False, mirror=False) -> Mesh:
    """Re-number nodes randomly, shuffle element order, rotate vertex
    order (even permutation) - the information a converter file carries."""
    rng = np.random.RandomState(seed)
    n = mesh.num_node
    rp = rng.permutation(n)  # old node id -> shuffled id
    xg = mesh.xg.copy()
    if grade:
        # non-uniform spacing: the lattice is topological, not metric
        xg = np.sign(xg) * np.abs(xg) ** 1.5 + 0.05 * xg
    if mirror:
        # x -> -x turns the Kuhn split into a different corner pattern
        xg = xg.copy()
        xg[:, 0] = xg[:, 0].max() - xg[:, 0]
    inv = np.argsort(rp)
    xg_s = xg[inv]
    ien_s = rp[mesh.ien]
    # vertex re-order: even rotation normally; odd swap when mirroring so
    # every tet stays positively oriented (as real converted meshes are)
    pv = [2, 1, 0, 3] if mirror else [1, 2, 0, 3]
    forn_map = np.array([pv.index(l) for l in range(4)])
    ien_s = ien_s[:, pv]
    eperm = rng.permutation(ien_s.shape[0])
    ien_s = ien_s[eperm]
    e_inv = np.argsort(eperm)
    bnds = [
        Boundary(
            nodes=np.sort(rp[b.nodes]),
            ien=rp[b.ien],
            f2e=e_inv[b.f2e],
            forn=forn_map[b.forn],
            )
        for b in mesh.boundaries
    ]
    m = Mesh(xg=xg_s, ien=ien_s, boundaries=bnds)
    m.validate()
    return m


@pytest.mark.parametrize("mirror", [False, True])
def test_recover_roundtrip(mirror):
    mesh = box_mesh(4, 3, 5)
    shuf = _shuffled(mesh, seed=1, mirror=mirror)
    rec = recover_lattice(shuf)
    assert rec is not None
    m2, perm = rec
    assert m2.lattice == (4, 3, 5)
    assert len(m2.lattice_tets) == 6
    # node permutation is a bijection and coordinates land on the grid
    assert np.unique(perm).size == shuf.num_node
    np.testing.assert_allclose(m2.xg, shuf.xg[np.argsort(perm)])
    m2.validate()


def test_recover_rejects_unstructured():
    mesh = box_mesh(3, 3, 3)
    # drop a node from the lattice: split one cell differently by
    # perturbing a coordinate off the grid
    m = Mesh(xg=mesh.xg.copy(), ien=mesh.ien.copy(), boundaries=[])
    m.xg[13, 0] += 0.013
    assert recover_lattice(m) is None


def test_recovered_assembly_matches_general():
    """Lattice assembly on the recovered mesh == general path on the
    shuffled original, related by the node permutation."""
    mesh = box_mesh(4, 3, 4)
    shuf = _shuffled(mesh, seed=2, grade=True, mirror=True)
    m2, perm = recover_lattice(shuf)
    cfg = reference_scenario_config()

    gen = NSSolver(shuf, dataclasses.replace(cfg, use_lattice="gather"))
    lat = NSSolver(m2, dataclasses.replace(cfg, use_lattice="on"))
    assert lat.lctx is not None

    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(shuf))
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    # same physical state in recovered order: new[perm[i]] = old[i]
    inv = np.argsort(perm)
    wa2, dwa2 = wa[inv], dwa[inv]

    f_gen = ns.assemble_residual(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time, True
    )
    f_lat = assemble_residual_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa2, dwa2, cfg.physics, cfg.time,
        True,
    )
    np.testing.assert_allclose(
        np.asarray(f_lat.T)[perm], np.asarray(f_gen), rtol=1e-9, atol=1e-12
    )

    j_gen = ns.assemble_jacobian(
        gen.ctx, gen.face_ctxs, gen.mask, wa, dwa, cfg.physics, cfg.time
    )
    j_lat = assemble_jacobian_t(
        lat.lctx, lat.face_ctxs, lat.mask, wa2, dwa2, cfg.physics, cfg.time
    )
    x = jnp.asarray(np.random.RandomState(0).randn(shuf.num_node, 6))
    y_gen = np.asarray(j_gen.matvec(x))
    y_lat = np.asarray(j_lat.matvec_t(x[inv].T).T)[perm]
    scale = np.abs(y_gen).max()
    np.testing.assert_allclose(
        y_lat / scale, y_gen / scale, rtol=1e-9, atol=1e-11
    )
