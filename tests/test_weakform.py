"""Vectorized NS weak-form kernels vs the independent scalar oracle,
plus physics sanity properties."""

import jax.numpy as jnp
import numpy as np

import reference_impl as ref
from dedflow_tpu.config import Physics, TimeScheme
from dedflow_tpu.fem.assembly import build_context
from dedflow_tpu.fem.face import (
    build_face_context,
    face_lhs_elements,
    face_residual_elements,
)
from dedflow_tpu.fem.weakform import (
    gather_fields,
    ns_lhs_elements,
    ns_residual_elements,
)
from dedflow_tpu.mesh import box_mesh
from dedflow_tpu.sparse.topology import build_sparsity

PHYS = Physics()
SCHEME = TimeScheme()


def _random_states(mesh, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    wa = rng.normal(size=(mesh.num_node, 6)) * scale
    dwa = rng.normal(size=(mesh.num_node, 6)) * scale
    return wa, dwa


def test_ns_residual_matches_scalar_oracle():
    mesh = box_mesh(2, 2, 1, lengths=(1.0, 0.8, 1.3))
    ctx = build_context(mesh)
    wa, dwa = _random_states(mesh, 0)
    ef = gather_fields(ctx.ien, jnp.asarray(wa), jnp.asarray(dwa))
    f = np.asarray(ns_residual_elements(ctx, ef, PHYS, SCHEME))
    for e in [0, 3, mesh.num_tet - 1]:
        nodes = mesh.ien[e]
        f_ref = ref.ns_residual_element(
            mesh.xg[nodes],
            wa[nodes, :3],
            dwa[nodes, 3],
            wa[nodes, 4],
            wa[nodes, 5],
            dwa[nodes, :3],
            dwa[nodes, 4],
            dwa[nodes, 5],
            PHYS.rho,
            PHYS.mu,
            PHYS.cp,
            PHYS.kappa,
            SCHEME.dt,
            np.asarray(PHYS.body_force),
        )
        assert np.allclose(f[e], f_ref, rtol=1e-11, atol=1e-9), e


def test_ns_lhs_matches_scalar_oracle():
    mesh = box_mesh(2, 1, 2, lengths=(0.9, 1.0, 1.1))
    ctx = build_context(mesh)
    wa, dwa = _random_states(mesh, 1)
    ef = gather_fields(ctx.ien, jnp.asarray(wa), jnp.asarray(dwa))
    j = np.asarray(ns_lhs_elements(ctx, ef, PHYS, SCHEME))
    for e in [0, 5, mesh.num_tet - 1]:
        nodes = mesh.ien[e]
        j_ref = ref.ns_lhs_element(
            mesh.xg[nodes],
            wa[nodes, :3],
            PHYS.rho,
            PHYS.mu,
            SCHEME.dt,
            SCHEME.fact_dw,
            SCHEME.fact_w,
        )
        assert np.allclose(j[e], j_ref, rtol=1e-10, atol=1e-8), e


def test_face_kernels_match_scalar_oracle():
    mesh = box_mesh(2, 2, 2, lengths=(1.1, 0.9, 1.2))
    sp = build_sparsity(mesh.ien, mesh.num_node)
    ctx = build_context(mesh, sp)
    wa, dwa = _random_states(mesh, 2)
    for bidx in (1, 4):
        fctx = build_face_context(mesh, ctx, sp, bidx)
        b = mesh.boundaries[bidx]
        f = np.asarray(
            face_residual_elements(fctx, jnp.asarray(wa), jnp.asarray(dwa), PHYS)
        )
        j = np.asarray(
            face_lhs_elements(fctx, jnp.asarray(wa), jnp.asarray(dwa), PHYS, SCHEME)
        )
        for k in [0, b.num_facet // 2, b.num_facet - 1]:
            e = b.f2e[k]
            nodes = mesh.ien[e]
            f_ref = ref.face_residual_element(
                mesh.xg[nodes], int(b.forn[k]), wa[nodes, :3], dwa[nodes, 3],
                PHYS.rho, PHYS.mu,
            )
            assert np.allclose(f[k], f_ref, rtol=1e-11, atol=1e-9), (bidx, k)
            j_ref = ref.face_lhs_element(
                mesh.xg[nodes], int(b.forn[k]), wa[nodes, :3],
                PHYS.rho, PHYS.mu, SCHEME.fact_w,
            )
            assert np.allclose(j[k], j_ref, rtol=1e-10, atol=1e-8), (bidx, k)


def test_residual_vanishes_for_constant_rest_state():
    """u=const=0, p=0, phi/T const, rates zero -> all residual rows zero."""
    mesh = box_mesh(2, 2, 2)
    ctx = build_context(mesh)
    wa = np.zeros((mesh.num_node, 6))
    wa[:, 4] = 2.5
    wa[:, 5] = -1.0
    dwa = np.zeros((mesh.num_node, 6))
    ef = gather_fields(ctx.ien, jnp.asarray(wa), jnp.asarray(dwa))
    f = np.asarray(ns_residual_elements(ctx, ef, PHYS, SCHEME))
    assert np.allclose(f, 0.0, atol=1e-12)


def test_residual_uniform_flow_volume_terms_vanish():
    """Uniform u=(1,0,0), no gradients: volume residual zero (momentum is
    Galerkin-consistent for constant states)."""
    mesh = box_mesh(2, 2, 2)
    ctx = build_context(mesh)
    wa = np.zeros((mesh.num_node, 6))
    wa[:, 0] = 1.0
    dwa = np.zeros((mesh.num_node, 6))
    ef = gather_fields(ctx.ien, jnp.asarray(wa), jnp.asarray(dwa))
    f = np.asarray(ns_residual_elements(ctx, ef, PHYS, SCHEME))
    assert np.allclose(f, 0.0, atol=1e-12)


def test_lhs_transposed_symmetry_structure():
    """phi/phi and T/T blocks are identity per element (frozen equations,
    assemble.cu:757-758, 995-1003)."""
    mesh = box_mesh(1, 1, 1)
    ctx = build_context(mesh)
    wa, dwa = _random_states(mesh, 3)
    ef = gather_fields(ctx.ien, jnp.asarray(wa), jnp.asarray(dwa))
    j = np.asarray(ns_lhs_elements(ctx, ef, PHYS, SCHEME))
    eye = np.eye(4)
    assert np.allclose(j[..., 4, 4], eye[None], atol=1e-14)
    assert np.allclose(j[..., 5, 5], eye[None], atol=1e-14)
    # no spurious couplings into phi/T columns
    assert np.allclose(j[..., 4, :4], 0.0)
    assert np.allclose(j[..., 5, :4], 0.0)
    assert np.allclose(j[..., :4, 4], 0.0)
    assert np.allclose(j[..., :4, 5], 0.0)
