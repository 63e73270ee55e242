"""M1 end-to-end slice: heat/Poisson assembly, Dirichlet, Krylov solve.

Implements the reference's implied validation (SURVEY.md section 4):
single-tet golden checks, Jacobian-vs-finite-difference, and an
end-to-end manufactured solve.
"""

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.fem.assembly import build_context, scatter_matrix, scatter_residual
from dedflow_tpu.fem.dirichlet import StrongBC, apply_mat, apply_vec, build_mask
from dedflow_tpu.fem.heat import (
    assemble_heat,
    assemble_poisson,
    heat_element_jacobian,
    heat_element_residual,
)
from dedflow_tpu.mesh import box_mesh, single_tet_mesh
from dedflow_tpu.solver.krylov import cg, gmres
from dedflow_tpu.solver.pc import JacobiPC
from dedflow_tpu.sparse.bsr import bsr_to_dense

# generalized-alpha constants of the reference (main.c:23-27)
RHOC = 0.5
ALPHA_M = (3.0 - RHOC) / (1.0 + RHOC)
ALPHA_F = 1.0 / (1.0 + RHOC)
GAMMA = 0.5 + ALPHA_M - ALPHA_F
DT = 5e-2


def test_single_tet_heat_golden():
    """Golden values on the unit tet (analytically checkable)."""
    mesh = single_tet_mesh()
    ctx = build_context(mesh)
    # T = x (node values 0,1,0,0); dT = 1 everywhere.
    t = jnp.asarray([0.0, 1.0, 0.0, 0.0])
    dt = jnp.ones(4)
    f = np.asarray(heat_element_residual(ctx, t, dt))[0]
    # mass part: int N_a * 1 = V/4 = 1/24 each; diffusion: grad T = e_x,
    # contribution = V * gradNa_x = 1/6 * [-1, 1, 0, 0].
    expect = np.full(4, 1.0 / 24.0) + (1.0 / 6.0) * np.array([-1.0, 1.0, 0.0, 0.0])
    assert np.allclose(f, expect, atol=1e-14)

    ej = np.asarray(
        heat_element_jacobian(ctx, ALPHA_M, DT * ALPHA_F * GAMMA)
    )[0]
    # Mass matrix of the unit tet: V/20 * (1 + delta_ab) with V=1/6.
    mass = (1.0 / 6.0) / 20.0 * (np.ones((4, 4)) + np.eye(4))
    grads = np.array([[-1, -1, -1], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
    stiff = (1.0 / 6.0) * grads @ grads.T
    expect_j = ALPHA_M * mass + DT * ALPHA_F * GAMMA * stiff
    assert np.allclose(ej, expect_j, atol=1e-13)


def test_heat_jacobian_is_exact_derivative():
    """For the linear heat equation, J must equal the exact derivative of
    the residual under the generalized-alpha update (SURVEY.md 4b):
    T_alpha = T + dt*af*g*delta, dT_alpha = am*delta => R(delta) affine."""
    mesh = box_mesh(2, 2, 2)
    ctx = build_context(mesh)
    rng = np.random.default_rng(0)
    t0 = jnp.asarray(rng.normal(size=mesh.num_node))
    dt0 = jnp.asarray(rng.normal(size=mesh.num_node))
    f0, jmat = assemble_heat(ctx, t0, dt0, ALPHA_M, DT * ALPHA_F * GAMMA)
    delta = jnp.asarray(rng.normal(size=mesh.num_node))
    c1 = DT * ALPHA_F * GAMMA
    f1, _ = assemble_heat(
        ctx, t0 + c1 * delta, dt0 + ALPHA_M * delta, ALPHA_M, c1
    )
    jd = np.asarray(jmat.matvec(delta[:, None]))[:, 0]
    assert np.allclose(np.asarray(f1 - f0), jd, atol=1e-11)


def test_scatter_against_dense_reference():
    """Scatter plans agree with a naive dense assembly."""
    mesh = box_mesh(2, 1, 2)
    ctx = build_context(mesh)
    rng = np.random.default_rng(1)
    ef = rng.normal(size=(mesh.num_tet, 4))
    f = np.asarray(scatter_residual(ctx, jnp.asarray(ef)))
    f_ref = np.zeros(mesh.num_node)
    for e in range(mesh.num_tet):
        for a in range(4):
            f_ref[mesh.ien[e, a]] += ef[e, a]
    assert np.allclose(f, f_ref, atol=1e-13)

    ejm = rng.normal(size=(mesh.num_tet, 4, 4, 1, 1))
    from dedflow_tpu.fem.assembly import bsr_from_data

    mat = bsr_from_data(ctx, scatter_matrix(ctx, jnp.asarray(ejm)))
    dense = bsr_to_dense(mat)
    dense_ref = np.zeros((mesh.num_node, mesh.num_node))
    for e in range(mesh.num_tet):
        for a in range(4):
            for b in range(4):
                dense_ref[mesh.ien[e, a], mesh.ien[e, b]] += ejm[e, a, b, 0, 0]
    assert np.allclose(dense, dense_ref, atol=1e-13)


def _solve_poisson_linear_exact(solver):
    """-lap(u) = 0 with u = 1 + 2x - y + 3z on all boundaries: P1 FEM
    reproduces linear solutions exactly."""
    mesh = box_mesh(3, 3, 3)
    ctx = build_context(mesh)
    u_exact = 1.0 + 2.0 * mesh.xg[:, 0] - mesh.xg[:, 1] + 3.0 * mesh.xg[:, 2]
    k0, b = assemble_poisson(ctx, jnp.zeros(mesh.num_node))
    bcs = [StrongBC(i, (0,)) for i in range(6)]
    mask = jnp.asarray(build_mask(mesh, bcs, 1))
    # Lifting: x = x_bc + du with homogeneous du (keeps the reduced
    # operator symmetric so both CG and GMRES apply).
    x_bc = jnp.where(mask[:, 0], jnp.asarray(u_exact), 0.0)
    b2 = apply_vec(mask[:, 0], b - k0.matvec(x_bc[:, None])[:, 0])
    k = apply_mat(mask, k0)
    pc = JacobiPC.from_diag(k.diag_blocks()[:, 0, 0])
    out = solver(
        lambda v: k.matvec(v[:, None])[:, 0], b2, pc=lambda v: pc(v)
    )
    u = np.asarray(x_bc + out.x)
    assert bool(out.converged)
    assert np.allclose(u, u_exact, atol=1e-8)


def test_poisson_gmres_jacobi():
    _solve_poisson_linear_exact(
        lambda mv, b, pc: gmres(mv, b, maxit=120, atol=1e-12, rtol=1e-12, pc=pc)
    )


def test_poisson_cg_jacobi():
    _solve_poisson_linear_exact(
        lambda mv, b, pc: cg(mv, b, maxit=400, atol=1e-12, rtol=1e-12, pc=pc)
    )


def test_poisson_manufactured_convergence():
    """-lap(u) = 3*pi^2 sin(pi x)sin(pi y)sin(pi z): refining halves h and
    the L2 error must drop ~4x (P1 is O(h^2); accept >2.5x pre-asymptotically)."""
    errs = []
    for nx in (4, 8):
        mesh = box_mesh(nx, nx, nx)
        ctx = build_context(mesh)
        x, y, z = mesh.xg.T
        u_exact = np.sin(np.pi * x) * np.sin(np.pi * y) * np.sin(np.pi * z)
        f = 3.0 * np.pi**2 * u_exact
        k, b = assemble_poisson(ctx, jnp.asarray(f))
        mask = jnp.asarray(build_mask(mesh, [StrongBC(i, (0,)) for i in range(6)], 1))
        k = apply_mat(mask, k)
        b = apply_vec(mask[:, 0], b)
        pc = JacobiPC.from_diag(k.diag_blocks()[:, 0, 0])
        out = cg(
            lambda v: k.matvec(v[:, None])[:, 0],
            b,
            maxit=500,
            atol=1e-13,
            rtol=1e-11,
            pc=pc,
        )
        err = np.sqrt(np.mean((np.asarray(out.x) - u_exact) ** 2))
        errs.append(err)
    assert errs[1] < errs[0] / 2.5, errs


def test_dirichlet_mask_build():
    mesh = box_mesh(2, 2, 2)
    mask = build_mask(mesh, [StrongBC(0, (0, 1, 2)), StrongBC(2, (1,))], 6)
    assert mask.shape == (mesh.num_node, 6)
    n0 = mesh.boundaries[0].nodes
    assert mask[n0][:, :3].all() and not mask[n0][:, 3:].any()
    n2 = mesh.boundaries[2].nodes
    assert mask[n2][:, 1].all()
