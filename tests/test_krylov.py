"""Krylov solver tests on manufactured systems (SURVEY.md section 4c)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.solver.krylov import cg, gmres
from dedflow_tpu.solver.pc import BlockJacobiPC, JacobiPC, NSFieldSplitPC


def _random_system(n, rng, spd=False, cond=50.0):
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    vals = np.geomspace(1.0, cond, n)
    if spd:
        a = q @ np.diag(vals) @ q.T
    else:
        q2, _ = np.linalg.qr(rng.normal(size=(n, n)))
        a = q @ np.diag(vals) @ q2.T
    x = rng.normal(size=n)
    return jnp.asarray(a), jnp.asarray(x), jnp.asarray(a @ x)


def test_gmres_unsymmetric_exact():
    rng = np.random.default_rng(0)
    a, x_true, b = _random_system(40, rng)
    out = gmres(lambda v: a @ v, b, maxit=40, atol=1e-13, rtol=1e-10)
    assert bool(out.converged)
    assert np.linalg.norm(np.asarray(out.x - x_true)) < 1e-8
    # Residual estimate from Givens recurrence matches the true residual.
    true_res = np.linalg.norm(np.asarray(b - a @ out.x))
    assert np.isclose(float(out.resnorm), true_res, rtol=1e-6, atol=1e-10)


def test_gmres_early_convergence_iters():
    """On an identity system GMRES converges in one iteration."""
    n = 17
    b = jnp.asarray(np.random.default_rng(1).normal(size=n))
    out = gmres(lambda v: v, b, maxit=30, atol=1e-12, rtol=1e-10)
    assert bool(out.converged)
    assert int(out.iters) <= 2
    assert np.allclose(np.asarray(out.x), np.asarray(b), atol=1e-12)


def test_gmres_with_jacobi_pc_and_rtol():
    rng = np.random.default_rng(2)
    n = 60
    a = np.diag(np.arange(1.0, n + 1)) + 0.1 * rng.normal(size=(n, n))
    x_true = rng.normal(size=n)
    b = a @ x_true
    aj = jnp.asarray(a)
    pc = JacobiPC.from_diag(jnp.asarray(np.diag(a)))
    out = gmres(lambda v: aj @ v, jnp.asarray(b), maxit=60, atol=0.0, rtol=1e-10, pc=pc)
    assert bool(out.converged)
    res = np.linalg.norm(b - a @ np.asarray(out.x)) / np.linalg.norm(b)
    assert res < 1e-9


def test_gmres_matches_reference_tolerance_semantics():
    """rtol measured against ||r0|| with x0 != 0 (krylov.c:287)."""
    rng = np.random.default_rng(3)
    a, x_true, b = _random_system(30, rng)
    x0 = jnp.asarray(rng.normal(size=30))
    out = gmres(lambda v: a @ v, b, x0=x0, maxit=30, atol=1e-13, rtol=1e-12)
    assert np.linalg.norm(np.asarray(out.x - x_true)) < 1e-7


def test_gmres_2d_state_shape():
    """GMRES over (N, 6)-shaped vectors (the solver-facing state layout)."""
    rng = np.random.default_rng(4)
    n, bs = 12, 6
    a, _, _ = _random_system(n * bs, rng)

    def mv(v):
        return (a @ v.reshape(-1)).reshape(n, bs)

    x_true = jnp.asarray(rng.normal(size=(n, bs)))
    b = mv(x_true)
    out = gmres(mv, b, maxit=n * bs, atol=1e-13, rtol=1e-13)
    assert out.x.shape == (n, bs)
    assert np.linalg.norm(np.asarray(out.x - x_true)) < 1e-7


def test_cg_spd():
    rng = np.random.default_rng(5)
    a, x_true, b = _random_system(50, rng, spd=True)
    pc = JacobiPC.from_diag(jnp.diagonal(a))
    out = cg(lambda v: a @ v, b, maxit=200, atol=1e-13, rtol=1e-12, pc=pc)
    assert bool(out.converged)
    assert np.linalg.norm(np.asarray(out.x - x_true)) < 1e-8


def test_block_jacobi_pc():
    rng = np.random.default_rng(6)
    blocks = rng.normal(size=(9, 3, 3)) + 3 * np.eye(3)
    pc = BlockJacobiPC.from_blocks(jnp.asarray(blocks))
    x = rng.normal(size=(9, 3))
    y = np.asarray(pc(jnp.asarray(x)))
    for i in range(9):
        assert np.allclose(y[i], np.linalg.solve(blocks[i], x[i]), atol=1e-12)


def test_gmres_under_jit():
    rng = np.random.default_rng(7)
    a, x_true, b = _random_system(20, rng)

    @jax.jit
    def solve(bv):
        return gmres(lambda v: a @ v, bv, maxit=20, atol=1e-13, rtol=1e-13).x

    assert np.linalg.norm(np.asarray(solve(b) - x_true)) < 1e-7


def test_gmres_restarted_converges():
    """GMRES(m) reaches the same solution as full GMRES on a nonsymmetric
    system, and the first-cycle relative tolerance semantics hold."""
    import jax.numpy as jnp

    from dedflow_tpu.solver.krylov import gmres

    rng = np.random.default_rng(4)
    n = 120
    a = np.eye(n) * 4.0 + 0.5 * rng.normal(size=(n, n)) / np.sqrt(n)
    x_true = rng.normal(size=n)
    b = a @ x_true
    aj = jnp.asarray(a)
    matvec = lambda v: aj @ v
    full = gmres(matvec, jnp.asarray(b), maxit=200, rtol=1e-10)
    rest = gmres(matvec, jnp.asarray(b), maxit=200, rtol=1e-10, restart=20)
    assert bool(rest.converged)
    np.testing.assert_allclose(np.asarray(rest.x), x_true, rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(full.x), x_true, rtol=1e-8, atol=1e-9)
    # iters counts ACTUAL inner iterations (the final cycle may stop
    # early): at least the optimal full-GMRES count, at most maxit
    assert int(full.iters) <= int(rest.iters) <= 200


def test_gmres_iterative_refinement_reaches_tight_tol():
    """Mixed-precision refinement (solver.refine.gmres_ir): f32 inner
    GMRES + f64 residual updates reach 1e-12 relative residual - the
    mechanism behind the on-hardware 1e-10 bar (tools/residual_check.py;
    BASELINE.md correctness bar)."""
    import jax.numpy as jnp

    from dedflow_tpu.solver.refine import gmres_ir

    rng = np.random.default_rng(5)
    n = 120
    a64 = jnp.asarray(rng.normal(size=(n, n)) / np.sqrt(n) + 3.0 * np.eye(n))
    b64 = jnp.asarray(rng.normal(size=(n,)))
    a32 = a64.astype(jnp.float32)

    info = gmres_ir(
        lambda v: a64 @ v,
        lambda v: a32 @ v,
        b64,
        tol=1e-12,
        inner_maxit=60,
        inner_rtol=1e-5,
    )
    assert info.rel_residual <= 1e-12, info
    assert info.cycles <= 6, info
    # direct check against the true solution
    x_ref = np.linalg.solve(np.asarray(a64), np.asarray(b64))
    np.testing.assert_allclose(np.asarray(info.x), x_ref, rtol=1e-9)
