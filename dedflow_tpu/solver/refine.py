"""Mixed-precision iterative refinement around GMRES.

The BASELINE correctness bar is a 1e-10 relative residual (BASELINE.md),
which plain f32 GMRES cannot reach (unit roundoff ~6e-8). The reference
runs everything in f64 on GPU (common.h:21-59); TPU f64 is
software-emulated and slow, so the TPU-native route is classic iterative
refinement: the O(iterations) Krylov work runs in fast f32, while only
one residual evaluation and one axpy per refinement cycle run in (
emulated) f64:

    x = 0
    repeat: r = b - A64 x        (f64: one matvec per cycle)
            d = GMRES32(A32, r)  (f32: all the Krylov iterations)
            x = x + d            (f64)

Each cycle multiplies the residual by the f32 solve's convergence factor,
so a handful of cycles reach 1e-10 and beyond, down to the f64 limit of
the assembled operator. Exercised on hardware by tools/residual_check.py.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from dedflow_tpu.solver.krylov import gmres


class RefineInfo(NamedTuple):
    x: jnp.ndarray  # f64 solution
    rel_residual: float  # final ||b - Ax|| / ||b||
    cycles: int
    inner_iters: int


class RefineDeviceInfo(NamedTuple):
    x: jnp.ndarray  # f64 solution
    rel_residual: jnp.ndarray  # final ||b - Ax|| / ||b|| (traced scalar)
    cycles: jnp.ndarray
    inner_iters: jnp.ndarray


def gmres_ir_device(
    matvec_hi: Callable,  # f64 operator
    matvec_lo: Callable,  # f32 operator (same matrix, lower precision)
    b: jnp.ndarray,  # f64 right-hand side
    *,
    pc: Callable | None = None,  # f32 preconditioner
    tol: float = 1e-10,
    max_cycles: int = 10,
    inner_maxit: int = 120,
    inner_rtol: float = 1e-6,
) -> RefineDeviceInfo:
    """Jit-compatible iterative refinement: the outer loop is a
    lax.while_loop (zero host syncs), so a whole Newton update can run
    refined inside one jitted call (solver.newton, krylov.precision='ir').
    Same algorithm as gmres_ir (the host-stepped tool variant)."""
    bnorm = jnp.linalg.norm(b.reshape(-1))
    eps = jnp.asarray(jnp.finfo(b.dtype).tiny, b.dtype)
    f32 = jnp.float32

    def cond(carry):
        x, cyc, rel, it = carry
        return jnp.logical_and(rel > tol, cyc < max_cycles)

    def body(carry):
        x, cyc, rel, it = carry
        r = b - matvec_hi(x)
        sol = gmres(
            matvec_lo, r.astype(f32), maxit=inner_maxit, atol=0.0,
            rtol=inner_rtol, pc=pc,
        )
        x = x + sol.x.astype(b.dtype)
        rel2 = jnp.linalg.norm((b - matvec_hi(x)).reshape(-1)) / jnp.maximum(
            bnorm, eps
        )
        return x, cyc + 1, rel2, it + sol.iters

    rel0 = jnp.where(bnorm > 0, jnp.ones((), b.dtype), jnp.zeros((), b.dtype))
    x, cycles, rel, iters = jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros_like(b), jnp.int32(0), rel0, jnp.int32(0)),
    )
    return RefineDeviceInfo(
        x=x, rel_residual=rel, cycles=cycles, inner_iters=iters
    )


def gmres_ir(
    matvec_hi: Callable,  # f64 operator
    matvec_lo: Callable,  # f32 operator (same matrix, lower precision)
    b: jnp.ndarray,  # f64 right-hand side
    *,
    pc: Callable | None = None,  # f32 preconditioner
    tol: float = 1e-10,
    max_cycles: int = 10,
    inner_maxit: int = 120,
    inner_rtol: float = 1e-6,
) -> RefineInfo:
    """Solve A x = b to `tol` relative residual in f64 using f32 GMRES
    inner solves. Host-stepped outer loop (one scalar sync per cycle)."""
    x = jnp.zeros_like(b)
    bnorm = float(jnp.linalg.norm(b.reshape(-1)))
    if bnorm == 0.0:
        return RefineInfo(x=x, rel_residual=0.0, cycles=0, inner_iters=0)
    rel = 1.0
    total_inner = 0
    cycles = 0
    for cycles in range(1, max_cycles + 1):
        r = b - matvec_hi(x)
        rel = float(jnp.linalg.norm(r.reshape(-1))) / bnorm
        if rel <= tol:
            return RefineInfo(
                x=x, rel_residual=rel, cycles=cycles - 1, inner_iters=total_inner
            )
        sol = gmres(
            matvec_lo,
            r.astype(jnp.float32),
            maxit=inner_maxit,
            atol=0.0,
            rtol=inner_rtol,
            pc=pc,
        )
        total_inner += int(sol.iters)
        x = x + sol.x.astype(b.dtype)
    r = b - matvec_hi(x)
    rel = float(jnp.linalg.norm(r.reshape(-1))) / bnorm
    return RefineInfo(x=x, rel_residual=rel, cycles=cycles, inner_iters=total_inner)
