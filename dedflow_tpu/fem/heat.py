"""Scalar heat / Poisson element kernels and assembly (the M1 slice).

Parity target: AssemleWeakFormKernelHeat (assemble.cu:377-443) - the
reference's scalar transient heat weak form under generalized-alpha:

    F_a   = sum_q gw_q detJ dT(q) N_a(q)  +  (1/6) detJ grad(T).grad(N_a)
    J_ab  = alpha_m detJ sum_q gw_q N_a N_b
          + dt alpha_f gamma (1/6) detJ grad(N_a).grad(N_b)

(1/6 = sum_q gw_q = reference-tet volume; gradients of P1 fields are
constant per element so the diffusion term needs no quadrature loop.)
Optional material constants rho*cp (capacity) and kappa (conductivity)
generalize the reference's unit coefficients.

Also provides the steady Poisson assembly (stiffness + load vector) used
by benchmark config #1 (BASELINE.md: "steady thermal Poisson, GMRES+Jacobi").
"""

from __future__ import annotations

import jax.numpy as jnp

from dedflow_tpu.fem import quadrature as quad
from dedflow_tpu.fem.assembly import (
    FEMContext,
    bsr_from_data,
    gather_nodal,
    scatter_matrix,
    scatter_residual,
)
from dedflow_tpu.sparse.bsr import BSRMatrix

_V_REF = 1.0 / 6.0  # reference tet volume = sum of quadrature weights


def heat_element_residual(
    ctx: FEMContext,
    t_alpha: jnp.ndarray,
    dt_alpha: jnp.ndarray,
    rho_cp: float = 1.0,
    kappa: float = 1.0,
) -> jnp.ndarray:
    """(ne, 4) element residual vectors (assemble.cu:402-412)."""
    shl = jnp.asarray(quad.SHL, dtype=t_alpha.dtype)  # (q, a)
    gw = jnp.asarray(quad.GW, dtype=t_alpha.dtype)
    te = gather_nodal(ctx, t_alpha)  # (ne, 4)
    dte = gather_nodal(ctx, dt_alpha)  # (ne, 4)
    dt_q = dte @ shl.T  # (ne, q)
    grad_t = jnp.einsum("ea,eai->ei", te, ctx.shgrad)  # (ne, 3)
    mass = jnp.einsum("q,eq,qa->ea", gw, dt_q, shl) * ctx.det_j[:, None] * rho_cp
    diff = (
        jnp.einsum("ei,eai->ea", grad_t, ctx.shgrad)
        * (_V_REF * kappa)
        * ctx.det_j[:, None]
    )
    return mass + diff


def heat_element_jacobian(
    ctx: FEMContext,
    alpha_m: float,
    dt_alpha_f_gamma: float,
    rho_cp: float = 1.0,
    kappa: float = 1.0,
) -> jnp.ndarray:
    """(ne, 4, 4) element Jacobians (assemble.cu:418-441)."""
    shl = jnp.asarray(quad.SHL, dtype=ctx.det_j.dtype)
    gw = jnp.asarray(quad.GW, dtype=ctx.det_j.dtype)
    mass_ref = jnp.einsum("q,qa,qb->ab", gw, shl, shl)  # (4, 4)
    mass = alpha_m * rho_cp * ctx.det_j[:, None, None] * mass_ref[None]
    stiff = (
        dt_alpha_f_gamma
        * kappa
        * _V_REF
        * ctx.det_j[:, None, None]
        * jnp.einsum("eai,ebi->eab", ctx.shgrad, ctx.shgrad)
    )
    return mass + stiff


def assemble_heat(
    ctx: FEMContext,
    t_alpha: jnp.ndarray,
    dt_alpha: jnp.ndarray,
    alpha_m: float,
    dt_alpha_f_gamma: float,
    rho_cp: float = 1.0,
    kappa: float = 1.0,
) -> tuple[jnp.ndarray, BSRMatrix]:
    """Global residual (N,) and scalar-block BSR Jacobian."""
    f = scatter_residual(ctx, heat_element_residual(ctx, t_alpha, dt_alpha, rho_cp, kappa))
    ej = heat_element_jacobian(ctx, alpha_m, dt_alpha_f_gamma, rho_cp, kappa)
    data = scatter_matrix(ctx, ej[..., None, None])
    return f, bsr_from_data(ctx, data)


def assemble_poisson(
    ctx: FEMContext,
    source: jnp.ndarray,
    kappa: float = 1.0,
) -> tuple[BSRMatrix, jnp.ndarray]:
    """Steady Poisson: K phi = b with K_ab = kappa int grad(N_a).grad(N_b)
    and b_a = int f N_a (f given nodally, interpolated to quadrature)."""
    shl = jnp.asarray(quad.SHL, dtype=source.dtype)
    gw = jnp.asarray(quad.GW, dtype=source.dtype)
    ek = (
        kappa
        * _V_REF
        * ctx.det_j[:, None, None]
        * jnp.einsum("eai,ebi->eab", ctx.shgrad, ctx.shgrad)
    )
    k = bsr_from_data(ctx, scatter_matrix(ctx, ek[..., None, None]))
    fe = gather_nodal(ctx, source)  # (ne, 4)
    f_q = fe @ shl.T  # (ne, q)
    eb = jnp.einsum("q,eq,qa->ea", gw, f_q, shl) * ctx.det_j[:, None]
    b = scatter_residual(ctx, eb)
    return k, b
