"""VMS/SUPG-stabilized Navier-Stokes + level-set + temperature weak form.

Vectorized (whole-mesh batched) transcription of the reference's element
kernels, keeping its exact formulas so that converged results match:

- stabilization parameters: GetStabTau (assemble.cu:444-484),
- residual (RHS): AssembleWeakFormKernel<TENSOR=1> (assemble.cu:761-924),
- approximate Jacobian (LHS): AssembleWeakFormLHSKernel
  (assemble.cu:495-759) - the shared-memory variant that the reference
  actually runs (IntElemAssembly, assemble.cu:1362-1371).

Notes on faithful quirks (kept deliberately, documented here):
- The pressure seen by the element kernels comes from the *rate* vector
  dw_alpha, not w_alpha (main.c:111-118 sets dwalpha[3,:]=dwg[3,:] and
  walpha[3,:]=0; the gather at assemble.cu:1606-1609 reads
  dwgalpha + 3N for the "wgalpha" buffer slot 3).
- The RHS tau uses u.G.u with G = inv(J) inv(J)^T (|J^-T u|^2), while the
  LHS tau uses |J^-1 u|^2 via the shape-convection trick
  (assemble.cu:592-601); both are reproduced as-is.
- The LHS is an inexact (Picard-like) tangent: it drops dtau/du and the
  advection-velocity derivative of the convection term, exactly like the
  reference. dRM/dP follows the *used* shared-memory kernel
  (assemble.cu:647-648), whose SUPG part has the opposite sign from the
  dead naive kernel (assemble.cu:983-984).
- phi/phi and T/T element blocks are identity per (a==b) pair
  (assemble.cu:757-758): the phi/T equations are frozen (their residual
  rows are zeroed by the driver, main.c:64).

State layout here: (N, 6) nodal arrays with columns [u0,u1,u2,p,phi,T];
element residuals are (ne, 4, 6) with slot 3 = continuity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from dedflow_tpu.config import Physics, TimeScheme
from dedflow_tpu.fem import quadrature as quad
from dedflow_tpu.fem.assembly import FEMContext


class ElementFields(NamedTuple):
    """Per-element nodal field gathers (LoadElementValueKernel calls,
    assemble.cu:1599-1678)."""

    u: jnp.ndarray  # (ne, 4, 3) velocity from w_alpha
    p: jnp.ndarray  # (ne, 4) pressure from dw_alpha (see module docstring)
    phi: jnp.ndarray  # (ne, 4) from w_alpha
    temp: jnp.ndarray  # (ne, 4) from w_alpha
    du: jnp.ndarray  # (ne, 4, 3) from dw_alpha
    dphi: jnp.ndarray  # (ne, 4)
    dtemp: jnp.ndarray  # (ne, 4)


def gather_fields(
    ien: jnp.ndarray, w_alpha: jnp.ndarray, dw_alpha: jnp.ndarray
) -> ElementFields:
    from dedflow_tpu.utils.xla import take_rows

    we = take_rows(w_alpha, ien)  # (ne, 4, 6)
    dwe = take_rows(dw_alpha, ien)
    return ElementFields(
        u=we[..., :3],
        p=dwe[..., 3],
        phi=we[..., 4],
        temp=we[..., 5],
        du=dwe[..., :3],
        dphi=dwe[..., 4],
        dtemp=dwe[..., 5],
    )


def _tables(dtype):
    shl = jnp.asarray(quad.SHL, dtype=dtype)  # (q, a)
    gw = jnp.asarray(quad.GW, dtype=dtype)  # (q,)
    return shl, gw


def stab_tau(
    metric: jnp.ndarray,  # (ne, 3, 3)
    u_q: jnp.ndarray,  # (ne, q, 3)
    phys: Physics,
    dt: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """GetStabTau (assemble.cu:444-484): (tauM, tauC, tauPhi, tauT),
    each (ne, q) except tauC's G-terms which are per-element."""
    rho, mu, cp, kappa = phys.rho, phys.mu, phys.cp, phys.kappa
    t0 = 4.0 / (dt * dt)
    t1 = jnp.einsum("eij,eqi,eqj->eq", metric, u_q, u_q)
    t2 = jnp.einsum("eij,eij->e", metric, metric)[:, None]
    tr = jnp.einsum("eii->e", metric)[:, None]
    nu = mu / rho
    alpha_th = kappa / (rho * cp)
    tau_m = jax_rsqrt(t0 + t1 + 3.0 * nu * nu * t2) / rho
    # tr == 0 only for degenerate padding elements (zero metric); their
    # contributions are annihilated by det_j = 0 downstream.
    tr = jnp.where(tr > 0.0, tr, 1.0)
    tau_c = jnp.sqrt(t1 + 3.0 * nu * nu * t2) / tr
    tau_phi = jax_rsqrt(t0 + t1)
    tau_t = jax_rsqrt(t0 + t1 + 3.0 * alpha_th * alpha_th * t2) / (rho * cp)
    return tau_m, tau_c, tau_phi, tau_t


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)


def ns_residual_elements(
    ctx: FEMContext,
    ef: ElementFields,
    phys: Physics,
    scheme: TimeScheme,
    src_e: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(ne, 4, 6) element residuals (AssembleWeakFormKernel<TENSOR=1>).

    `src_e` (ne, 4): nodal volumetric heat source gather (moving laser,
    BASELINE config #3); enters the T row as -int(N_a q). The reference
    has no source machinery (its T equation is frozen, main.c:64)."""
    dtype = ef.u.dtype
    shl, gw = _tables(dtype)
    rho, mu, cp, kappa = phys.rho, phys.mu, phys.cp, phys.kappa
    fb = jnp.asarray(phys.body_force, dtype=dtype)
    shgrad, det_j, metric = ctx.shgrad, ctx.det_j, ctx.metric

    # quadrature-point values
    u_q = jnp.einsum("qa,eai->eqi", shl, ef.u)
    du_q = jnp.einsum("qa,eai->eqi", shl, ef.du)
    p_q = jnp.einsum("qa,ea->eq", shl, ef.p)
    dphi_q = jnp.einsum("qa,ea->eq", shl, ef.dphi)
    dtemp_q = jnp.einsum("qa,ea->eq", shl, ef.dtemp)
    # constant per-element gradients of the P1 fields
    grad_u = jnp.einsum("eai,eaj->eij", ef.u, shgrad)  # du_i/dx_j
    grad_p = jnp.einsum("ea,eai->ei", ef.p, shgrad)
    grad_phi = jnp.einsum("ea,eai->ei", ef.phi, shgrad)
    grad_t = jnp.einsum("ea,eai->ei", ef.temp, shgrad)
    divu = jnp.einsum("eii->e", grad_u)

    # momentum PDE residual rL (GetrLi inline, assemble.cu:810-817)
    conv = jnp.einsum("eqj,eij->eqi", u_q, grad_u)
    r_l = rho * (du_q - fb[None, None, :] + conv) + grad_p[:, None, :]

    tau_m, tau_c, tau_phi, tau_t = stab_tau(metric, u_q, phys, scheme.dt)

    # tmp0 (assemble.cu:837-843): advection velocity corrected by -tauM*rL
    u_corr = u_q - tau_m[..., None] * r_l
    tmp0 = rho * (
        du_q - fb[None, None, :] + jnp.einsum("eqj,eij->eqi", u_corr, grad_u)
    )
    # tmp1 (assemble.cu:846-856)
    sym_grad = mu * (grad_u + jnp.swapaxes(grad_u, -1, -2))
    tmp1 = (
        sym_grad[:, None]
        + rho * tau_m[..., None, None] * jnp.einsum("eqi,eqj->eqij", r_l, u_q)
        - rho
        * (tau_m**2)[..., None, None]
        * jnp.einsum("eqi,eqj->eqij", r_l, r_l)
    )
    diag = -p_q + rho * tau_c * divu[:, None]  # (ne, q)
    eye3 = jnp.eye(3, dtype=dtype)
    tmp1 = tmp1 + diag[..., None, None] * eye3[None, None]

    # momentum rows (assemble.cu:862-874)
    f_m = jnp.einsum("q,qa,eqi->eai", gw, shl, tmp0) + jnp.einsum(
        "q,eaj,eqij->eai", gw, shgrad, tmp1
    )
    # continuity row (assemble.cu:876-884)
    f_c = jnp.einsum("q,qa,e->ea", gw, shl, divu) + jnp.einsum(
        "q,eq,eqi,eai->ea", gw, tau_m, r_l, shgrad
    )
    # phi row (assemble.cu:885-892)
    shconv = jnp.einsum("eqi,eai->eqa", u_q, shgrad)
    adv_phi = dphi_q + jnp.einsum("eqi,ei->eq", u_q, grad_phi)
    f_phi = jnp.einsum(
        "q,eq,eqa->ea",
        gw,
        adv_phi,
        shl[None, :, :] + tau_phi[..., None] * shconv,
    )
    # temperature row (assemble.cu:894-907)
    adv_t = rho * cp * (dtemp_q + jnp.einsum("eqi,ei->eq", u_q, grad_t))
    f_t = jnp.einsum(
        "q,eq,eqa->ea",
        gw,
        adv_t,
        shl[None, :, :] + rho * cp * tau_t[..., None] * shconv,
    ) + gw.sum() * jnp.einsum("ei,eai->ea", kappa * grad_t, shgrad)
    if src_e is not None:
        src_q = jnp.einsum("qa,ea->eq", shl, src_e)
        f_t = f_t - jnp.einsum(
            "q,eq,eqa->ea",
            gw,
            src_q,
            shl[None, :, :] + rho * cp * tau_t[..., None] * shconv,
        )

    f = jnp.concatenate(
        [f_m, f_c[..., None], f_phi[..., None], f_t[..., None]], axis=-1
    )
    return f * det_j[:, None, None]


def scalar_lhs_blocks(
    ctx: FEMContext,
    ef: ElementFields,
    phys: Physics,
    scheme: TimeScheme,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Consistent (Picard) phi/T Jacobian blocks, each (ne, 4, 4).

    The reference keeps bare identity blocks because its phi/T equations
    are frozen (assemble.cu:757-758 + main.c:64); with the equations
    active (melt-pool runs, BASELINE config #3) an identity LHS would be
    a divergent Richardson iteration, so the advection-diffusion tangent
    is assembled: d(adv)/d(dwg_b) = alpha_m N_b + fact_w u.grad(N_b),
    SUPG-tested, + fact_w diffusion (tau derivatives dropped, matching
    the reference's Picard-style inexactness in the velocity block).
    """
    dtype = ef.u.dtype
    shl, gw = _tables(dtype)
    rho, cp, kappa = phys.rho, phys.cp, phys.kappa
    f1, f2, dt = scheme.fact_dw, scheme.fact_w, scheme.dt
    shgrad, det_j, metric = ctx.shgrad, ctx.det_j, ctx.metric

    u_q = jnp.einsum("qa,eai->eqi", shl, ef.u)
    shconv = jnp.einsum("eqi,eai->eqa", u_q, shgrad)
    # the residual's own taus (stab_tau) so that d(residual)/d(scalars)
    # is exact - tau depends only on u, which these columns hold fixed
    _, _, tau_phi, tau_t = stab_tau(metric, u_q, phys, dt)
    e_k = jnp.einsum("eai,ebi->eab", shgrad, shgrad)
    gw_sum = gw.sum()
    dj = det_j[:, None, None]

    trial = f1 * shl[None] + f2 * shconv  # (ne, q, b)
    test_phi = shl[None] + tau_phi[..., None] * shconv
    j_phi = jnp.einsum("q,eqa,eqb->eab", gw, test_phi, trial) * dj
    test_t = shl[None] + rho * cp * tau_t[..., None] * shconv
    j_t = (
        rho * cp * jnp.einsum("q,eqa,eqb->eab", gw, test_t, trial)
        + f2 * kappa * gw_sum * e_k
    ) * dj
    return j_phi, j_t


def ns_lhs_packed(
    ctx: FEMContext,
    ef: ElementFields,
    phys: Physics,
    scheme: TimeScheme,
    scalar_implicit: bool = False,
) -> jnp.ndarray:
    """(ne*16, 18) packed element Jacobians.

    Same formulas as ns_lhs_elements (AssembleWeakFormLHSKernel,
    assemble.cu:495-759) but emitted as the 18 structurally-nonzero
    components of the 6x6 block (sparse.fsbsr component order), with
    every intermediate kept <= (ne, 4, 4): no trailing (6, 6) dims, so
    TPU tile layouts stay compact (see fsbsr module docstring).

    scalar_implicit replaces the frozen-identity phi/T blocks with the
    consistent transport tangents (scalar_lhs_blocks).
    """
    dtype = ef.u.dtype
    shl, gw = _tables(dtype)
    rho, mu = phys.rho, phys.mu
    f1 = scheme.fact_dw
    f2 = scheme.fact_w
    dt = scheme.dt
    shgrad, det_j, metric = ctx.shgrad, ctx.det_j, ctx.metric
    ne = shgrad.shape[0]

    u_q = jnp.einsum("qa,eai->eqi", shl, ef.u)
    shconv = jnp.einsum("eqi,eai->eqa", u_q, shgrad)  # (ne, q, a)
    adv2 = jnp.sum(shconv[..., 1:] ** 2, axis=-1)
    gg = jnp.einsum("eij,eij->e", metric, metric)[:, None]
    tr = jnp.einsum("eii->e", metric)[:, None]
    knu = mu / rho
    tau0 = jax_rsqrt(4.0 / (dt * dt) + adv2 + 3.0 * knu * knu * gg) / rho
    tr = jnp.where(tr > 0.0, tr, 1.0)
    tau1 = jnp.sqrt(adv2 + 3.0 * knu * knu * gg) / tr

    e_k = jnp.einsum("eai,ebi->eab", shgrad, shgrad)
    gw_sum = gw.sum()  # = 1/6

    # velocity diagonal scalar block (assemble.cu:618-624)
    tmp = (
        f1 * rho * jnp.einsum("q,qa,qb->ab", gw, shl, shl)[None]
        + f1 * rho * rho * jnp.einsum("q,eq,eqa,qb->eab", gw, tau0, shconv, shl)
        + f2 * rho * jnp.einsum("q,qa,eqb->eab", gw, shl, shconv)
        + f2 * rho * rho * jnp.einsum("q,eq,eqa,eqb->eab", gw, tau0, shconv, shconv)
        + f2 * mu * gw_sum * e_k
    )
    c_grad2 = f2 * rho * jnp.einsum("q,eq->e", gw, tau1)  # (ne,)
    tau0_sum = jnp.einsum("q,eq->e", gw, tau0)  # (ne,)
    # pre-contracted helpers
    gs_conv = jnp.einsum("q,eq,eqa->ea", gw, tau0, shconv)  # (ne, a)
    gs_shl = jnp.einsum("q,eq,qa->ea", gw, tau0, shl)  # (ne, a)

    dj = det_j[:, None, None]
    valid = (det_j > 0.0).astype(dtype)
    eye_ab = jnp.eye(4, dtype=dtype)[None] * valid[:, None, None]

    comps = [None] * 18
    g = lambda i: shgrad[..., i]  # (ne, 4)
    for i in range(3):
        for j in range(3):
            c = (
                f2 * mu * gw_sum * jnp.einsum("ea,eb->eab", g(j), g(i))
                + c_grad2[:, None, None] * jnp.einsum("ea,eb->eab", g(i), g(j))
            )
            if i == j:
                c = c + tmp
            comps[i * 3 + j] = c * dj
    for i in range(3):
        # dRM/dP (assemble.cu:646-649, shared-memory sign convention)
        up = -jnp.einsum("q,ea,qb->eab", gw, g(i), shl) + rho * jnp.einsum(
            "ea,eb->eab", gs_conv, g(i)
        )
        comps[9 + i] = up * dj
        # dRC/dU (assemble.cu:653-657)
        pu = (
            f1 * rho * jnp.einsum("ea,eb->eab", g(i), gs_shl)
            + f2 * jnp.einsum("q,qa,eb->eab", gw, shl, g(i))
            + f2 * rho * jnp.einsum("ea,eb->eab", g(i), gs_conv)
        )
        comps[12 + i] = pu * dj
    comps[15] = tau0_sum[:, None, None] * e_k * dj
    if scalar_implicit:
        comps[16], comps[17] = scalar_lhs_blocks(ctx, ef, phys, scheme)
    else:
        comps[16] = eye_ab
        comps[17] = eye_ab
    return jnp.stack([c.reshape(ne * 16) for c in comps], axis=-1)


def ns_lhs_elements(
    ctx: FEMContext,
    ef: ElementFields,
    phys: Physics,
    scheme: TimeScheme,
    scalar_implicit: bool = False,
) -> jnp.ndarray:
    """(ne, 4, 4, 6, 6) approximate element Jacobians
    (AssembleWeakFormLHSKernel, assemble.cu:495-759)."""
    dtype = ef.u.dtype
    shl, gw = _tables(dtype)
    rho, mu = phys.rho, phys.mu
    f1 = scheme.fact_dw  # kALPHAM (assemble.cu:514)
    f2 = scheme.fact_w  # kDT*kALPHAF*kGAMMA (assemble.cu:515)
    dt = scheme.dt
    shgrad, det_j, metric = ctx.shgrad, ctx.det_j, ctx.metric
    ne = shgrad.shape[0]

    u_q = jnp.einsum("qa,eai->eqi", shl, ef.u)
    shconv = jnp.einsum("eqi,eai->eqa", u_q, shgrad)  # (ne, q, a)
    # LHS tau (assemble.cu:592-602): |J^-1 u|^2 = sum_{a=1..3} shconv_a^2.
    adv2 = jnp.sum(shconv[..., 1:] ** 2, axis=-1)  # (ne, q)
    gg = jnp.einsum("eij,eij->e", metric, metric)[:, None]
    tr = jnp.einsum("eii->e", metric)[:, None]
    knu = mu / rho
    tau0 = jax_rsqrt(4.0 / (dt * dt) + adv2 + 3.0 * knu * knu * gg) / rho
    tr = jnp.where(tr > 0.0, tr, 1.0)  # degenerate padding elements
    tau1 = jnp.sqrt(adv2 + 3.0 * knu * knu * gg) / tr

    e_k = jnp.einsum("eai,ebi->eab", shgrad, shgrad)
    gw_sum = gw.sum()  # = 1/6

    # velocity diagonal scalar block (assemble.cu:618-624)
    tmp = (
        f1 * rho * jnp.einsum("q,qa,qb->ab", gw, shl, shl)[None]
        + f1 * rho * rho * jnp.einsum("q,eq,eqa,qb->eab", gw, tau0, shconv, shl)
        + f2 * rho * jnp.einsum("q,qa,eqb->eab", gw, shl, shconv)
        + f2 * rho * rho * jnp.einsum("q,eq,eqa,eqb->eab", gw, tau0, shconv, shconv)
        + f2 * mu * gw_sum * e_k
    )
    # full 3x3 velocity coupling (assemble.cu:638-643)
    visc = f2 * mu * gw_sum * jnp.einsum("eaj,ebi->eabij", shgrad, shgrad)
    grad2 = (
        f2
        * rho
        * jnp.einsum("q,eq->e", gw, tau1)[:, None, None, None, None]
        * jnp.einsum("eai,ebj->eabij", shgrad, shgrad)
    )
    eye3 = jnp.eye(3, dtype=dtype)
    j_uu = tmp[..., None, None] * eye3[None, None, None] + visc + grad2

    # dRM/dP (assemble.cu:646-649; the *used* sign convention)
    j_up = -jnp.einsum("q,eai,qb->eabi", gw, shgrad, shl) + rho * jnp.einsum(
        "q,eq,eqa,ebi->eabi", gw, tau0, shconv, shgrad
    )
    # dRC/dU (assemble.cu:653-657)
    j_pu = (
        f1 * rho * jnp.einsum("q,eq,eai,qb->eabi", gw, tau0, shgrad, shl)
        + f2 * jnp.einsum("q,qa,ebi->eabi", gw, shl, shgrad)
        + f2 * rho * jnp.einsum("q,eq,eai,eqb->eabi", gw, tau0, shgrad, shconv)
    )
    # dRC/dP (assemble.cu:661)
    j_pp = jnp.einsum("q,eq->e", gw, tau0)[:, None, None] * e_k

    j = jnp.zeros((ne, 4, 4, 6, 6), dtype=dtype)
    j = j.at[..., :3, :3].set(j_uu)
    j = j.at[..., :3, 3].set(j_up)
    j = j.at[..., 3, :3].set(j_pu)
    j = j.at[..., 3, 3].set(j_pp)
    j = j * det_j[:, None, None, None, None]
    if scalar_implicit:
        j_phi, j_t = scalar_lhs_blocks(ctx, ef, phys, scheme)
        j = j.at[..., 4, 4].set(j_phi)
        j = j.at[..., 5, 5].set(j_t)
        return j
    # frozen phi/T identity blocks (assemble.cu:757-758): no detJ/gw scaling,
    # but gated off for degenerate padding elements (det_j == 0).
    eye_ab = (
        jnp.eye(4, dtype=dtype)[None, :, :] * (det_j > 0.0)[:, None, None]
    )
    j = j.at[..., 4, 4].add(eye_ab)
    j = j.at[..., 5, 5].add(eye_ab)
    return j
