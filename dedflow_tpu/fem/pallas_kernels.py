"""Pallas TPU kernels for the hot assembly path.

`ns_lhs_packed_pallas` fuses the whole VMS Navier-Stokes element Jacobian
(weakform.ns_lhs_packed; reference AssembleWeakFormLHSKernel,
assemble.cu:495-759) into ONE pass: the XLA version lowers to ~30
separate einsum fusions, each re-materializing (ne, 4, 4) temps in HBM,
while this kernel streams 27 floats per element in and 288 out with every
intermediate held in VMEM.

Data layout (the TPU part of the design):
- element axis on lanes: every intermediate is a (rows, E) tile with
  E = 512 elements per grid step;
- node-pair quantities are (16, E) - the pair index s = a*4 + b lives on
  sublanes at full occupancy; per-node (4, E) quantities broadcast to
  pairs with sublane repeat (a-indexed) / tile (b-indexed);
- the 4-point quadrature loop is unrolled in Python, with the shape
  tables folded in as scalar constants.

Input  (27, ne): rows [0:12) shgrad (i*4 + a), [12:24) nodal velocity
                 (i*4 + a), 24 det_j, 25 gg = |G|^2, 26 tr(G).
Output (ne, 288): element e's 16 pairs x 18 packed components,
                 byte-identical to the (ne*16, 18) update layout that the
                 scatter plans consume (sparse.fsbsr component order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dedflow_tpu.config import Physics, TimeScheme
from dedflow_tpu.fem import quadrature as quad

_E = 512  # elements per grid step


def _check_f32_contract(dtype) -> None:
    """The fused element kernels compute in f32 (Mosaic TPU path). Callers
    cast the result back to the state dtype, which would silently mask a
    precision downgrade in an f64 run -- refuse instead (use
    elements_kernel='xla' for f64 validation runs)."""
    if jnp.dtype(dtype) == jnp.float64:
        raise ValueError(
            "elements_kernel='pallas' computes in float32; it cannot honor "
            "a float64 state. Use elements_kernel='xla' for f64 runs."
        )

_SHL = np.asarray(quad.SHL, dtype=np.float64)  # (q, a)
_GW = np.asarray(quad.GW, dtype=np.float64)  # (q,)
_GWSUM = float(_GW.sum())
_MASS = np.einsum("q,qa,qb->ab", _GW, _SHL, _SHL)  # (4, 4)
_GWSHL = np.einsum("q,qa->a", _GW, _SHL)  # (4,)


# Pallas kernels may not capture array constants; the small shape-table
# constants are rebuilt inside the kernel from iota selections (unrolled
# at trace time into scalar selects).


def _pair_const(fn, dtype=jnp.float32) -> jnp.ndarray:
    """(16, 1) with value fn(a, b) at sublane a*4+b, from iota."""
    s = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)
    a, b = s // 4, s % 4
    out = jnp.zeros((16, 1), dtype)
    for ai in range(4):
        for bi in range(4):
            out = out + jnp.where(
                (a == ai) & (b == bi), jnp.asarray(fn(ai, bi), dtype), 0.0
            )
    return out


def _node_const(vals, dtype=jnp.float32) -> jnp.ndarray:
    """(4, 1) with vals[a] at sublane a, from iota."""
    a = jax.lax.broadcasted_iota(jnp.int32, (4, 1), 0)
    out = jnp.zeros((4, 1), dtype)
    for ai in range(4):
        out = out + jnp.where(a == ai, jnp.asarray(vals[ai], dtype), 0.0)
    return out


def _rep_a(x):
    """(4, E) a-indexed -> (16, E) at sublane a*4+b."""
    e = x.shape[-1]
    return jnp.broadcast_to(x[:, None, :], (4, 4, e)).reshape(16, e)


def _rep_b(x):
    """(4, E) b-indexed -> (16, E) at sublane a*4+b."""
    e = x.shape[-1]
    return jnp.broadcast_to(x[None, :, :], (4, 4, e)).reshape(16, e)


def _lhs_kernel(inp_ref, out_ref, *, rho, mu, f1, f2, dt, cp=1.0,
                kappa=1.0, scalar_implicit=False, comp_major=False):
    out_ref[:, :] = _lhs_rows(
        inp_ref[:, :], rho=rho, mu=mu, f1=f1, f2=f2, dt=dt, cp=cp,
        kappa=kappa, scalar_implicit=scalar_implicit,
        comp_major=comp_major,
    )


def _lhs_rows(inp, *, rho, mu, f1, f2, dt, ncomp=18, cp=1.0, kappa=1.0,
              scalar_implicit=False, comp_major=False):
    """Pure (27, E) -> (16*ncomp, E) element-Jacobian body, shared by the
    Pallas kernel (TPU) and the plain-XLA lattice fallback (CPU / f64).

    ncomp=18 emits the full packed layout; ncomp=16 drops the phi-phi/T-T
    identity components (16/17) - they are STATE-INDEPENDENT (eye16 *
    liveness), so the lattice fast path precomputes their nodal sum (the
    element multiplicity) once and the fused kernel's accumulator slices
    become 16-row = sublane-aligned (18-row slices straddle 8-sublane
    tiles, measured ~2x slower accumulate loop)."""
    f32 = inp.dtype
    sh = [inp[4 * i : 4 * (i + 1), :] for i in range(3)]  # i -> (4, E)
    u = [inp[12 + 4 * i : 12 + 4 * (i + 1), :] for i in range(3)]
    det = inp[24:25, :]  # (1, E)
    gg = inp[25:26, :]
    tr = inp[26:27, :]

    knu = mu / rho
    visc2 = 3.0 * knu * knu
    tr_safe = jnp.where(tr > 0.0, tr, 1.0)

    mass16 = _pair_const(lambda a, b: _MASS[a, b], f32)

    if scalar_implicit:
        # implicit phi/T transport tangents (weakform.scalar_lhs_blocks):
        # their taus use the residual's metric form t1 = u.G.u, so the
        # input carries the 6 packed metric rows (lhs_geom_rows
        # with_metric=True)
        m6 = [inp[27 + k : 28 + k, :] for k in range(6)]
        alpha_th = kappa / (rho * cp)
        jphi = jnp.zeros((16, det.shape[1]), f32)
        jt = jnp.zeros((16, det.shape[1]), f32)

    # quadrature accumulation (unrolled; shconv[q] is (4, E))
    tmp = jnp.broadcast_to(f1 * rho * mass16, (16, det.shape[1])).astype(f32)
    gs_conv = jnp.zeros_like(sh[0])  # (4, E)
    gs_shl = jnp.zeros_like(sh[0])
    tau0_sum = jnp.zeros_like(det)  # (1, E)
    c_grad2 = jnp.zeros_like(det)
    for q in range(4):
        uq = [None] * 3
        for i in range(3):
            # scalar-weighted sum of the 4 nodal rows: (1, E)
            uq[i] = sum(
                float(_SHL[q][a]) * u[i][a : a + 1, :] for a in range(4)
            )
        shconv = uq[0] * sh[0] + uq[1] * sh[1] + uq[2] * sh[2]  # (4, E)
        adv2 = jnp.sum(shconv[1:4, :] ** 2, axis=0, keepdims=True)  # (1, E)
        tau0 = jax.lax.rsqrt(4.0 / (dt * dt) + adv2 + visc2 * gg) / rho
        tau1 = jnp.sqrt(adv2 + visc2 * gg) / tr_safe
        gwq = float(_GW[q])
        shl_b = _node_const(_SHL[q], f32)  # (4, 1)
        conv_a = _rep_a(shconv)
        conv_b = _rep_b(shconv)
        shl16_a = _pair_const(lambda a, b: _SHL[q][a], f32)
        shl16_b = _pair_const(lambda a, b: _SHL[q][b], f32)
        tmp = tmp + (
            (f1 * rho * rho * gwq) * tau0 * conv_a * shl16_b
            + (f2 * rho * gwq) * shl16_a * conv_b
            + (f2 * rho * rho * gwq) * tau0 * conv_a * conv_b
        )
        gs_conv = gs_conv + (gwq) * tau0 * shconv
        gs_shl = gs_shl + gwq * tau0 * shl_b
        tau0_sum = tau0_sum + gwq * tau0
        c_grad2 = c_grad2 + (f2 * rho * gwq) * tau1
        if scalar_implicit:
            t0c = 4.0 / (dt * dt)
            t1 = (
                m6[0] * uq[0] * uq[0] + m6[3] * uq[1] * uq[1]
                + m6[5] * uq[2] * uq[2]
                + 2.0 * (m6[1] * uq[0] * uq[1] + m6[2] * uq[0] * uq[2]
                         + m6[4] * uq[1] * uq[2])
            )
            tau_phi = jax.lax.rsqrt(t0c + t1)
            tau_t = jax.lax.rsqrt(t0c + t1 + 3.0 * alpha_th * alpha_th * gg) / (
                rho * cp
            )
            trial16 = f1 * shl16_b + f2 * conv_b
            jphi = jphi + gwq * (shl16_a + tau_phi * conv_a) * trial16
            jt = jt + (rho * cp * gwq) * (
                shl16_a + (rho * cp) * tau_t * conv_a
            ) * trial16

    sh_a = [_rep_a(sh[i]) for i in range(3)]  # (16, E)
    sh_b = [_rep_b(sh[i]) for i in range(3)]
    e_k = sh_a[0] * sh_b[0] + sh_a[1] * sh_b[1] + sh_a[2] * sh_b[2]
    tmp = tmp + (f2 * mu * _GWSUM) * e_k
    gsconv_a = _rep_a(gs_conv)
    gsconv_b = _rep_b(gs_conv)
    gsshl_b = _rep_b(gs_shl)
    gwshl_a = _pair_const(lambda a, b: _GWSHL[a], f32)
    gwshl_b = _pair_const(lambda a, b: _GWSHL[b], f32)
    eye16 = _pair_const(lambda a, b: 1.0 if a == b else 0.0, f32)

    comps = [None] * ncomp
    for i in range(3):
        for j in range(3):
            c = (f2 * mu * _GWSUM) * sh_a[j] * sh_b[i] + c_grad2 * sh_a[i] * sh_b[j]
            if i == j:
                c = c + tmp
            comps[i * 3 + j] = c * det
    for i in range(3):
        comps[9 + i] = (-sh_a[i] * gwshl_b + rho * gsconv_a * sh_b[i]) * det
        comps[12 + i] = (
            (f1 * rho) * sh_a[i] * gsshl_b
            + f2 * gwshl_a * sh_b[i]
            + (f2 * rho) * sh_a[i] * gsconv_b
        ) * det
    comps[15] = tau0_sum * e_k * det
    if ncomp == 18 and scalar_implicit:
        comps[16] = jphi * det
        comps[17] = (jt + (f2 * kappa * _GWSUM) * e_k) * det
    elif ncomp == 18:
        ident = eye16 * (det > 0.0).astype(f32)
        comps[16] = jnp.broadcast_to(ident, e_k.shape)
        comps[17] = comps[16]

    # comp_major emits rows c*16 + ab (the windowed Jacobian path's
    # G-blocked update table is then a pure VIEW of the kernel output -
    # the r4 ab-major rows forced an XLA lane-interleaving relayout that
    # measured 19 ms at 287k tets); default ab-major rows ab*ncomp + c.
    axis = 0 if comp_major else 1
    stacked = jnp.stack(comps, axis=axis)  # (16, ncomp, E)|(ncomp, 16, E)
    # collapse the two MAJOR dims (free); any lane-major transpose to
    # (E, 288) happens outside in XLA (Mosaic cannot shape-cast across
    # the lane dim)
    return stacked.reshape(16 * ncomp, det.shape[1])


def res_geom_rows(shgrad, det_j, metric) -> jnp.ndarray:
    """(19, ne) static geometry rows for the residual kernel: 12 transposed
    shape gradients (row i*4+a), det_j, and the 6 unique metric entries
    (m00, m01, m02, m11, m12, m22)."""
    ne = shgrad.shape[0]
    sh_t = shgrad.transpose(2, 1, 0).reshape(12, ne)
    m = metric
    m6 = jnp.stack(
        [m[:, 0, 0], m[:, 0, 1], m[:, 0, 2], m[:, 1, 1], m[:, 1, 2], m[:, 2, 2]]
    )
    return jnp.concatenate([sh_t, det_j[None, :], m6])


def _res_kernel(inp_ref, out_ref, *, rho, mu, cp, kappa, fb, dt):
    """Fused VMS residual element kernel (AssembleWeakFormKernel<TENSOR=1>,
    assemble.cu:761-924 + the heat-source term). Input rows:
    [0:12) sh (i*4+a), 12 det, [13:19) metric6, [19:31) u, [31:43) du,
    [43:47) p, [47:51) phi, [51:55) T, [55:59) dphi, [59:63) dT,
    [63:67) src. Output (24, E): rows a*6+c of the (4, 6) element residual.
    """
    out_ref[:, :] = _res_rows(
        inp_ref[:, :], rho=rho, mu=mu, cp=cp, kappa=kappa, fb=fb, dt=dt
    )


def _res_rows(inp, *, rho, mu, cp, kappa, fb, dt):
    """Pure (67, E) -> (24, E) residual body, shared by the Pallas kernel
    (TPU) and the plain-XLA lattice fallback (CPU / f64)."""
    f32 = inp.dtype
    sh = [inp[4 * i : 4 * (i + 1), :] for i in range(3)]
    det = inp[12:13, :]
    m6 = [inp[13 + k : 14 + k, :] for k in range(6)]
    u = [inp[19 + 4 * i : 23 + 4 * i, :] for i in range(3)]
    du = [inp[31 + 4 * i : 35 + 4 * i, :] for i in range(3)]
    p = inp[43:47, :]
    phi = inp[47:51, :]
    temp = inp[51:55, :]
    dphi = inp[55:59, :]
    dtemp = inp[59:63, :]
    src = inp[63:67, :]

    m00, m01, m02, m11, m12, m22 = m6
    gg = (
        m00 * m00 + m11 * m11 + m22 * m22
        + 2.0 * (m01 * m01 + m02 * m02 + m12 * m12)
    )
    tr = m00 + m11 + m22
    tr = jnp.where(tr > 0.0, tr, 1.0)
    nu = mu / rho
    alpha_th = kappa / (rho * cp)
    t0 = 4.0 / (dt * dt)

    def rows_dot(nodal, grad_i):  # Σ_a nodal[a] * grad_i[a] -> (1, E)
        return jnp.sum(nodal * grad_i, axis=0, keepdims=True)

    # constant P1 gradients
    grad_u = [[rows_dot(u[i], sh[j]) for j in range(3)] for i in range(3)]
    grad_p = [rows_dot(p, sh[i]) for i in range(3)]
    grad_phi = [rows_dot(phi, sh[i]) for i in range(3)]
    grad_t = [rows_dot(temp, sh[i]) for i in range(3)]
    divu = grad_u[0][0] + grad_u[1][1] + grad_u[2][2]

    fm = [jnp.zeros_like(sh[0]) for _ in range(3)]  # (4, E) per i
    fc = jnp.zeros_like(sh[0])
    fphi = jnp.zeros_like(sh[0])
    ft = jnp.zeros_like(sh[0])
    for q in range(4):
        wq = float(_GW[q])
        shl_a = _node_const(_SHL[q], f32)  # (4, 1)
        qval = lambda nodal: jnp.sum(shl_a * nodal, axis=0, keepdims=True)
        uq = [qval(u[i]) for i in range(3)]
        duq = [qval(du[i]) for i in range(3)]
        pq = qval(p)
        dphiq = qval(dphi)
        dtempq = qval(dtemp)
        srcq = qval(src)

        t1 = (
            m00 * uq[0] * uq[0] + m11 * uq[1] * uq[1] + m22 * uq[2] * uq[2]
            + 2.0 * (m01 * uq[0] * uq[1] + m02 * uq[0] * uq[2]
                     + m12 * uq[1] * uq[2])
        )
        tau_m = jax.lax.rsqrt(t0 + t1 + 3.0 * nu * nu * gg) / rho
        tau_c = jnp.sqrt(t1 + 3.0 * nu * nu * gg) / tr
        tau_phi = jax.lax.rsqrt(t0 + t1)
        tau_t = jax.lax.rsqrt(
            t0 + t1 + 3.0 * alpha_th * alpha_th * gg
        ) / (rho * cp)

        conv = [
            uq[0] * grad_u[i][0] + uq[1] * grad_u[i][1] + uq[2] * grad_u[i][2]
            for i in range(3)
        ]
        r_l = [rho * (duq[i] - fb[i] + conv[i]) + grad_p[i] for i in range(3)]
        ucor = [uq[i] - tau_m * r_l[i] for i in range(3)]
        tmp0 = [
            rho * (duq[i] - fb[i]
                   + ucor[0] * grad_u[i][0] + ucor[1] * grad_u[i][1]
                   + ucor[2] * grad_u[i][2])
            for i in range(3)
        ]
        diag = -pq + rho * tau_c * divu
        # momentum rows: wq*(shl_a*tmp0_i + Σ_j sh_j * tmp1[i][j])
        for i in range(3):
            acc = shl_a * tmp0[i]  # (4, E)
            for j in range(3):
                t1ij = (
                    mu * (grad_u[i][j] + grad_u[j][i])
                    + rho * tau_m * r_l[i] * uq[j]
                    - rho * tau_m * tau_m * r_l[i] * r_l[j]
                )
                if i == j:
                    t1ij = t1ij + diag
                acc = acc + sh[j] * t1ij
            fm[i] = fm[i] + wq * acc
        # continuity
        fc = fc + wq * (
            shl_a * divu
            + tau_m * (sh[0] * r_l[0] + sh[1] * r_l[1] + sh[2] * r_l[2])
        )
        # scalar transport
        shconv = uq[0] * sh[0] + uq[1] * sh[1] + uq[2] * sh[2]  # (4, E)
        adv_phi = dphiq + (uq[0] * grad_phi[0] + uq[1] * grad_phi[1]
                           + uq[2] * grad_phi[2])
        fphi = fphi + wq * adv_phi * (shl_a + tau_phi * shconv)
        adv_t = rho * cp * (dtempq + uq[0] * grad_t[0] + uq[1] * grad_t[1]
                            + uq[2] * grad_t[2])
        ft = ft + wq * (adv_t - srcq) * (shl_a + rho * cp * tau_t * shconv)

    # diffusion term of T (constant gradients: no quadrature loop)
    ft = ft + _GWSUM * kappa * (
        sh[0] * grad_t[0] + sh[1] * grad_t[1] + sh[2] * grad_t[2]
    )

    comps = jnp.stack(fm + [fc, fphi, ft], axis=1)  # (4, 6, E)
    return (comps * det).reshape(24, det.shape[1])


def ns_residual_pallas(
    res_geom: jnp.ndarray,  # (19, ne) from res_geom_rows
    ien_t: jnp.ndarray,  # (4, ne)
    w_alpha: jnp.ndarray,  # (N, 6)
    dw_alpha: jnp.ndarray,  # (N, 6)
    phys: Physics,
    scheme: TimeScheme,
    source: jnp.ndarray | None = None,  # (N,)
    interpret: bool = False,
) -> jnp.ndarray:
    """(ne, 4, 6) element residuals == weakform.ns_residual_elements,
    fused into one Pallas pass."""
    _check_f32_contract(w_alpha.dtype)
    ne = res_geom.shape[1]
    f32 = jnp.float32
    # ONE packed wide row-gather for BOTH states with a FLAT index (the
    # 1-D-index lowering is ~4x faster than x[ien]; utils.xla.take_rows),
    # then component rows via a single transpose each.
    from dedflow_tpu.utils.xla import take_rows

    ien = ien_t.T  # (ne, 4)
    wd = take_rows(
        jnp.concatenate(
            [w_alpha.astype(f32), dw_alpha.astype(f32)], axis=1
        ),
        ien,
    )  # (ne, 4, 12)
    we, dwe = wd[..., :6], wd[..., 6:]
    rows = lambda a: a.transpose(2, 1, 0).reshape(-1, ne)  # (ne,4,k)->(k*4,ne)
    u_t = rows(we[..., :3])  # (12, ne) row i*4+a
    du_t = rows(dwe[..., :3])
    p_t = dwe[..., 3].T  # (4, ne)  (pressure travels in the rate slot)
    phi_t = we[..., 4].T
    temp_t = we[..., 5].T
    dphi_t = dwe[..., 4].T
    dtemp_t = dwe[..., 5].T
    src_t = (
        jnp.zeros((4, ne), f32)
        if source is None
        else take_rows(source.astype(f32), ien).T
    )
    inp = jnp.concatenate(
        [res_geom.astype(f32), u_t, du_t, p_t, phi_t, temp_t, dphi_t,
         dtemp_t, src_t]
    )  # (67, ne)

    ne_pad = (ne + _E - 1) // _E * _E
    if ne_pad != ne:
        inp = jnp.pad(inp, ((0, 0), (0, ne_pad - ne)))
    kern = functools.partial(
        _res_kernel,
        rho=float(phys.rho),
        mu=float(phys.mu),
        cp=float(phys.cp),
        kappa=float(phys.kappa),
        fb=tuple(float(v) for v in phys.body_force),
        dt=float(scheme.dt),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((24, ne_pad), f32),
        grid=(ne_pad // _E,),
        in_specs=[
            pl.BlockSpec((67, _E), lambda k: (0, k), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (24, _E), lambda k: (0, k), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(inp)
    return out[:, :ne].reshape(4, 6, ne).transpose(2, 0, 1)


def lhs_geom_rows(shgrad, det_j, metric, with_metric=False) -> jnp.ndarray:
    """(15, ne) static geometry rows for the LHS kernel: 12 transposed
    shape gradients (row i*4+a), det_j, gg, tr. Precompute once per mesh
    (fem.assembly stores it as ctx.lhs_geom). with_metric appends the 6
    packed metric components (21 rows) for the implicit-scalar tangents
    (their taus use the residual's metric form, weakform.stab_tau)."""
    ne = shgrad.shape[0]
    sh_t = shgrad.transpose(2, 1, 0).reshape(12, ne)
    gg = jnp.sum(metric * metric, axis=(1, 2))[None, :]
    tr = jnp.trace(metric, axis1=1, axis2=2)[None, :]
    rows = [sh_t, det_j[None, :], gg, tr]
    if with_metric:
        m = metric
        rows.append(
            jnp.stack(
                [m[:, 0, 0], m[:, 0, 1], m[:, 0, 2], m[:, 1, 1],
                 m[:, 1, 2], m[:, 2, 2]]
            )
        )
    return jnp.concatenate(rows)


def ns_lhs_packed_pallas(
    geom_rows: jnp.ndarray,  # (15, ne) from lhs_geom_rows
    ien_t: jnp.ndarray,  # (4, ne) transposed connectivity
    w_alpha: jnp.ndarray,  # (N, 6) state (velocity gathered in here)
    phys: Physics,
    scheme: TimeScheme,
    interpret: bool = False,
) -> jnp.ndarray:
    """(ne*16, 18) packed element Jacobians == weakform.ns_lhs_packed
    (frozen-scalar mode); the fused single-pass TPU path."""
    _check_f32_contract(w_alpha.dtype)
    ne = geom_rows.shape[1]
    f32 = jnp.float32
    # ONE wide row-gather (ne, 4, 3) with a flat index (utils.xla.take_rows
    # - the 1-D-index lowering is ~4x faster), then the transpose to
    # (12, ne) rows (i*4+a).
    from dedflow_tpu.utils.xla import take_rows

    ue = take_rows(w_alpha[:, :3].astype(f32), ien_t.T)  # (ne, 4, 3)
    u_t = ue.transpose(2, 1, 0).reshape(12, ne)
    inp = jnp.concatenate(
        [geom_rows[:12].astype(f32), u_t, geom_rows[12:].astype(f32)]
    )

    ne_pad = (ne + _E - 1) // _E * _E
    if ne_pad != ne:
        inp = jnp.pad(inp, ((0, 0), (0, ne_pad - ne)))

    kern = functools.partial(
        _lhs_kernel,
        rho=float(phys.rho),
        mu=float(phys.mu),
        f1=float(scheme.fact_dw),
        f2=float(scheme.fact_w),
        dt=float(scheme.dt),
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((288, ne_pad), f32),
        grid=(ne_pad // _E,),
        in_specs=[
            pl.BlockSpec((27, _E), lambda k: (0, k), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (288, _E), lambda k: (0, k), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(inp)
    # (288, ne) -> (ne, 16, 18) -> (ne*16, 18): one XLA transpose pass
    return out[:, :ne].reshape(16, 18, ne).transpose(2, 0, 1).reshape(ne * 16, 18)


# ---------------------------------------------------------------------------
# Generic row-layout entry points (the lattice fast path, fem.lattice):
# inputs/outputs keep the element axis on LANES; backend "pallas" runs the
# fused Mosaic kernel (f32), backend "xla" runs the identical body as plain
# XLA ops (any dtype - the f64 validation path).


def _pallas_rows_call(kern, inp, out_rows: int, interpret: bool = False):
    """inp (R, M) or slab-major (S, R, M) -> (out_rows, M) / (S, out_rows, M).
    The 3-D form keeps each slab's lane axis independent, so sharded lane
    layouts never require cross-slab gathers (fem.lattice)."""
    if inp.ndim == 3:
        s, r, m = inp.shape
        m_pad = (m + _E - 1) // _E * _E
        r8 = -(-r // 8) * 8  # Mosaic: slicing .at[t] needs 8-aligned rows
        if m_pad != m or r8 != r:
            inp = jnp.pad(inp, ((0, 0), (0, r8 - r), (0, m_pad - m)))

        def kern3(i_ref, o_ref):
            kern(i_ref.at[0], o_ref.at[0])

        out = pl.pallas_call(
            kern3,
            out_shape=jax.ShapeDtypeStruct((s, out_rows, m_pad), jnp.float32),
            grid=(s, m_pad // _E),
            in_specs=[
                pl.BlockSpec(
                    (1, r8, _E), lambda t, k: (t, 0, k), memory_space=pltpu.VMEM
                )
            ],
            out_specs=pl.BlockSpec(
                (1, out_rows, _E),
                lambda t, k: (t, 0, k),
                memory_space=pltpu.VMEM,
            ),
            interpret=interpret,
        )(inp)
        return out[:, :, :m]
    m = inp.shape[1]
    m_pad = (m + _E - 1) // _E * _E
    if m_pad != m:
        inp = jnp.pad(inp, ((0, 0), (0, m_pad - m)))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_rows, m_pad), jnp.float32),
        grid=(m_pad // _E,),
        in_specs=[
            pl.BlockSpec(
                (inp.shape[0], _E), lambda k: (0, k), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (out_rows, _E), lambda k: (0, k), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(inp)
    return out[:, :m]


def lhs_rows_call(
    inp: jnp.ndarray,  # (27|33, M) or (S, 27|33, M)
    phys: Physics,
    scheme: TimeScheme,
    backend: str = "pallas",
    interpret: bool = False,
    scalar_implicit: bool = False,
    comp_major: bool = False,
) -> jnp.ndarray:
    """(27, M) packed element-Jacobian inputs -> (288, M) packed outputs.
    scalar_implicit consumes 33 rows (+6 metric) and emits the implicit
    phi/T transport tangents in comps 16/17 (melt-pool runs).
    comp_major: rows c*16+ab instead of ab*18+c (see _lhs_rows)."""
    args = dict(
        rho=float(phys.rho),
        mu=float(phys.mu),
        f1=float(scheme.fact_dw),
        f2=float(scheme.fact_w),
        dt=float(scheme.dt),
        cp=float(phys.cp),
        kappa=float(phys.kappa),
        scalar_implicit=scalar_implicit,
        comp_major=comp_major,
    )
    if backend == "xla":
        body = functools.partial(_lhs_rows, **args)
        return jax.vmap(body)(inp) if inp.ndim == 3 else body(inp)
    _check_f32_contract(inp.dtype)
    kern = functools.partial(_lhs_kernel, **args)
    return _pallas_rows_call(kern, inp.astype(jnp.float32), 288, interpret)


def res_rows_call(
    inp: jnp.ndarray,  # (67, M) or (S, 67, M)
    phys: Physics,
    scheme: TimeScheme,
    backend: str = "pallas",
    interpret: bool = False,
) -> jnp.ndarray:
    """(67, M) packed residual inputs -> (24, M) element residual rows."""
    args = dict(
        rho=float(phys.rho),
        mu=float(phys.mu),
        cp=float(phys.cp),
        kappa=float(phys.kappa),
        fb=tuple(float(v) for v in phys.body_force),
        dt=float(scheme.dt),
    )
    if backend == "xla":
        body = functools.partial(_res_rows, **args)
        return jax.vmap(body)(inp) if inp.ndim == 3 else body(inp)
    _check_f32_contract(inp.dtype)
    kern = functools.partial(_res_kernel, **args)
    return _pallas_rows_call(kern, inp.astype(jnp.float32), 24, interpret)


# ---------------------------------------------------------------------------
# t8-stacked residual body: all 6 Kuhn slabs in one call.
#
# The per-slab body spends most of its vector-op issues on (1, E) scalar
# chains (tau/r_l/t1ij...) at 1/8 sublane occupancy and (4, E) nodal
# tiles at 1/2. Here the slab index t rides the SUBLANES: scalars are
# (1, 8, E) tiles (rows t, 6 live + 2 zero pad - ONE tile instead of six)
# and nodal quantities are (4, 8, E) (vertex a on the leading non-tiled
# axis). Reductions over a are 3 tile-adds; scalar broadcasts are
# implicit leading-axis broadcasts. Same arithmetic as _res_rows.


def _t8_shl(q, dtype=jnp.float32) -> jnp.ndarray:
    """(4, 8, 1) with SHL[q][a] at [a, t, 0]."""
    a = jax.lax.broadcasted_iota(jnp.int32, (4, 8, 1), 0)
    out = jnp.zeros((4, 8, 1), dtype)
    for ai in range(4):
        out = out + jnp.where(a == ai, jnp.asarray(_SHL[q][ai], dtype), 0.0)
    return out


def _res_rows_t8(inp, *, rho, mu, cp, kappa, fb, dt):
    """(536, E) t8-stacked inputs -> (192, E) element residual rows
    (a*6 + c)*8 + t.

    Input rows: [0:96) sh (i*32 + a*8 + t), [96:104) det (t),
    [104:152) metric6 (k*8 + t), [152:536) state quantities g*32+a*8+t
    with g = [u0,u1,u2,du0,du1,du2,p,phi,T,dphi,dT,src]."""
    f32 = inp.dtype
    e = inp.shape[1]
    n4 = lambda r0: inp[r0 : r0 + 32, :].reshape(4, 8, e)
    s8 = lambda r0: inp[r0 : r0 + 8, :].reshape(1, 8, e)
    sh = [n4(i * 32) for i in range(3)]
    det = s8(96)
    m6 = [s8(104 + k * 8) for k in range(6)]
    base = 152
    g12 = [n4(base + g * 32) for g in range(12)]
    u, du = g12[0:3], g12[3:6]
    p, phi, temp, dphi, dtemp, src = g12[6:12]

    m00, m01, m02, m11, m12, m22 = m6
    gg = (
        m00 * m00 + m11 * m11 + m22 * m22
        + 2.0 * (m01 * m01 + m02 * m02 + m12 * m12)
    )
    tr = m00 + m11 + m22
    tr = jnp.where(tr > 0.0, tr, 1.0)
    nu = mu / rho
    alpha_th = kappa / (rho * cp)
    t0 = 4.0 / (dt * dt)

    red4 = lambda x: jnp.sum(x, axis=0, keepdims=True)  # (4,8,E)->(1,8,E)
    dot8 = lambda nodal, grad: red4(nodal * grad)

    grad_u = [[dot8(u[i], sh[j]) for j in range(3)] for i in range(3)]
    grad_p = [dot8(p, sh[i]) for i in range(3)]
    grad_phi = [dot8(phi, sh[i]) for i in range(3)]
    grad_t = [dot8(temp, sh[i]) for i in range(3)]
    divu = grad_u[0][0] + grad_u[1][1] + grad_u[2][2]

    fm = [jnp.zeros((4, 8, e), f32) for _ in range(3)]
    fc = jnp.zeros((4, 8, e), f32)
    fphi = jnp.zeros((4, 8, e), f32)
    ft = jnp.zeros((4, 8, e), f32)
    for q in range(4):
        wq = float(_GW[q])
        shl_a = _t8_shl(q, f32)  # (4, 8, 1)
        qval = lambda nodal: red4(shl_a * nodal)
        uq = [qval(u[i]) for i in range(3)]
        duq = [qval(du[i]) for i in range(3)]
        pq = qval(p)
        dphiq = qval(dphi)
        dtempq = qval(dtemp)
        srcq = qval(src)

        t1 = (
            m00 * uq[0] * uq[0] + m11 * uq[1] * uq[1] + m22 * uq[2] * uq[2]
            + 2.0 * (m01 * uq[0] * uq[1] + m02 * uq[0] * uq[2]
                     + m12 * uq[1] * uq[2])
        )
        tau_m = jax.lax.rsqrt(t0 + t1 + 3.0 * nu * nu * gg) / rho
        tau_c = jnp.sqrt(t1 + 3.0 * nu * nu * gg) / tr
        tau_phi = jax.lax.rsqrt(t0 + t1)
        tau_t = jax.lax.rsqrt(
            t0 + t1 + 3.0 * alpha_th * alpha_th * gg
        ) / (rho * cp)

        conv = [
            uq[0] * grad_u[i][0] + uq[1] * grad_u[i][1] + uq[2] * grad_u[i][2]
            for i in range(3)
        ]
        r_l = [rho * (duq[i] - fb[i] + conv[i]) + grad_p[i] for i in range(3)]
        ucor = [uq[i] - tau_m * r_l[i] for i in range(3)]
        tmp0 = [
            rho * (duq[i] - fb[i]
                   + ucor[0] * grad_u[i][0] + ucor[1] * grad_u[i][1]
                   + ucor[2] * grad_u[i][2])
            for i in range(3)
        ]
        diag = -pq + rho * tau_c * divu
        for i in range(3):
            acc = shl_a * tmp0[i]  # (4,8,E)
            for j in range(3):
                t1ij = (
                    mu * (grad_u[i][j] + grad_u[j][i])
                    + rho * tau_m * r_l[i] * uq[j]
                    - rho * tau_m * tau_m * r_l[i] * r_l[j]
                )
                if i == j:
                    t1ij = t1ij + diag
                acc = acc + sh[j] * t1ij
            fm[i] = fm[i] + wq * acc
        fc = fc + wq * (
            shl_a * divu
            + tau_m * (sh[0] * r_l[0] + sh[1] * r_l[1] + sh[2] * r_l[2])
        )
        shconv = uq[0] * sh[0] + uq[1] * sh[1] + uq[2] * sh[2]
        adv_phi = dphiq + (uq[0] * grad_phi[0] + uq[1] * grad_phi[1]
                           + uq[2] * grad_phi[2])
        fphi = fphi + wq * adv_phi * (shl_a + tau_phi * shconv)
        adv_t = rho * cp * (dtempq + uq[0] * grad_t[0] + uq[1] * grad_t[1]
                            + uq[2] * grad_t[2])
        ft = ft + wq * (adv_t - srcq) * (shl_a + rho * cp * tau_t * shconv)

    ft = ft + _GWSUM * kappa * (
        sh[0] * grad_t[0] + sh[1] * grad_t[1] + sh[2] * grad_t[2]
    )

    comps = jnp.stack(fm + [fc, fphi, ft], axis=1)  # (4, 6, 8, E)
    return (comps * det[:, None]).reshape(192, e)


def _lhs_chunk(inp, a, *, rho, mu, f1, f2, dt):
    """Per-vertex-a slice of the element Jacobian: (27, E) -> (72, E),
    rows b*18 + c == rows (a*4+b)*18 + c of _lhs_rows. Identical math on
    the b-indexed (4, E) sublane tiles; exists so the fused window kernel
    (fem.lattice._lhs_fused_kernel) can emit one vertex chunk at a time
    and fit 2x larger lane blocks in VMEM (halving halo recompute)."""
    f32 = inp.dtype
    sh = [inp[4 * i : 4 * (i + 1), :] for i in range(3)]  # i -> (4, E)
    u = [inp[12 + 4 * i : 12 + 4 * (i + 1), :] for i in range(3)]
    det = inp[24:25, :]  # (1, E)
    gg = inp[25:26, :]
    tr = inp[26:27, :]

    knu = mu / rho
    visc2 = 3.0 * knu * knu
    tr_safe = jnp.where(tr > 0.0, tr, 1.0)

    mass_a = _node_const([_MASS[a, b] for b in range(4)], f32)  # (4, 1)

    tmp = jnp.broadcast_to(f1 * rho * mass_a, (4, det.shape[1])).astype(f32)
    gs_conv = jnp.zeros_like(sh[0])  # (4, E)
    gs_shl = jnp.zeros_like(sh[0])
    tau0_sum = jnp.zeros_like(det)
    c_grad2 = jnp.zeros_like(det)
    for q in range(4):
        uq = [
            sum(float(_SHL[q][aa]) * u[i][aa : aa + 1, :] for aa in range(4))
            for i in range(3)
        ]
        shconv = uq[0] * sh[0] + uq[1] * sh[1] + uq[2] * sh[2]  # (4, E)
        adv2 = jnp.sum(shconv[1:4, :] ** 2, axis=0, keepdims=True)
        tau0 = jax.lax.rsqrt(4.0 / (dt * dt) + adv2 + visc2 * gg) / rho
        tau1 = jnp.sqrt(adv2 + visc2 * gg) / tr_safe
        gwq = float(_GW[q])
        shl_b = _node_const(_SHL[q], f32)  # (4, 1)
        conv_a = shconv[a : a + 1, :]  # (1, E): pair rows share vertex a
        conv_b = shconv  # (4, E)
        shl_a = float(_SHL[q][a])
        tmp = tmp + (
            (f1 * rho * rho * gwq) * tau0 * conv_a * shl_b
            + (f2 * rho * gwq) * shl_a * conv_b
            + (f2 * rho * rho * gwq) * tau0 * conv_a * conv_b
        )
        gs_conv = gs_conv + gwq * tau0 * shconv
        gs_shl = gs_shl + gwq * tau0 * shl_b
        tau0_sum = tau0_sum + gwq * tau0
        c_grad2 = c_grad2 + (f2 * rho * gwq) * tau1

    sh_a = [sh[i][a : a + 1, :] for i in range(3)]  # (1, E)
    sh_b = sh  # (4, E)
    e_k = sh_a[0] * sh_b[0] + sh_a[1] * sh_b[1] + sh_a[2] * sh_b[2]
    tmp = tmp + (f2 * mu * _GWSUM) * e_k
    gsconv_a = gs_conv[a : a + 1, :]
    gsconv_b = gs_conv
    gsshl_b = gs_shl
    gwshl_a = float(_GWSHL[a])
    gwshl_b = _node_const(_GWSHL, f32)
    eye_a = _node_const(
        [1.0 if b == a else 0.0 for b in range(4)], f32
    )

    comps = [None] * 18
    for i in range(3):
        for j in range(3):
            c = (f2 * mu * _GWSUM) * sh_a[j] * sh_b[i] + c_grad2 * sh_a[i] * sh_b[j]
            if i == j:
                c = c + tmp
            comps[i * 3 + j] = c * det
    for i in range(3):
        comps[9 + i] = (-sh_a[i] * gwshl_b + rho * gsconv_a * sh_b[i]) * det
        comps[12 + i] = (
            (f1 * rho) * sh_a[i] * gsshl_b
            + f2 * gwshl_a * sh_b[i]
            + (f2 * rho) * sh_a[i] * gsconv_b
        ) * det
    comps[15] = tau0_sum * e_k * det
    ident = eye_a * (det > 0.0).astype(f32)
    comps[16] = jnp.broadcast_to(ident, e_k.shape)
    comps[17] = comps[16]

    stacked = jnp.stack(comps, axis=1)  # (4, 18, E)
    return stacked.reshape(72, det.shape[1])
