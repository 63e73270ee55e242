"""Independent scalar-loop transcription of the reference element kernels.

Used only by tests as an oracle for the vectorized implementations in
dedflow_tpu.fem.weakform / fem.face. Written directly from the CUDA
kernel structure (assemble.cu) with explicit loops - deliberately NOT
sharing any code with the package - so einsum/index errors in the
vectorized path cannot cancel here.
"""

import numpy as np

A_ = 0.5854101966249685
B_ = 0.1381966011250105
GW = np.full(4, 0.0416666666666667)
# SHL[q][a]
SHL = np.array(
    [
        [A_, B_, B_, B_],
        [B_, A_, B_, B_],
        [B_, B_, A_, B_],
        [B_, B_, B_, A_],
    ]
)
GWB = np.full(3, 0.1666666666666667)
c = 0.1666666666666667
d = 0.6666666666666667
SHLB = np.array(
    [
        [[0, c, c, d], [0, c, d, c], [0, d, c, c]],
        [[c, 0, c, d], [c, 0, d, c], [d, 0, c, c]],
        [[d, c, 0, c], [c, d, 0, c], [c, c, 0, d]],
        [[c, d, c, 0], [c, c, d, 0], [d, c, c, 0]],
    ],
    dtype=float,
)
NV_REF = np.array([[1, 1, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1]], dtype=float)


def element_geometry(x):
    """x: (4,3) -> (invJ, detJ, shgrad(4,3), G(3,3))."""
    j = np.stack([x[1] - x[0], x[2] - x[0], x[3] - x[0]], axis=1)
    invj = np.linalg.inv(j)
    detj = abs(np.linalg.det(j))
    shgrad = np.zeros((4, 3))
    for a in range(1, 4):
        shgrad[a] = invj[a - 1]
    shgrad[0] = -shgrad[1:].sum(axis=0)
    g = invj @ invj.T
    return invj, detj, shgrad, g


def get_stab_tau(g, uadv, rho, cp, mu, kappa, dt):
    """assemble.cu:444-484."""
    t0 = 4.0 / (dt * dt)
    t1 = 0.0
    t2 = 0.0
    for i in range(3):
        for j in range(3):
            t1 += g[i, j] * uadv[i] * uadv[j]
            t2 += g[i, j] * g[i, j]
    nu = mu / rho
    al = kappa / (rho * cp)
    tau = np.zeros(4)
    tau[0] = 1.0 / np.sqrt(t0 + t1 + 3 * nu * nu * t2) / rho
    tau[1] = np.sqrt(t1 + 3 * nu * nu * t2) / (g[0, 0] + g[1, 1] + g[2, 2])
    tau[2] = 1.0 / np.sqrt(t0 + t1)
    tau[3] = 1.0 / np.sqrt(t0 + t1 + 3 * al * al * t2) / (rho * cp)
    return tau


def ns_residual_element(x, u_e, p_e, phi_e, t_e, du_e, dphi_e, dt_e, rho, mu, cp, kappa, dt, fb):
    """One element's (4,6) residual (AssembleWeakFormKernel TENSOR=1,
    assemble.cu:761-924)."""
    _, detj, shgrad, g = element_geometry(x)
    f = np.zeros((4, 6))
    # constant gradients
    grad_u = np.zeros((3, 3))
    for i in range(3):
        for j in range(3):
            for a in range(4):
                grad_u[i, j] += u_e[a, i] * shgrad[a, j]
    grad_p = np.zeros(3)
    grad_phi = np.zeros(3)
    grad_t = np.zeros(3)
    for i in range(3):
        for a in range(4):
            grad_p[i] += p_e[a] * shgrad[a, i]
            grad_phi[i] += phi_e[a] * shgrad[a, i]
            grad_t[i] += t_e[a] * shgrad[a, i]
    divu = grad_u[0, 0] + grad_u[1, 1] + grad_u[2, 2]

    for q in range(4):
        uadv = SHL[q] @ u_e  # (3,)
        duq = SHL[q] @ du_e
        pq = SHL[q] @ p_e
        dphiq = SHL[q] @ dphi_e
        dtq = SHL[q] @ dt_e
        rl = np.zeros(3)
        for i in range(3):
            rl[i] = rho * (duq[i] - fb[i])
            for j in range(3):
                rl[i] += rho * uadv[j] * grad_u[i, j]
            rl[i] += grad_p[i]
        tau = get_stab_tau(g, uadv, rho, cp, mu, kappa, dt)
        shconv = np.zeros(4)
        for a in range(4):
            for i in range(3):
                shconv[a] += uadv[i] * shgrad[a, i]
        tmp0 = np.zeros(3)
        for i in range(3):
            tmp0[i] = rho * (duq[i] - fb[i])
            for j in range(3):
                tmp0[i] += rho * (uadv[j] - tau[0] * rl[j]) * grad_u[i, j]
        tmp1 = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                tmp1[i, j] = mu * (grad_u[i, j] + grad_u[j, i])
                tmp1[i, j] += rho * tau[0] * rl[i] * uadv[j]
                tmp1[i, j] -= rho * tau[0] ** 2 * rl[i] * rl[j]
        for i in range(3):
            tmp1[i, i] += -pq + rho * tau[1] * divu
        for a in range(4):
            for i in range(3):
                bm = SHL[q, a] * tmp0[i]
                for j in range(3):
                    bm += shgrad[a, j] * tmp1[i, j]
                f[a, i] += bm * GW[q] * detj
            bc = SHL[q, a] * divu
            for i in range(3):
                bc += tau[0] * rl[i] * shgrad[a, i]
            f[a, 3] += bc * GW[q] * detj
            bp = dphiq
            for i in range(3):
                bp += uadv[i] * grad_phi[i]
            f[a, 4] += bp * (SHL[q, a] + tau[2] * shconv[a]) * GW[q] * detj
            bt = dtq
            for i in range(3):
                bt += uadv[i] * grad_t[i]
            bt = rho * cp * bt * (SHL[q, a] + rho * cp * tau[3] * shconv[a])
            for i in range(3):
                bt += kappa * grad_t[i] * shgrad[a, i]
            f[a, 5] += bt * GW[q] * detj
    return f


def ns_lhs_element(x, u_e, rho, mu, dt, f1, f2):
    """One element's (4,4,6,6) LHS (AssembleWeakFormLHSKernel,
    assemble.cu:495-759, the shared-memory variant actually used)."""
    _, detj, shgrad, g = element_geometry(x)
    jmat = np.zeros((4, 4, 6, 6))
    gg = np.sum(g * g)
    tr = g[0, 0] + g[1, 1] + g[2, 2]
    knu = mu / rho
    for q in range(4):
        uadv = SHL[q] @ u_e
        shconv = np.zeros(4)
        for a in range(4):
            for i in range(3):
                shconv[a] += uadv[i] * shgrad[a, i]
        adv2 = shconv[1] ** 2 + shconv[2] ** 2 + shconv[3] ** 2
        tau0 = 1.0 / np.sqrt(4.0 / (dt * dt) + adv2 + 3 * knu * knu * gg) / rho
        tau1 = np.sqrt(adv2 + 3 * knu * knu * gg) / tr
        dg = detj * GW[q]
        for a in range(4):
            for b in range(4):
                ek = shgrad[a] @ shgrad[b]
                tmp = (
                    f1 * rho * SHL[q, a] * SHL[q, b]
                    + f1 * rho * rho * tau0 * shconv[a] * SHL[q, b]
                    + f2 * SHL[q, a] * rho * shconv[b]
                    + f2 * tau0 * rho * shconv[a] * rho * shconv[b]
                    + f2 * mu * ek
                )
                for i in range(3):
                    jmat[a, b, i, i] += tmp * dg
                for i in range(3):
                    for j in range(3):
                        jmat[a, b, i, j] += f2 * mu * shgrad[a, j] * shgrad[b, i] * dg
                        jmat[a, b, i, j] += f2 * rho * tau1 * shgrad[a, i] * shgrad[b, j] * dg
                for i in range(3):
                    jmat[a, b, i, 3] -= shgrad[a, i] * SHL[q, b] * dg
                    jmat[a, b, i, 3] += rho * tau0 * shconv[a] * shgrad[b, i] * dg
                for i in range(3):
                    jmat[a, b, 3, i] += f1 * rho * tau0 * shgrad[a, i] * SHL[q, b] * dg
                    jmat[a, b, 3, i] += f2 * SHL[q, a] * shgrad[b, i] * dg
                    jmat[a, b, 3, i] += f2 * tau0 * shgrad[a, i] * rho * shconv[b] * dg
                jmat[a, b, 3, 3] += tau0 * ek * dg
    for a in range(4):
        jmat[a, a, 4, 4] = 1.0
        jmat[a, a, 5, 5] = 1.0
    return jmat


def face_residual_element(x, forn, u_e, p_e, rho, mu):
    """One facet's (4,6) residual (FaceAssemblyKernel F-part,
    assemble.cu:1054-1126)."""
    invj, detj, shgrad, g = element_geometry(x)
    nv = detj * (invj.T @ NV_REF[forn])
    a_vec = invj @ nv
    tau_b = 4.0 * mu * np.linalg.norm(a_vec)
    grad_u = np.zeros((3, 3))
    for i in range(3):
        for j in range(3):
            for a in range(4):
                grad_u[i, j] += u_e[a, i] * shgrad[a, j]
    f = np.zeros((4, 6))
    for q in range(3):
        shb = SHLB[forn, q]
        uq = shb @ u_e
        pq = shb @ p_e
        unor = uq @ nv
        uneg = 0.5 * (unor - abs(unor))
        tmp0 = np.zeros(3)
        for i in range(3):
            tmp0[i] = nv[i] * pq
            for j in range(3):
                tmp0[i] -= mu * nv[j] * grad_u[i, j]
                tmp0[i] -= mu * nv[j] * grad_u[j, i]
            tmp0[i] -= rho * uneg * uq[i]
            tmp0[i] += tau_b * uq[i]
        tmp1 = np.zeros((3, 3))
        for i in range(3):
            for j in range(3):
                tmp1[i, j] = -mu * (nv[i] * uq[j] + nv[j] * uq[i])
        for a in range(4):
            for i in range(3):
                bm = shb[a] * tmp0[i]
                for j in range(3):
                    bm += shgrad[a, j] * tmp1[i, j]
                f[a, i] += bm * GWB[q]
            f[a, 3] -= shb[a] * unor * GWB[q]
    return f


def face_lhs_element(x, forn, u_e, rho, mu, f2):
    """One facet's (4,4,6,6) LHS (FaceAssemblyKernel J-part,
    assemble.cu:1127-1193)."""
    invj, detj, shgrad, g = element_geometry(x)
    nv = detj * (invj.T @ NV_REF[forn])
    a_vec = invj @ nv
    tau_b = 4.0 * mu * np.linalg.norm(a_vec)
    shnorm = shgrad @ nv
    jmat = np.zeros((4, 4, 6, 6))
    for q in range(3):
        shb = SHLB[forn, q]
        uq = shb @ u_e
        unor = uq @ nv
        uneg = 0.5 * (unor - abs(unor))
        for a in range(4):
            for b in range(4):
                t0 = -mu * (shnorm[b] * shb[a] + shnorm[a] * shb[b])
                t0 -= rho * shb[a] * shb[b] * uneg
                t0 += tau_b * shb[a] * shb[b]
                for i in range(3):
                    jmat[a, b, i, i] += f2 * t0 * GWB[q]
                for i in range(3):
                    for j in range(3):
                        tt = -mu * shb[a] * shgrad[b, i] * nv[j]
                        tt -= mu * shb[b] * shgrad[a, j] * nv[i]
                        jmat[a, b, i, j] += f2 * tt * GWB[q]
                tab = shb[a] * shb[b]
                for i in range(3):
                    jmat[a, b, 3, i] -= f2 * tab * nv[i] * GWB[q]
                    jmat[a, b, i, 3] += tab * nv[i] * GWB[q]
    return jmat
