"""Pairwise spring-dashpot contact forces over padded candidate lists.

Model: linear normal spring + normal dashpot + Coulomb-capped tangential
damping (the standard soft-sphere DEM force; the reference has no contact
implementation to mirror - Particle.c:120-130 - so the model is set by
BASELINE config #4 "cell-list contact forces").

For particle i with candidate j:
  n      = (x_i - x_j) / |x_i - x_j|          (away from j)
  delta  = r_i + r_j - |x_i - x_j|            (>0 when touching)
  v_rel  = v_i - v_j
  F_n    = ( k_n * delta - gamma_n * (v_rel . n) ) n
  v_t    = v_rel - (v_rel . n) n
  F_t    = -min(mu * |F_n|, gamma_t * |v_t|) * v_t / |v_t|

Each particle sums forces over its own candidates, so Newton's third law
holds by symmetry of the candidate relation. Wall contacts treat the six
box faces as unit-mass half-space springs with the same parameters.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class ContactParams:
    k_n: float = 1.0e4  # normal stiffness
    gamma_n: float = 10.0  # normal damping
    mu: float = 0.0  # Coulomb friction coefficient (0 = frictionless)
    gamma_t: float = 0.0  # tangential damping
    eps: float = 1.0e-12


def pair_forces(
    x: jnp.ndarray,  # (P, 3)
    v: jnp.ndarray,  # (P, 3)
    radius: jnp.ndarray,  # (P,)
    cand: jnp.ndarray,  # (P, M) candidate indices; P = empty slot
    prm: ContactParams,
) -> jnp.ndarray:
    """(P, 3) net contact force per particle.

    Component-wise (coordinates unrolled in Python): every array stays
    (P, M), never (P, M, 3) - TPU tile layouts pad a trailing dim of 3 to
    128 lanes (~43x memory), which OOMs at 100k particles.
    """
    p = x.shape[0]
    dtype = x.dtype
    idx = jnp.arange(p, dtype=cand.dtype)
    valid = (cand < p) & (cand != idx[:, None])  # (P, M)
    j = jnp.minimum(cand, p - 1)  # safe gather index

    d = [x[:, c][:, None] - x[:, c][j] for c in range(3)]  # away from j
    v_rel = [v[:, c][:, None] - v[:, c][j] for c in range(3)]
    rj = radius[j]
    dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    dist = jnp.sqrt(jnp.maximum(dist2, prm.eps))
    n = [d[c] / dist for c in range(3)]
    delta = radius[:, None] + rj - dist
    active = valid & (delta > 0.0)
    af = active.astype(dtype)

    vn = v_rel[0] * n[0] + v_rel[1] * n[1] + v_rel[2] * n[2]  # (P, M)
    fn_mag = prm.k_n * delta - prm.gamma_n * vn
    w = af * fn_mag
    f = [w * n[c] for c in range(3)]

    if prm.mu > 0.0 and prm.gamma_t > 0.0:
        vt = [v_rel[c] - vn * n[c] for c in range(3)]
        vt2 = vt[0] * vt[0] + vt[1] * vt[1] + vt[2] * vt[2]
        vt_norm = jnp.sqrt(jnp.maximum(vt2, prm.eps))
        ft = af * jnp.minimum(prm.mu * jnp.abs(fn_mag), prm.gamma_t * vt_norm)
        f = [f[c] - ft / vt_norm * vt[c] for c in range(3)]
    return jnp.stack([jnp.sum(f[c], axis=1) for c in range(3)], axis=-1)


def wall_forces(
    x: jnp.ndarray,
    v: jnp.ndarray,
    radius: jnp.ndarray,
    lo,
    hi,
    prm: ContactParams,
) -> jnp.ndarray:
    """(P, 3) forces from the six planes of the box [lo, hi]."""
    dtype = x.dtype
    lo = jnp.asarray(lo, dtype=dtype)
    hi = jnp.asarray(hi, dtype=dtype)
    f = jnp.zeros_like(x)
    for axis in range(3):
        e = jnp.zeros((3,), dtype=dtype).at[axis].set(1.0)
        # lower wall: outward normal +e
        delta_lo = radius - (x[:, axis] - lo[axis])
        act = (delta_lo > 0).astype(dtype)
        fmag = prm.k_n * delta_lo - prm.gamma_n * v[:, axis]
        f = f + (act * fmag)[:, None] * e[None]
        # upper wall: outward normal -e
        delta_hi = radius - (hi[axis] - x[:, axis])
        act = (delta_hi > 0).astype(dtype)
        fmag = prm.k_n * delta_hi + prm.gamma_n * v[:, axis]
        f = f - (act * fmag)[:, None] * e[None]
    return f


def brute_force_pairs(x, v, radius, prm: ContactParams) -> jnp.ndarray:
    """O(P^2) oracle for tests: candidates = everyone."""
    p = x.shape[0]
    cand = jnp.broadcast_to(jnp.arange(p, dtype=jnp.int32)[None], (p, p))
    return pair_forces(x, v, radius, cand, prm)
