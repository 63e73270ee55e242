"""Newton + generalized-alpha time stepping for the coupled NS system.

Reproduces SolveFlowSystem (main.c:77-283) and the time loop
(main.c:535-592):

  predict:   dwg[vel,phi,T] *= (gamma-1)/gamma          (main.c:544-545)
  newton<=4: assemble J; GMRES(J) dx = F; dwg -= dx;
             rebuild alpha states; assemble F; converge
             when all 4 field rel-norms < 0.5e-3        (main.c:157-279)
  update:    wgold[vel,phi,T] += dt((1-g) dwgold + g dwg);
             dwgold = dwg                               (main.c:561-565)

TPU-native structure: each Newton iteration (J assembly + full GMRES +
residual reassembly + norms) is ONE jitted function with zero host
round-trips inside; only the 4 per-field norms cross to the host between
Newton iterations, exactly the sync granularity of the reference
(main.c:262-265). A fully-jitted fixed-iteration step (`step_fixed`) is
provided for benchmarking and sharded execution.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from dedflow_tpu.config import SolverConfig
from dedflow_tpu.fem import dirichlet as dbc
from dedflow_tpu.fem import ns
from dedflow_tpu.fem.assembly import build_context
from dedflow_tpu.fem.face import build_face_context
from dedflow_tpu.mesh.mesh import Mesh
from dedflow_tpu.solver.krylov import gmres
from dedflow_tpu.solver.pc import NSFieldSplitPC
from dedflow_tpu.sparse.topology import build_sparsity


@dataclass
class NewtonStats:
    rnorm0: np.ndarray  # (4,)
    rnorms: list  # list of (4,) per iteration
    krylov_iters: list
    converged: bool


class NSSolver:
    """Owns device contexts and jitted kernels for one mesh + config."""

    def __init__(self, mesh: Mesh, cfg: SolverConfig, dtype=None):
        self.mesh = mesh
        self.cfg = cfg
        self.sparsity = build_sparsity(mesh.ien, mesh.num_node)
        self.ctx = build_context(mesh, self.sparsity, dtype=dtype)
        dtype = self.ctx.xg.dtype
        self.dtype = dtype
        self.face_ctxs = tuple(
            build_face_context(mesh, self.ctx, self.sparsity, bc.boundary)
            for bc in cfg.bcs
            if bc.weak
        )
        strong = [
            dbc.StrongBC(bc.boundary, tuple(bc.strong_components))
            for bc in cfg.bcs
            if bc.strong_components
        ]
        self.mask = jnp.asarray(dbc.build_mask(mesh, strong, 6))

        phys, scheme = cfg.physics, cfg.time
        kcfg = cfg.krylov

        def _residual(wgold, dwgold, dwg):
            wa, dwa = ns.alpha_states(wgold, dwgold, dwg, scheme)
            f = ns.assemble_residual(
                self.ctx,
                self.face_ctxs,
                self.mask,
                wa,
                dwa,
                phys,
                scheme,
                cfg.freeze_phi_temperature,
            )
            return f

        def _newton_iter(wgold, dwgold, dwg, f):
            wa, dwa = ns.alpha_states(wgold, dwgold, dwg, scheme)
            jmat = ns.assemble_jacobian(
                self.ctx, self.face_ctxs, self.mask, wa, dwa, phys, scheme
            )
            pc = NSFieldSplitPC.from_bsr(jmat)
            sol = gmres(
                jmat.matvec,
                f,
                maxit=kcfg.max_iter,
                atol=kcfg.atol,
                rtol=kcfg.rtol,
                pc=pc,
            )
            dwg = dwg - sol.x  # main.c:226
            f = _residual(wgold, dwgold, dwg)
            return dwg, f, ns.field_norms(f), sol.iters

        def _predict(dwg):
            fac = (scheme.gamma - 1.0) / scheme.gamma  # main.c:535
            dwg = dwg.at[:, :3].multiply(fac)
            dwg = dwg.at[:, 4:].multiply(fac)
            return dwg

        def _update(wgold, dwgold, dwg):
            g, dt = scheme.gamma, scheme.dt
            incr = dt * ((1.0 - g) * dwgold + g * dwg)
            wgold = wgold.at[:, :3].add(incr[:, :3])
            wgold = wgold.at[:, 4:].add(incr[:, 4:])
            return wgold, dwg  # dwgold <- dwg (main.c:565)

        self._residual = jax.jit(_residual)
        self._norms = jax.jit(lambda f: ns.field_norms(f))
        self._newton_iter = jax.jit(_newton_iter)
        self._predict = jax.jit(_predict)
        self._update = jax.jit(_update)

        def _step_fixed(wgold, dwgold, dwg, num_newton: int):
            dwg = _predict(dwg)
            f = _residual(wgold, dwgold, dwg)

            def body(_, carry):
                dwg, f = carry
                dwg, f, _, _ = _newton_iter(wgold, dwgold, dwg, f)
                return dwg, f

            dwg, f = jax.lax.fori_loop(0, num_newton, body, (dwg, f))
            new_wgold, new_dwgold = _update(wgold, dwgold, dwg)
            return new_wgold, new_dwgold, dwg

        self._step_fixed = jax.jit(_step_fixed, static_argnums=3)

    # ------------------------------------------------------------------
    def newton_solve(
        self, wgold: jnp.ndarray, dwgold: jnp.ndarray, dwg: jnp.ndarray
    ) -> tuple[jnp.ndarray, NewtonStats]:
        """Adaptive Newton loop with host-side convergence check
        (reference semantics, main.c:157-279)."""
        ncfg = self.cfg.newton
        f = self._residual(wgold, dwgold, dwg)
        rnorm0 = np.asarray(self._norms(f)) + 1e-16  # main.c:152-155
        stats = NewtonStats(rnorm0=rnorm0, rnorms=[], krylov_iters=[], converged=False)
        for _ in range(ncfg.max_iter):
            dwg, f, rn, kit = self._newton_iter(wgold, dwgold, dwg, f)
            rn = np.asarray(rn)
            stats.rnorms.append(rn)
            stats.krylov_iters.append(int(kit))
            if ((rn < ncfg.rtol * rnorm0) | (rn < ncfg.atol)).all():  # main.c:271-276
                stats.converged = True
                break
        return dwg, stats

    def step(
        self, wgold: jnp.ndarray, dwgold: jnp.ndarray, dwg: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, NewtonStats]:
        """One generalized-alpha time step (predict/newton/update)."""
        dwg = self._predict(dwg)
        dwg, stats = self.newton_solve(wgold, dwgold, dwg)
        wgold, dwgold = self._update(wgold, dwgold, dwg)
        return wgold, dwgold, dwg, stats

    def step_fixed(self, wgold, dwgold, dwg, num_newton: int = 4):
        """Fully-jitted step with a fixed Newton iteration count."""
        return self._step_fixed(wgold, dwgold, dwg, num_newton)
