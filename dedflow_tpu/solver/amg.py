"""Algebraic multigrid for the pressure Schur block on IRREGULAR meshes.

The reference's AmgX option is *algebraic*: it preconditions any CSR
matrix with no geometry (pc.c:160-235). `solver.mg` covers the lattice /
translation-class tiers with static-slice geometric multigrid; this
module covers everything else - the WinELL windowed path (Delaunay-class
meshes) and the general gather path - with unsmoothed-aggregation AMG
whose every setup product is a PRECOMPUTED index map:

- **Aggregation is free.** Meshes on the irregular path are RCM-reordered
  (mesh.reorder, the windowed kernels' locality contract), so 8
  consecutive rows are spatially adjacent; the aggregate of row i is
  simply i // 8. Restriction = reshape-sum, prolongation = repeat -
  zero gathers, exactly like the lattice tier's 2x2x2 blocks.
- **Galerkin RAP is one sorted segment-sum.** With piecewise-constant
  P, (R A P)[I, J] = sum of fine entries (i, j) with (i//8, j//8) =
  (I, J). The fine-entry -> coarse-entry map depends only on the
  PATTERN, so it is computed once on the host (np.unique) and the
  per-Newton-assembly coarsening is `segment_sum(vals[perm], tgt)`.
- **Level matvec** is the generic irregular primitive: one (E,) value
  gather of x at the column ids + one sorted segment-sum over rows.

The hierarchy rebuilds from the current A_pp values at every PC
construction (like AmgX resetup); only values move - all indices are
static. The Schur wrapper (`AMGSchurPCT`) mirrors solver.mg.MGSIMPLEPCT:
SIMPLE velocity predictor/corrector + V-cycle-preconditioned Richardson
on S_hat = A_pp - A_pu inv(D_u) A_up, with the compact per-entry
component arrays gathered once from the WinELL value store.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np

_B = 8  # aggregate size (consecutive rows in RCM order)


# ---------------------------------------------------------------------------
# host-side plan


@dataclass(frozen=True, eq=False)
class AMGLevelPlan:
    """Static index maps of one level (host NumPy; uploaded by the PC)."""

    n: int  # rows
    col: np.ndarray  # (E,) int32 column ids
    rowseg: np.ndarray  # (E,) int32 row ids, nondecreasing
    diag_mask: np.ndarray  # (E,) f32 1.0 where col == row
    # fine -> coarse entry map (None on the coarsest level)
    f2c_perm: np.ndarray | None  # (E,) int32 sort-by-coarse-entry order
    f2c_tgt: np.ndarray | None  # (E,) int32 coarse entry id, sorted
    nc: int = 0  # coarse rows
    ec: int = 0  # coarse entries


def build_amg_plan(
    row: np.ndarray,
    col: np.ndarray,
    n: int,
    min_nodes: int = 2048,
    max_levels: int = 6,
) -> tuple[AMGLevelPlan, ...]:
    """Level plans from a flat entry list (row, col). `row` must be
    nondecreasing (CSR order / ELL row-major). Duplicate (row, col)
    entries are allowed (ELL pads): they are additive, like the matvec."""
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    levels = []
    while True:
        last = n <= min_nodes or len(levels) + 1 >= max_levels
        lv = dict(
            n=n,
            col=col.astype(np.int32),
            rowseg=row.astype(np.int32),
            diag_mask=(row == col).astype(np.float32),
            f2c_perm=None,
            f2c_tgt=None,
        )
        if last:
            levels.append(AMGLevelPlan(**lv))
            break
        nc = -(-n // _B)
        key = (row // _B) * nc + (col // _B)
        uk, inv = np.unique(key, return_inverse=True)
        perm = np.argsort(inv, kind="stable")
        lv["f2c_perm"] = perm.astype(np.int32)
        lv["f2c_tgt"] = inv[perm].astype(np.int32)
        lv["nc"] = nc
        lv["ec"] = uk.size
        levels.append(AMGLevelPlan(**lv))
        row, col = uk // nc, uk % nc  # sorted row-major => rowseg sorted
        n = nc
    return tuple(levels)


# ---------------------------------------------------------------------------
# device-side hierarchy


@jax.tree_util.register_dataclass
@dataclass
class AMGIndices:
    """Uploaded static index maps (shared across Newton re-assemblies)."""

    col: tuple  # per level (E,) i32
    rowseg: tuple  # per level (E,) i32
    diag_mask: tuple  # per level (E,) f32
    f2c_perm: tuple  # per non-coarsest level (E,) i32
    f2c_tgt: tuple  # per non-coarsest level (E,) i32
    ns: tuple = dataclass_field(metadata=dict(static=True))  # rows per level
    ecs: tuple = dataclass_field(metadata=dict(static=True))  # coarse entries

    @staticmethod
    def from_plan(plans: tuple[AMGLevelPlan, ...]) -> "AMGIndices":
        return AMGIndices(
            col=tuple(jnp.asarray(p.col) for p in plans),
            rowseg=tuple(jnp.asarray(p.rowseg) for p in plans),
            diag_mask=tuple(jnp.asarray(p.diag_mask) for p in plans),
            f2c_perm=tuple(
                jnp.asarray(p.f2c_perm) for p in plans if p.f2c_perm is not None
            ),
            f2c_tgt=tuple(
                jnp.asarray(p.f2c_tgt) for p in plans if p.f2c_tgt is not None
            ),
            ns=tuple(p.n for p in plans),
            ecs=tuple(p.ec for p in plans if p.f2c_perm is not None),
        )


def _matvec(idx: AMGIndices, li: int, vals: jnp.ndarray, x: jnp.ndarray):
    contrib = vals * x[idx.col[li]]
    return jax.ops.segment_sum(
        contrib, idx.rowseg[li], num_segments=idx.ns[li],
        indices_are_sorted=True,
    )


def _inv_diag(idx: AMGIndices, li: int, vals: jnp.ndarray) -> jnp.ndarray:
    d = jax.ops.segment_sum(
        vals * idx.diag_mask[li], idx.rowseg[li], num_segments=idx.ns[li],
        indices_are_sorted=True,
    )
    return 1.0 / jnp.where(jnp.abs(d) > 1e-30, d, 1.0)


def build_values(idx: AMGIndices, app: jnp.ndarray) -> tuple:
    """Per-level (vals, inv_diag) from the fine A_pp entry values, by
    repeated sorted segment-sum (Galerkin RAP with P = 8-row indicator)."""
    out = []
    vals = app
    for li in range(len(idx.ns)):
        out.append((vals, _inv_diag(idx, li, vals)))
        if li < len(idx.f2c_perm):
            vals = jax.ops.segment_sum(
                vals[idx.f2c_perm[li]], idx.f2c_tgt[li],
                num_segments=idx.ecs[li], indices_are_sorted=True,
            )
    return tuple(out)


def _restrict(r: jnp.ndarray, nc: int) -> jnp.ndarray:
    rp = jnp.pad(r, (0, nc * _B - r.shape[0]))
    return rp.reshape(nc, _B).sum(axis=1)


def _prolong(xc: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.repeat(xc, _B)[:n]


def vcycle(
    idx: AMGIndices,
    lv_vals: tuple,
    r: jnp.ndarray,
    li: int = 0,
    omega: float = 0.7,
    coarse_sweeps: int = 12,
) -> jnp.ndarray:
    """One V(1,1) damped-Jacobi cycle for A x = r at level li, x0 = 0."""
    vals, inv_diag = lv_vals[li]
    if li == len(idx.ns) - 1:
        x = omega * inv_diag * r
        for _ in range(coarse_sweeps - 1):
            x = x + omega * inv_diag * (r - _matvec(idx, li, vals, x))
        return x
    x = omega * inv_diag * r
    rc = _restrict(r - _matvec(idx, li, vals, x), idx.ns[li + 1])
    xc = vcycle(idx, lv_vals, rc, li + 1, omega, coarse_sweeps)
    x = x + _prolong(xc, idx.ns[li])
    return x + omega * inv_diag * (r - _matvec(idx, li, vals, x))


# ---------------------------------------------------------------------------
# Schur preconditioner (mirrors solver.mg.MGSIMPLEPCT on irregular storage)


@jax.tree_util.register_dataclass
@dataclass
class AMGSchurPCT:
    """SIMPLE pressure-Schur PC with an algebraic-multigrid Schur solve,
    for (6, N) component-major systems stored per-entry (WinELL / ELL).

    app/aup/apu are the compact per-entry component values of the level-0
    pattern (aup = A_up columns 0..2, apu = A_pu rows 0..2), gathered once
    from the assembled matrix; the Schur apply shares one x-gather across
    components. This is the irregular-mesh counterpart of the reference's
    PCAMGX (pc.c:160-235)."""

    idx: AMGIndices
    lv_vals: tuple  # per level (vals, inv_diag)
    app: jnp.ndarray  # (E,)
    aup: jnp.ndarray  # (3, E)
    apu: jnp.ndarray  # (3, E)
    inv_vel_rows: jnp.ndarray  # (9, N)
    inv_phi_diag: jnp.ndarray  # (N,)
    inv_t_diag: jnp.ndarray  # (N,)
    outer: int = dataclass_field(default=2, metadata=dict(static=True))
    omega: float = dataclass_field(default=0.7, metadata=dict(static=True))

    @staticmethod
    def from_winell(mat, idx: AMGIndices, entry_of_nnz: jnp.ndarray,
                    outer: int = 2, omega: float = 0.7) -> "AMGSchurPCT":
        """mat = sparse.winell.WinELLMatrix (assembled + Dirichlet-masked);
        entry_of_nnz = (E,) i32 WinELL entry slot of each CSR entry (the
        level-0 pattern order the plan was built in)."""
        from dedflow_tpu.solver.pc import NSFieldSplitPCT

        base = NSFieldSplitPCT.from_diag_rows(mat.diag_rows())
        comp = mat.vals[:, entry_of_nnz]  # (24, E) winell comp order
        app = comp[15]
        aup = comp[12:15]  # d y_u[i] / d x_p
        apu = jnp.stack([comp[3], comp[7], comp[11]])  # d y_p / d x_u[j]
        return AMGSchurPCT(
            idx=idx,
            lv_vals=build_values(idx, app),
            app=app,
            aup=aup,
            apu=apu,
            inv_vel_rows=base.inv_vel_rows,
            inv_phi_diag=base.inv_phi_diag,
            inv_t_diag=base.inv_t_diag,
            outer=outer,
            omega=omega,
        )

    def _duinv(self, xu: jnp.ndarray) -> jnp.ndarray:
        v = self.inv_vel_rows
        return jnp.stack(
            [
                v[i * 3 + 0] * xu[0] + v[i * 3 + 1] * xu[1] + v[i * 3 + 2] * xu[2]
                for i in range(3)
            ]
        )

    def _segsum(self, contrib: jnp.ndarray) -> jnp.ndarray:
        return jax.ops.segment_sum(
            contrib, self.idx.rowseg[0], num_segments=self.idx.ns[0],
            indices_are_sorted=True,
        )

    def _matvec_up(self, p: jnp.ndarray) -> jnp.ndarray:
        pc = p[self.idx.col[0]]
        return jnp.stack([self._segsum(self.aup[i] * pc) for i in range(3)])

    def _matvec_pu(self, u: jnp.ndarray) -> jnp.ndarray:
        col = self.idx.col[0]
        return self._segsum(
            self.apu[0] * u[0][col]
            + self.apu[1] * u[1][col]
            + self.apu[2] * u[2][col]
        )

    def _schur_apply(self, p: jnp.ndarray) -> jnp.ndarray:
        pp = self._segsum(self.app * p[self.idx.col[0]])
        return pp - self._matvec_pu(self._duinv(self._matvec_up(p)))

    def _schur_solve(self, rp: jnp.ndarray) -> jnp.ndarray:
        dp = vcycle(self.idx, self.lv_vals, rp, omega=self.omega)
        for _ in range(self.outer - 1):
            dp = dp + vcycle(
                self.idx, self.lv_vals, rp - self._schur_apply(dp),
                omega=self.omega,
            )
        return dp

    def __call__(self, x_t: jnp.ndarray) -> jnp.ndarray:
        xu, xp = x_t[:3], x_t[3]
        ustar = self._duinv(xu)
        rp = xp - self._matvec_pu(ustar)
        rp = jax.lax.optimization_barrier(rp)
        dp = jax.lax.optimization_barrier(self._schur_solve(rp))
        u = ustar - self._duinv(self._matvec_up(dp))
        return jnp.stack(
            [
                u[0],
                u[1],
                u[2],
                dp,
                x_t[4] * self.inv_phi_diag,
                x_t[5] * self.inv_t_diag,
            ]
        )
