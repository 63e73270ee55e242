"""Pressure-block geometric multigrid: the AMG-class preconditioner.

The reference's optional PCAMGX (pc.c:160-235) wraps NVIDIA AmgX as a
black-box algebraic-multigrid solve of one field section. The TPU-native
counterpart exploits what AmgX has to discover algebraically: on the
lattice fast path the pressure block A_pp is a <=15-point variable-
coefficient stencil on a structured (gx, gy, gz) node grid, so the whole
multigrid hierarchy - smoothing, restriction, Galerkin coarse operators,
prolongation - is expressible with static shifted slices and reshapes,
zero gathers (the same design rule as fem.lattice).

Components:
- `ScalarDIALevel`: one level's stencil as flat (K, N) plane rows with
  linear column offsets (the scalar analogue of sparse.fsbsr.FSDIAMatrixT)
  plus the inverse diagonal for damped-Jacobi smoothing.
- `build_hierarchy`: level l+1 = Galerkin RAP of level l with
  piecewise-constant aggregation over 2x2x2 node blocks. With P = block
  indicator, (R A P)[I, J] = sum_{i in I} sum_{j in J} A[i, j]; per fine
  offset (ox, oy, oz) and node parity (px, py, pz) the contribution lands
  on coarse offset ((p+o)//2 per axis), so the whole product is 8 parity
  slices per plane - pure reshapes, computed ON DEVICE at PC setup (the
  operator changes every Newton iteration, like AmgX resetup).
- `vcycle`: nu=1 pre/post damped-Jacobi V-cycle, coarsest level solved
  with extra sweeps. Static recursion (levels fixed at trace time).
- `MGSIMPLEPCT`: the SIMPLE pressure-Schur preconditioner (solver.pc.
  SIMPLEPCT) with the damped-Jacobi Schur solve replaced by V-cycle-
  preconditioned Richardson on S_hat = A_pp - A_pu inv(D_u) A_up. The
  hierarchy is built on the plain A_pp stencil (see the measurement note
  in `MGSIMPLEPCT.from_matrix`); S_hat enters only through the outer
  Richardson residual.

Wrap-around correctness: a linear offset o at a grid border wraps to an
unrelated row, but the lattice assembly's dead-cell construction makes
every such entry exactly 0.0 (fem.lattice module docstring), and Galerkin
coarsening maps zero fine entries to zero coarse contributions - so the
flat linear-offset matvec is exact at every level.
"""

from __future__ import annotations

from dataclasses import dataclass
from dataclasses import field as dataclass_field

import jax
import jax.numpy as jnp
import numpy as np


def decode_offsets(offsets, gx: int, gy: int) -> list[tuple[int, int, int]]:
    """Linear DIA offsets -> geometric (ox, oy, oz) with each |o| <= 1.

    Raises ValueError if any offset does not decode (non-lattice stencil).
    """
    sy, sz = gx, gx * gy
    out = []
    for o in offsets:
        oz = int(np.round(o / sz))
        rem = o - oz * sz
        oy = int(np.round(rem / sy))
        ox = rem - oy * sy
        if (
            max(abs(ox), abs(oy), abs(oz)) > 1
            or ox + sy * oy + sz * oz != o
        ):
            raise ValueError(
                f"offset {o} does not decode to a 27-point stencil on "
                f"grid ({gx}, {gy}, ...)"
            )
        out.append((ox, oy, oz))
    return out


def infer_dims(offsets, num_rows: int) -> tuple[int, int, int] | None:
    """Recover the node-grid shape (gx, gy, gz) from linear DIA offsets
    alone, for translation-class contexts that carry no geometry
    (fem.lattice.build_class_context sets dims=None).

    A translation-regular numbering has strides (1, sy, sz) with
    sy = gx, sz = gx * gy; its stencil offsets are {ox + sy*oy + sz*oz}
    with each |o| <= 1, so sy and sz are recoverable from the offset set:
    candidates come from the smallest offsets > 1 (one of sy-1, sy, sy+1)
    and from the largest offset (sz + sy*oy + ox). Every candidate pair is
    validated by `decode_offsets`; gz then follows from the row count.
    Returns None when no consistent decode exists (genuinely irregular
    stencils, or a partial grid where num_rows != gx*gy*gz)."""
    offs = sorted(int(o) for o in offsets)
    pos = [o for o in offs if o > 1]
    if not pos or num_rows <= 0:
        return None
    omax = pos[-1]
    sy_cands = sorted(
        {p + d for p in pos[:3] for d in (-1, 0, 1) if p + d > 1}
    )
    for sy in sy_cands:
        for dz in (-sy - 1, -sy, -sy + 1, -1, 0, 1, sy - 1, sy, sy + 1):
            sz = omax + dz
            if sz <= sy or sz % sy != 0:
                continue
            if num_rows % sz != 0:
                continue
            gx, gy, gz = sy, sz // sy, num_rows // sz
            if gy < 1 or gz < 1:
                continue
            try:
                decode_offsets(offs, gx, gy)
            except ValueError:
                continue
            return (gx, gy, gz)
    return None


@jax.tree_util.register_dataclass
@dataclass
class ScalarDIALevel:
    """One multigrid level: scalar DIA stencil + Jacobi inverse diagonal."""

    planes: jnp.ndarray  # (K, N) plane rows
    inv_diag: jnp.ndarray  # (N,)
    offsets: tuple = dataclass_field(metadata=dict(static=True))  # linear
    dims: tuple = dataclass_field(metadata=dict(static=True))  # (gx, gy, gz)

    def matvec(
        self, x: jnp.ndarray, axis: str | None = None, nshards: int = 1
    ) -> jnp.ndarray:
        """(N,) -> (N,): K static shifted slices (gather-free).

        axis/nshards: inside shard_map over z-slabs, exchange the stencil
        reach (max |offset| rows) with the z-neighbors via ppermute so the
        local matvec equals the global one on local rows. Edge shards
        receive ppermute's implicit zeros - exact, because beyond-domain
        stencil entries are zero by the dead-cell construction."""
        n = self.planes.shape[1]
        m = max(max(abs(o) for o in self.offsets), 1)
        if axis is None:
            xpad = jnp.pad(x, (m, m))
        else:
            assert m <= n, "halo reach exceeds the local slab"
            up = [(i, i + 1) for i in range(nshards - 1)]
            dn = [(i + 1, i) for i in range(nshards - 1)]
            lo = jax.lax.ppermute(x[n - m :], axis, up)
            hi = jax.lax.ppermute(x[:m], axis, dn)
            xpad = jnp.concatenate([lo, x, hi])
        y = 0.0
        for k, o in enumerate(self.offsets):
            y = y + self.planes[k] * jax.lax.slice_in_dim(
                xpad, m + o, m + o + n
            )
        return y


def _coarse_dims(dims) -> tuple[int, int, int]:
    return tuple(-(-d // 2) for d in dims)


def _galerkin_coarsen(level: ScalarDIALevel) -> ScalarDIALevel:
    """RAP with piecewise-constant 2x2x2 aggregation, on device."""
    gx, gy, gz = level.dims
    cgx, cgy, cgz = _coarse_dims(level.dims)
    geo = decode_offsets(level.offsets, gx, gy)
    # fine planes in 3-D view, zero-padded to even dims
    p3 = level.planes.reshape(-1, gz, gy, gx)
    p3 = jnp.pad(
        p3, ((0, 0), (0, 2 * cgz - gz), (0, 2 * cgy - gy), (0, 2 * cgx - gx))
    )
    p6 = p3.reshape(-1, cgz, 2, cgy, 2, cgx, 2)
    coarse: dict[tuple[int, int, int], jnp.ndarray] = {}
    for k, (ox, oy, oz) in enumerate(geo):
        for pz in range(2):
            for py in range(2):
                for px in range(2):
                    co = (
                        (px + ox) // 2,
                        (py + oy) // 2,
                        (pz + oz) // 2,
                    )
                    v = p6[k, :, pz, :, py, :, px]
                    coarse[co] = coarse.get(co, 0.0) + v
    csy, csz = cgx, cgx * cgy
    items = sorted(
        coarse.items(), key=lambda kv: kv[0][0] + csy * kv[0][1] + csz * kv[0][2]
    )
    offs = tuple(ox + csy * oy + csz * oz for (ox, oy, oz), _ in items)
    planes = jnp.stack([v.reshape(-1) for _, v in items])
    d0 = offs.index(0)
    diag = planes[d0]
    # padded (all-zero) rows get unit diagonal so Jacobi is well defined
    safe = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    return ScalarDIALevel(
        planes=planes,
        inv_diag=1.0 / safe,
        offsets=offs,
        dims=(cgx, cgy, cgz),
    )


def build_hierarchy(
    planes: jnp.ndarray,
    offsets: tuple,
    dims: tuple,
    diag_override: jnp.ndarray | None = None,
    min_nodes: int = 1024,
    max_levels: int = 8,
    shard_z: bool = False,
) -> tuple[ScalarDIALevel, ...]:
    """Build the level tuple from the fine (K, N) stencil.

    `diag_override` replaces the 0-offset plane (e.g. the exact Schur
    diagonal). Coarsening stops when a level has < min_nodes rows or the
    grid can no longer halve. shard_z: the hierarchy is one z-slab of a
    sharded grid - stop while local gz stays even (slab cuts must align
    with whole 2x2x2 aggregates) and >= 4 (the coarse level's halo reach
    must fit its neighbor slab)."""
    d0 = offsets.index(0)
    if diag_override is not None:
        planes = planes.at[d0].set(diag_override)
    diag = planes[d0]
    safe = jnp.where(jnp.abs(diag) > 1e-30, diag, 1.0)
    levels = [
        ScalarDIALevel(
            planes=planes, inv_diag=1.0 / safe, offsets=tuple(offsets),
            dims=tuple(dims),
        )
    ]
    while len(levels) < max_levels:
        lv = levels[-1]
        n = lv.planes.shape[1]
        if n < min_nodes or max(lv.dims) < 3:
            break
        if shard_z and (lv.dims[2] % 2 != 0 or lv.dims[2] < 4):
            break
        levels.append(_galerkin_coarsen(lv))
    return tuple(levels)


def _restrict(r: jnp.ndarray, dims) -> jnp.ndarray:
    """Aggregate-sum (P^T) onto the 2x coarser grid."""
    gx, gy, gz = dims
    cgx, cgy, cgz = _coarse_dims(dims)
    r3 = r.reshape(gz, gy, gx)
    r3 = jnp.pad(r3, ((0, 2 * cgz - gz), (0, 2 * cgy - gy), (0, 2 * cgx - gx)))
    return (
        r3.reshape(cgz, 2, cgy, 2, cgx, 2).sum(axis=(1, 3, 5)).reshape(-1)
    )


def _prolong(xc: jnp.ndarray, dims) -> jnp.ndarray:
    """Piecewise-constant injection (P) back to the finer grid."""
    gx, gy, gz = dims
    cgx, cgy, cgz = _coarse_dims(dims)
    x3 = xc.reshape(cgz, 1, cgy, 1, cgx, 1)
    x3 = jnp.broadcast_to(x3, (cgz, 2, cgy, 2, cgx, 2)).reshape(
        2 * cgz, 2 * cgy, 2 * cgx
    )
    return x3[:gz, :gy, :gx].reshape(-1)


def vcycle(
    levels: tuple,
    r: jnp.ndarray,
    li: int = 0,
    omega: float = 0.85,
    coarse_sweeps: int = 12,
    axis: str | None = None,
    nshards: int = 1,
) -> jnp.ndarray:
    """One V(1,1) cycle for A x = r at level li, x0 = 0. Static recursion.

    axis/nshards: distributed cycle over z-slabs (inside shard_map) -
    every matvec exchanges its stencil halo (ScalarDIALevel.matvec);
    restriction/prolongation are slab-local because the slab cuts align
    with whole 2x2x2 aggregates (the sharded builder keeps local gz even
    at every coarsening), so the distributed cycle is ARITHMETICALLY
    IDENTICAL to the single-chip one."""
    lv = levels[li]
    if li == len(levels) - 1:
        x = omega * lv.inv_diag * r
        for _ in range(coarse_sweeps - 1):
            x = x + omega * lv.inv_diag * (r - lv.matvec(x, axis, nshards))
        return x
    # pre-smooth (one damped-Jacobi sweep from zero)
    x = omega * lv.inv_diag * r
    # coarse-grid correction
    rc = _restrict(r - lv.matvec(x, axis, nshards), lv.dims)
    xc = vcycle(levels, rc, li + 1, omega, coarse_sweeps, axis, nshards)
    x = x + _prolong(xc, lv.dims)
    # post-smooth
    x = x + omega * lv.inv_diag * (r - lv.matvec(x, axis, nshards))
    return x


@jax.tree_util.register_dataclass
@dataclass
class MGSIMPLEPCT:
    """SIMPLE pressure-Schur PC with a multigrid Schur solve ((6, N)
    component-major vectors, lattice fast path).

    Identical structure to solver.pc.SIMPLEPCT - velocity predictor,
    approximate Schur solve, velocity corrector, diagonal phi/T - but the
    Schur solve is `outer` Richardson iterations on the matrix-free
    S_hat = A_pp - A_pu inv(D_u) A_up, each preconditioned by one V-cycle
    on the hierarchy built from A_pp with the exact S_hat diagonal.
    This is the AMG-class option the reference delegates to AmgX
    (PCAMGX, pc.c:160-235), re-designed as structured multigrid."""

    bands: object  # sparse.fsbsr.SchurBandsT (compact A_pp/A_pu/A_up)
    levels: tuple  # ScalarDIALevel hierarchy (pytree tuple)
    inv_vel_rows: jnp.ndarray  # (9, N)
    inv_phi_diag: jnp.ndarray  # (N,)
    inv_t_diag: jnp.ndarray  # (N,)
    outer: int = dataclass_field(default=2, metadata=dict(static=True))
    omega: float = dataclass_field(default=0.85, metadata=dict(static=True))
    # multi-chip: (jax.sharding.Mesh, axis_name). The V-cycle is a TRUE
    # distributed multigrid over z-slabs: each chip owns a
    # (gx, gy, gz/nparts) subgrid, its hierarchy is built from its local
    # plane rows (exact - RAP sums run over rows, which are local), and
    # every level's matvec exchanges its stencil halo with the
    # z-neighbors via ppermute. Slab cuts align with whole 2x2x2
    # aggregates (build_hierarchy shard_z), so the distributed cycle is
    # arithmetically identical to the single-chip one down to the level
    # where coarsening stops (earlier than single-chip: local gz must
    # stay even and >= 4).
    shard: tuple | None = dataclass_field(default=None, metadata=dict(static=True))
    ldims: tuple | None = dataclass_field(default=None, metadata=dict(static=True))

    @staticmethod
    def from_matrix(
        mat, dims: tuple | None, outer: int = 2, omega: float = 0.85,
        min_nodes: int = 1024, shard: tuple | None = None,
    ) -> "MGSIMPLEPCT":
        """dims = (gx, gy, gz) node-grid shape; mat = FSDIAMatrixT.
        dims=None infers the grid from the DIA offsets (`infer_dims`) -
        the translation-class tier carries no geometry but its stencil
        still encodes the strides; raises ValueError if inference fails.

        shard = (device_mesh, axis): shard-local hierarchy + V-cycle
        (see the `shard` field). Requires the per-shard slab to be a
        whole number of z-planes (padded rows count: the sharded lattice
        pads num_node to nparts * lane blocks; extra rows carry zero
        planes, which coarsen to zero and smooth as unit diagonals)."""
        import numpy as _np

        from dedflow_tpu.solver.pc import NSFieldSplitPCT

        base = NSFieldSplitPCT.from_diag_rows(mat.diag_rows())
        n = mat.num_rows
        if dims is None:
            dims = infer_dims(mat.offsets, n)
            if dims is None:
                raise ValueError(
                    "MGSIMPLEPCT: node grid could not be inferred from "
                    f"the DIA offsets {mat.offsets} at {n} rows"
                )
        ldims = None
        if shard is not None:
            dev_mesh, axis = shard
            nparts = int(_np.prod(dev_mesh.devices.shape))
            ntot = mat.data.shape[-1]  # padded width (nparts multiple)
            L = ntot // nparts
            sz = dims[0] * dims[1]
            if L % sz != 0:
                raise ValueError(
                    f"sharded MG needs z-plane-aligned slabs: local rows "
                    f"{L} not a multiple of the plane size {sz}"
                )
            ldims = (dims[0], dims[1], L // sz)
        else:
            assert n == dims[0] * dims[1] * dims[2], (
                f"grid {dims} does not match {n} pressure rows"
            )
        # Compact Schur bands, extracted once (slicing the full matrix
        # per apply forces a ~170 MB relayout copy each application -
        # measured 11.5 vs 2.5 ms/apply at 1M tets).
        bands = mat.schur_bands()
        # Hierarchy on the PLAIN A_pp stencil. Replacing its diagonal
        # with the exact S_hat diagonal was measured to WRECK the cycle
        # (111 vs 24 GMRES iterations on the reference state at 16^3):
        # the override makes each level's smoother inconsistent with its
        # own off-diagonals. S_hat enters only through the outer
        # Richardson residual in _schur_solve.
        if shard is None:
            levels = build_hierarchy(
                bands.app, mat.offsets, dims, min_nodes=min_nodes
            )
        else:
            from jax.sharding import PartitionSpec as _P

            dev_mesh, axis = shard

            lmin = max(128, min_nodes // nparts)

            def local_build(app_l):
                return build_hierarchy(
                    app_l, mat.offsets, ldims, min_nodes=lmin, shard_z=True
                )

            # level spec: planes/inv_diag sharded on their row axis
            probe = jax.eval_shape(
                local_build,
                jax.ShapeDtypeStruct(
                    (bands.app.shape[0], ldims[0] * ldims[1] * ldims[2]),
                    bands.app.dtype,
                ),
            )
            out_specs = tuple(
                ScalarDIALevel(
                    planes=_P(None, axis), inv_diag=_P(axis),
                    offsets=lv.offsets, dims=lv.dims,
                )
                for lv in probe
            )
            levels = jax.shard_map(
                local_build,
                mesh=dev_mesh,
                in_specs=(_P(None, axis),),
                out_specs=out_specs,
            )(bands.app)
        return MGSIMPLEPCT(
            bands=bands,
            levels=levels,
            inv_vel_rows=base.inv_vel_rows,
            inv_phi_diag=base.inv_phi_diag,
            inv_t_diag=base.inv_t_diag,
            outer=outer,
            omega=omega,
            shard=shard,
            ldims=ldims,
        )

    def _duinv(self, xu: jnp.ndarray) -> jnp.ndarray:
        v = self.inv_vel_rows
        return jnp.stack(
            [
                v[i * 3 + 0] * xu[0] + v[i * 3 + 1] * xu[1] + v[i * 3 + 2] * xu[2]
                for i in range(3)
            ]
        )

    def _schur_apply(self, p: jnp.ndarray) -> jnp.ndarray:
        m = self.bands
        return m.matvec_pp(p) - m.matvec_pu(self._duinv(m.matvec_up(p)))

    def _vcycle(self, r: jnp.ndarray) -> jnp.ndarray:
        if self.shard is None:
            return vcycle(self.levels, r, omega=self.omega)
        from jax.sharding import PartitionSpec as _P

        dev_mesh, axis = self.shard
        omega = self.omega
        levels = self.levels
        nsh = int(np.prod(dev_mesh.devices.shape))

        def local(r_l, levels_l):
            return vcycle(levels_l, r_l, omega=omega, axis=axis, nshards=nsh)

        lv_specs = tuple(
            ScalarDIALevel(
                planes=_P(None, axis), inv_diag=_P(axis),
                offsets=lv.offsets, dims=lv.dims,
            )
            for lv in levels
        )
        return jax.shard_map(
            local,
            mesh=dev_mesh,
            in_specs=(_P(axis), lv_specs),
            out_specs=_P(axis),
        )(r, levels)

    def _schur_solve(self, rp: jnp.ndarray) -> jnp.ndarray:
        dp = self._vcycle(rp)
        for _ in range(self.outer - 1):
            dp = dp + self._vcycle(rp - self._schur_apply(dp))
        return dp

    def __call__(self, x_t: jnp.ndarray) -> jnp.ndarray:
        xu, xp = x_t[:3], x_t[3]
        ustar = self._duinv(xu)
        rp = xp - self.bands.matvec_pu(ustar)
        # Fence the Schur phase: letting XLA fuse the predictor/corrector
        # band matvecs into the V-cycle was measured at 16.6 ms/apply vs
        # 1.8 ms with the barriers (1M tets, v5e) - the merged fusion
        # re-materializes the (D, 3, N) bands inside the cycle.
        rp = jax.lax.optimization_barrier(rp)
        dp = jax.lax.optimization_barrier(self._schur_solve(rp))
        u = ustar - self._duinv(self.bands.matvec_up(dp))
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
