"""Dense grid-resident DEM: contacts with ZERO gathers.

The candidate-list path (dem.cells + dem.contact) is gather-bound on TPU
(~2-5 ns per random lookup: 834 ms per substep at 100k particles). This
module replaces irregular access with structured dense compute - the
TPU-native formulation:

- particle state lives ON the cell grid as (K, NC) arrays (slot-major,
  flat padded cells last; K = cell capacity), with one ghost-cell ring so
  every neighbor access is a STATIC SLICE of the flat array:
  neighbor (dx,dy,dz) of cell c is c + (dx*NY + dy)*NZ + dz;
- contact forces = 27 neighbor offsets x K' slots of dense (K, NCcore)
  elementwise arithmetic - no scatter, no gather, full VPU;
- integration runs on the grid; re-bucketing happens every
  `rebuild_every` substeps (valid while drift < the skin
  cell_size - 2*max_radius).

At 100k particles this is ~25x faster than the candidate-list path; the
latter remains the oracle (exact-equality test) and the CPU path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dedflow_tpu.dem.cells import CellGrid, cell_coords
from dedflow_tpu.dem.contact import ContactParams
from dedflow_tpu.dem.integrate import DEMConfig
from dedflow_tpu.dem.particles import ParticleState


@jax.tree_util.register_dataclass
@dataclass
class GridState:
    """Grid-resident particle state; all arrays (K, NC) (NC = padded flat
    cells, z fastest). Empty slots: mask 0, pid = P (out of range)."""

    pos: tuple  # 3 x (K, NC)
    vel: tuple  # 3 x (K, NC)
    radius: jnp.ndarray  # (K, NC)
    mask: jnp.ndarray  # (K, NC) 0/1
    pid: jnp.ndarray  # (K, NC) int32 particle id


def _flat_dims(grid: CellGrid) -> tuple[int, int, int]:
    return grid.dims


@partial(jax.jit, static_argnums=(0, 2))
def to_grid(grid: CellGrid, state: ParticleState, num_particle: int) -> GridState:
    """Bucket particles onto the grid (sort + rank + one scatter set)."""
    p = num_particle
    k = grid.capacity
    nx, ny, nz = grid.dims
    nc = nx * ny * nz
    coords = cell_coords(grid, state.x)
    cid = (coords[:, 0] * ny + coords[:, 1]) * nz + coords[:, 2]
    order = jnp.argsort(cid)
    cid_s = cid[order]
    starts = jnp.searchsorted(cid_s, jnp.arange(nc, dtype=cid.dtype))
    rank = jnp.arange(p, dtype=jnp.int32) - starts[cid_s].astype(jnp.int32)
    slot = rank * nc + cid_s  # (K, NC) flattened: slot-major
    slot = jnp.where(rank < k, slot, k * nc)  # overflow -> dropped

    def put(vals, fill):
        flat = jnp.full((k * nc,), fill, dtype=vals.dtype)
        return flat.at[slot].set(vals[order], mode="drop").reshape(k, nc)

    f32 = state.x.dtype
    return GridState(
        pos=tuple(put(state.x[:, c], jnp.asarray(0.0, f32)) for c in range(3)),
        vel=tuple(put(state.v[:, c], jnp.asarray(0.0, f32)) for c in range(3)),
        radius=put(state.radius, jnp.asarray(0.0, f32)),
        mask=put(jnp.ones((p,), f32), jnp.asarray(0.0, f32)),
        pid=put(jnp.arange(p, dtype=jnp.int32), jnp.int32(p)),
    )


@partial(jax.jit, static_argnums=(0, 2))
def from_grid(
    grid: CellGrid,
    gs: GridState,
    num_particle: int,
    prev: ParticleState | None = None,
) -> ParticleState:
    """Grid slots -> (P,) particle arrays via one scatter by pid.

    `prev` seeds the outputs: a particle that was dropped by a bucket
    overflow in to_grid (rank >= capacity) has no slot on the grid, so
    without a seed it would silently re-emerge at x = 0 with v = 0.
    Seeded, it carries its pre-substep state through unchanged (it simply
    skips this integration window)."""
    p = num_particle

    def take(comp_flat, seed):
        out = seed if seed is not None else jnp.zeros((p,), comp_flat.dtype)
        return out.at[gs.pid.reshape(-1)].set(comp_flat.reshape(-1), mode="drop")

    px = (None, None, None) if prev is None else tuple(prev.x[:, c] for c in range(3))
    pv = (None, None, None) if prev is None else tuple(prev.v[:, c] for c in range(3))
    x = jnp.stack([take(gs.pos[c], px[c]) for c in range(3)], axis=-1)
    v = jnp.stack([take(gs.vel[c], pv[c]) for c in range(3)], axis=-1)
    r = take(gs.radius, None if prev is None else prev.radius)
    return ParticleState(x=x, v=v, a=jnp.zeros_like(x), mass=None, radius=r)


def _offsets(grid: CellGrid):
    nx, ny, nz = grid.dims
    offs = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                offs.append((dx * ny + dy) * nz + dz)
    return offs


def _pair_sweep(center, padded, offs, omax, nc, k, prm):
    """Dense 27-offset x K'-slot contact sweep.

    `center` = (pos, vel, radius, mask, pid) local (K, nc) fields;
    `padded` = (m_p, pos_p, vel_p, r_p, pid_p), the same fields widened
    to (K, nc + 2*omax) along the cell axis. Pad columns MUST have mask 0
    (zero fill, or a neighbor shard's halo band). Every neighbor shift is
    then a STATIC SLICE (no roll/concat per offset); out-of-row wrap
    cells are geometrically far, so their pairs are never in contact."""
    pos, vel, radius, mask, pid = center
    m_p, pos_p, vel_p, r_p, pid_p = padded
    f = [jnp.zeros_like(mask) for _ in range(3)]
    for o in offs:
        sh = lambda a: jax.lax.slice_in_dim(a, omax + o, omax + o + nc, axis=1)
        m_n = sh(m_p)
        pos_n = [sh(pos_p[c]) for c in range(3)]
        vel_n = [sh(vel_p[c]) for c in range(3)]
        r_n = sh(r_p)
        pid_n = sh(pid_p)
        for kp in range(k):
            d = [pos[c] - pos_n[c][kp] for c in range(3)]
            dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            dist = jnp.sqrt(jnp.maximum(dist2, prm.eps))
            delta = radius + r_n[kp] - dist
            # not self, both real, touching
            notself = pid != pid_n[kp]
            act = (
                mask * m_n[kp] * notself.astype(dist.dtype) * (delta > 0.0)
            )
            vrel = [vel[c] - vel_n[c][kp] for c in range(3)]
            n = [d[c] / dist for c in range(3)]
            vn = vrel[0] * n[0] + vrel[1] * n[1] + vrel[2] * n[2]
            w = act * (prm.k_n * delta - prm.gamma_n * vn)
            for c in range(3):
                f[c] = f[c] + w * n[c]
            if prm.mu > 0.0 and prm.gamma_t > 0.0:
                vt = [vrel[c] - vn * n[c] for c in range(3)]
                vt_norm = jnp.sqrt(
                    jnp.maximum(vt[0] ** 2 + vt[1] ** 2 + vt[2] ** 2, prm.eps)
                )
                ft = act * jnp.minimum(
                    prm.mu * jnp.abs(prm.k_n * delta - prm.gamma_n * vn),
                    prm.gamma_t * vt_norm,
                )
                for c in range(3):
                    f[c] = f[c] - ft / vt_norm * vt[c]
    return f


def grid_pair_forces(grid: CellGrid, gs: GridState, prm: ContactParams):
    """3 x (K, NC) contact forces; dense 27-offset x K'-slot loop."""
    k = grid.capacity
    nc = gs.mask.shape[1]
    offs = _offsets(grid)
    omax = max(abs(o) for o in offs)
    padf = lambda a: jnp.pad(a, ((0, 0), (omax, omax)))
    return _pair_sweep(
        (gs.pos, gs.vel, gs.radius, gs.mask, gs.pid),
        (
            padf(gs.mask),
            [padf(gs.pos[c]) for c in range(3)],
            [padf(gs.vel[c]) for c in range(3)],
            padf(gs.radius),
            jnp.pad(gs.pid, ((0, 0), (omax, omax)), constant_values=-1),
        ),
        offs, omax, nc, k, prm,
    )


_E_DEM = 2048  # cells per Pallas contact-kernel grid step


def _pack_fields(gs: GridState, nb: int, opad: int, k8: int) -> jnp.ndarray:
    """(9*K8, NB*E + 2*opad) f32 window array: pos(3), vel(3), radius,
    mask, pid-as-float blocks, each padded from K to K8 = roundup(K, 8)
    rows so every field block starts on a sublane-tile boundary (Mosaic
    rejects VMEM row slices at non-8-multiple offsets - the r4 bench
    MosaicError with occupancy-sized odd K). Padded slot rows carry
    mask 0, so they contribute nothing. Front/back zero-padded for the
    halo DMA. Float pid comparison is exact below 2^24 particles."""
    nc = gs.mask.shape[1]
    k = gs.mask.shape[0]
    rows = list(gs.pos) + list(gs.vel) + [
        gs.radius, gs.mask, gs.pid.astype(jnp.float32),
    ]
    arr = jnp.concatenate(
        [
            jnp.pad(r.astype(jnp.float32), ((0, k8 - k), (0, 0)))
            for r in rows
        ],
        axis=0,
    )
    slen = nb * _E_DEM + 2 * opad
    return jnp.pad(arr, ((0, 0), (opad, slen - opad - nc)))


def _pair_kernel(f_hbm, out_ref, win, sem, *, offs, opad, e, k, k8, prm):
    kblk = pl.program_id(0)
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(kblk * e, e + 2 * opad)], win, sem
    ).start()
    pltpu.make_async_copy(
        f_hbm.at[:, pl.ds(kblk * e, e + 2 * opad)], win, sem
    ).wait()
    c0 = opad
    # field blocks live at k8-row (sublane-aligned) strides; rows k..k8-1
    # are zero-mask padding and produce zero forces
    pos = [win[c * k8 : c * k8 + k8, c0 : c0 + e] for c in range(3)]
    vel = [win[(3 + c) * k8 : (3 + c) * k8 + k8, c0 : c0 + e] for c in range(3)]
    rad = win[6 * k8 : 7 * k8, c0 : c0 + e]
    msk = win[7 * k8 : 8 * k8, c0 : c0 + e]
    pid = win[8 * k8 : 9 * k8, c0 : c0 + e]
    f = [jnp.zeros((k8, e), jnp.float32) for _ in range(3)]
    for o in offs:
        s = c0 + o
        for kp in range(k):
            pn = [win[c * k8 + kp, s : s + e] for c in range(3)]
            vn = [win[(3 + c) * k8 + kp, s : s + e] for c in range(3)]
            rn = win[6 * k8 + kp, s : s + e]
            mn = win[7 * k8 + kp, s : s + e]
            idn = win[8 * k8 + kp, s : s + e]
            d = [pos[c] - pn[c] for c in range(3)]
            dist2 = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
            dist = jnp.sqrt(jnp.maximum(dist2, prm.eps))
            delta = rad + rn - dist
            act = msk * mn * (pid != idn).astype(jnp.float32) * (delta > 0.0)
            vrel = [vel[c] - vn[c] for c in range(3)]
            nvec = [d[c] / dist for c in range(3)]
            vndot = vrel[0] * nvec[0] + vrel[1] * nvec[1] + vrel[2] * nvec[2]
            w = act * (prm.k_n * delta - prm.gamma_n * vndot)
            for c in range(3):
                f[c] = f[c] + w * nvec[c]
            if prm.mu > 0.0 and prm.gamma_t > 0.0:
                vt = [vrel[c] - vndot * nvec[c] for c in range(3)]
                vt_norm = jnp.sqrt(
                    jnp.maximum(
                        vt[0] ** 2 + vt[1] ** 2 + vt[2] ** 2, prm.eps
                    )
                )
                ft = act * jnp.minimum(
                    prm.mu
                    * jnp.abs(prm.k_n * delta - prm.gamma_n * vndot),
                    prm.gamma_t * vt_norm,
                )
                for c in range(3):
                    f[c] = f[c] - ft / vt_norm * vt[c]
    for c in range(3):
        out_ref[c * k8 : (c + 1) * k8, :] = f[c]


def grid_pair_forces_pallas(grid: CellGrid, gs: GridState, prm: ContactParams,
                            interpret: bool = False):
    """Fused TPU contact sweep: one haloed window DMA per cell block, the
    whole 27-offset x K-slot pair loop in VMEM. Numerically identical op
    order to grid_pair_forces (the XLA oracle), measured ~4x faster at
    100k particles (the XLA version re-streams the 9 field arrays from
    HBM for every (offset, slot) pair)."""
    k = grid.capacity
    k8 = -(-k // 8) * 8  # sublane-aligned field-block stride
    nc = gs.mask.shape[1]
    offs = _offsets(grid)
    omax = max(abs(o) for o in offs)
    opad = -(-omax // 128) * 128
    e = _E_DEM
    nb = -(-nc // e)
    packed = _pack_fields(gs, nb, opad, k8)
    kern = functools.partial(
        _pair_kernel, offs=offs, opad=opad, e=e, k=k, k8=k8, prm=prm
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((3 * k8, nb * e), jnp.float32),
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((3 * k8, e), lambda kb: (0, kb)),
        scratch_shapes=[
            pltpu.VMEM((9 * k8, e + 2 * opad), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(packed)
    return [
        out[c * k8 : c * k8 + k, :nc].astype(gs.mask.dtype) for c in range(3)
    ]


def _local_forces(cfg: DEMConfig, pos, vel, radius, mask, mass, ext, f):
    """Add the purely local terms (walls + gravity + drag + ext) to the
    contact forces `f` (mutated in place and returned)."""
    prm = cfg.contact
    dtype = mask.dtype
    if cfg.walls_lo is not None:
        for axis in range(3):
            lo = jnp.asarray(cfg.walls_lo[axis], dtype)
            hi = jnp.asarray(cfg.walls_hi[axis], dtype)
            d_lo = radius - (pos[axis] - lo)
            act = mask * (d_lo > 0)
            f[axis] = f[axis] + act * (prm.k_n * d_lo - prm.gamma_n * vel[axis])
            d_hi = radius - (hi - pos[axis])
            act = mask * (d_hi > 0)
            f[axis] = f[axis] - act * (prm.k_n * d_hi + prm.gamma_n * vel[axis])
    g = cfg.gravity
    for c in range(3):
        f[c] = f[c] + mask * (mass * g[c])
        if cfg.linear_drag:
            f[c] = f[c] - cfg.linear_drag * mask * vel[c]
        if ext is not None:
            f[c] = f[c] + mask * ext[c]
    return f


def grid_forces(cfg: DEMConfig, gs: GridState, mass: float,
                ext: tuple | None = None, use_pallas: bool | None = None):
    """Total force on the grid: contacts + walls + gravity + drag (+ext)."""
    prm = cfg.contact
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and gs.mask.dtype == jnp.float32
        )
    if use_pallas:
        f = grid_pair_forces_pallas(cfg.grid, gs, prm)
    else:
        f = grid_pair_forces(cfg.grid, gs, prm)
    return _local_forces(
        cfg, gs.pos, gs.vel, gs.radius, gs.mask, mass, ext, f
    )


@partial(jax.jit, static_argnums=(0, 3, 5))
def grid_run(cfg: DEMConfig, gs: GridState, mass: float, num_steps: int,
             ext: tuple | None = None,
             use_pallas: bool | None = None) -> GridState:
    """num_steps semi-implicit Euler substeps on the grid (no re-bucket:
    caller must re-bucket before particles drift across the skin)."""

    def body(gs, _):
        f = grid_forces(cfg, gs, mass, ext, use_pallas)
        vel = tuple(
            gs.vel[c] + (cfg.dt / mass) * f[c] * gs.mask for c in range(3)
        )
        pos = tuple(gs.pos[c] + cfg.dt * vel[c] * gs.mask for c in range(3))
        return GridState(pos=pos, vel=vel, radius=gs.radius, mask=gs.mask,
                         pid=gs.pid), None

    out, _ = jax.lax.scan(body, gs, None, length=num_steps)
    return out


def grid_run_shardmap(cfg: DEMConfig, gs: GridState, mass: float,
                      num_steps: int, ext: tuple | None,
                      dev_mesh, axis: str) -> GridState:
    """num_steps substeps under shard_map over contiguous slabs of the
    flat cell axis.

    Communication: the static-per-run fields (mask/radius/pid) exchange
    their omax-wide boundary bands once; pos/vel exchange per substep -
    two ppermutes of 6 x (K, omax) each, O(slab surface). This replaces
    GSPMD partitioning of grid_run, whose rewrite of the 27 x K
    static-slice sweep into per-slice collectives made XLA compile times
    explode (>20 min for 64 particles on 8 CPU devices); under shard_map
    the partitioner sees only local ops and two explicit collectives.

    Requires max|offset| <= cells per shard (caller checks via
    shard_halo_fits and falls back to the replicated grid_run)."""
    from jax.sharding import PartitionSpec as P

    offs = _offsets(cfg.grid)
    omax = max(abs(o) for o in offs)
    prm = cfg.contact
    k = cfg.grid.capacity
    nparts = dev_mesh.shape[axis]
    nc = gs.mask.shape[1]
    if nc % nparts or omax > nc // nparts:
        raise ValueError(
            f"grid_run_shardmap requires the padded cell axis ({nc}) to "
            f"split evenly over {nparts} shards with max|offset| ({omax})"
            f" <= cells per shard ({nc // nparts})"
        )
    send_r = [(i, i + 1) for i in range(nparts - 1)]
    send_l = [(i + 1, i) for i in range(nparts - 1)]

    def halo(a):
        # boundary shards receive zeros for the missing neighbor: a
        # zero-mask halo column contributes no pairs (same invariant as
        # grid_pair_forces' zero padding)
        lft = jax.lax.ppermute(a[:, -omax:], axis, send_r)
        rgt = jax.lax.ppermute(a[:, :omax], axis, send_l)
        return jnp.concatenate([lft, a, rgt], axis=1)

    def kernel(pos, vel, radius, mask, pid, ext_g):
        nloc = mask.shape[1]
        m_p, r_p, pid_p = halo(mask), halo(radius), halo(pid)

        def body(carry, _):
            pos, vel = carry
            pos_p = [halo(p) for p in pos]
            vel_p = [halo(v) for v in vel]
            f = _pair_sweep(
                (pos, vel, radius, mask, pid),
                (m_p, pos_p, vel_p, r_p, pid_p),
                offs, omax, nloc, k, prm,
            )
            f = _local_forces(cfg, pos, vel, radius, mask, mass, ext_g, f)
            vel = tuple(
                vel[c] + (cfg.dt / mass) * f[c] * mask for c in range(3)
            )
            pos = tuple(pos[c] + cfg.dt * vel[c] * mask for c in range(3))
            return (pos, vel), None

        (pos, vel), _ = jax.lax.scan(
            body, (pos, vel), None, length=num_steps
        )
        return pos, vel

    spec = P(None, axis)
    kern = jax.shard_map(
        kernel,
        mesh=dev_mesh,
        in_specs=(spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec),
    )
    ext_g = ext if ext is not None else tuple(
        jnp.zeros_like(gs.mask) for _ in range(3)
    )
    pos, vel = jax.jit(kern)(
        gs.pos, gs.vel, gs.radius, gs.mask, gs.pid, ext_g
    )
    return GridState(pos=pos, vel=vel, radius=gs.radius, mask=gs.mask,
                     pid=gs.pid)


def shard_halo_fits(grid: CellGrid, num_cells_padded: int,
                    nparts: int) -> bool:
    """True when the contact sweep's neighbor window fits inside one
    shard of the flat cell axis (the grid_run_shardmap precondition)."""
    omax = max(abs(o) for o in _offsets(grid))
    return (
        num_cells_padded % nparts == 0
        and omax <= num_cells_padded // nparts
    )


def dem_run_grid(cfg: DEMConfig, state: ParticleState, num_steps: int,
                 rebuild_every: int = 20,
                 ext: jnp.ndarray | None = None,
                 shard: tuple | None = None) -> ParticleState:
    """Grid-resident DEM driver: rebuild buckets every `rebuild_every`
    substeps, integrate densely in between. Uniform mass assumed (the
    reference hard-codes mass = 1.0, Particle.c:22). `ext` (P, 3) is an
    external per-particle force (e.g. fluid drag), mapped onto the grid at
    each rebuild.

    `shard` = (jax.sharding.Mesh, axis): the grid-resident state shards
    over contiguous slabs of the (slab-major) flat cell axis; the contact
    sweep runs under shard_map with explicit ppermute halo-band exchange
    (grid_run_shardmap), so the substep loop communicates only
    O(slab surface). Re-bucketing (every `rebuild_every` substeps)
    remains a global exchange by design - particles migrate between
    slabs there. When the grid is too small for the neighbor window to
    fit one slab, the run stays replicated (correct, and cheap at that
    size) instead of letting GSPMD partition the 27-slice sweep."""
    p = state.num_particle
    mass = float(np.asarray(state.mass)[0])
    put = None
    if shard is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        dev_mesh, axis = shard
        nparts = int(np.prod(dev_mesh.devices.shape))
        nc0 = int(np.prod(cfg.grid.dims))
        ncp = -(-nc0 // nparts) * nparts
        if not shard_halo_fits(cfg.grid, ncp, nparts):
            shard = None  # replicated fallback (see docstring)
        else:
            sh_cells = NamedSharding(dev_mesh, PartitionSpec(None, axis))

            def put(gs: GridState) -> GridState:
                # the flat cell axis must split evenly over the devices:
                # pad with empty cells (mask 0, pid = P -> dropped by
                # from_grid's mode="drop" scatter; zero state contributes
                # no forces)
                w = ((0, 0), (0, ncp - gs.mask.shape[1]))
                d = lambda a: jax.device_put(jnp.pad(a, w), sh_cells)
                return GridState(
                    pos=tuple(d(a) for a in gs.pos),
                    vel=tuple(d(a) for a in gs.vel),
                    radius=d(gs.radius),
                    mask=d(gs.mask),
                    pid=jax.device_put(
                        jnp.pad(gs.pid, w, constant_values=p), sh_cells
                    ),
                )
    done = 0
    cur = state
    while done < num_steps:
        n = min(rebuild_every, num_steps - done)
        gs = to_grid(cfg.grid, cur, p)
        # map the external per-particle force onto the grid BEFORE
        # sharding: the gather mixes ext (replicated) with gs.pid, which
        # must share a device mesh
        ext_g = None
        if ext is not None:
            safe = jnp.minimum(gs.pid, p - 1)
            real = (gs.pid < p).astype(gs.mask.dtype)
            ext_g = tuple(ext[:, c][safe] * real for c in range(3))
        if put is not None:
            gs = put(gs)
            if ext_g is not None:
                w = ((0, 0), (0, ncp - ext_g[0].shape[1]))
                ext_g = tuple(
                    jax.device_put(jnp.pad(a, w), sh_cells) for a in ext_g
                )
        if shard is not None:
            gs = grid_run_shardmap(cfg, gs, mass, n, ext_g, dev_mesh, axis)
            # re-bucketing (from_grid -> to_grid) is a global exchange by
            # design: replicate the slab-sharded state for its flat
            # pid-scatter (one all-gather per rebuild window)
            rep = NamedSharding(dev_mesh, PartitionSpec())
            gs = jax.tree_util.tree_map(
                lambda a: jax.device_put(a, rep), gs
            )
        else:
            gs = grid_run(cfg, gs, mass, n, ext_g, None)
        new = from_grid(cfg.grid, gs, p, prev=cur)
        cur = ParticleState(x=new.x, v=new.v, a=new.a, mass=state.mass,
                            radius=state.radius)
        done += n
    return cur
