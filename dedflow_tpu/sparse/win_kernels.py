"""Pallas TPU kernels for the WinELL irregular-mesh matrix (sparse.winell).

`winell_matvec` replaces the reference's cuSPARSE CSR SpMV
(matrix.c:151-162) for meshes with no translation structure. Grid = one
2048-row superpack per step; per 128-entry vreg (entries column-sorted
within the superpack):

  1. gather x: 1-2 iterations (measured mean 1.62 on a 1.18M-tet RCM
     Delaunay mesh) over the vreg's 256-lane column windows, each ONE
     (16,128) `take_along_axis` against the window's two x-tiles stacked
     on sublanes - the only dynamic gather the hardware has, measured
     ~30 cycles per op at 8 or 16 sublanes;
  2. products: the WinELL component order makes the 4x4 vel/p block
     mixing four (4,128) FMAs against sublane-broadcast gathered rows;
  3. row reduction: a one-hot contraction on the MXU, factored as
     row-block (row>>7) masks x (row&127) one-hot, applied as TWO bf16
     matmuls on a hi/lo split of the products - exact to f32 rounding
     (the one-hot is bf16-exact; the split restores the f32 mantissa),
     ~3x cheaper than a 6-pass f32 matmul.

The matrix's vals array carries ecol/erow as bitcast int32 rows 18/19
(rows 18..23 are sublane padding of the 18 packed components) plus a
vmax-vreg zero tail, both installed once at construction
(winell.winell_matrix), so the whole per-step stream is ONE DMA with a
static size. x is re-laid as (16, N/2) - each 256-lane window's two
128-tiles stacked on sublanes - and stays VMEM-resident for the entire
grid (fits to ~3M nodes; larger meshes would window it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows 18/19 of the (24, S) vals array hold ecol/erow as int32 bits
ECOL_ROW = 18
EROW_ROW = 19
SP = 1024  # superpack rows (must match winell.SP; see winell.py note)
HB = SP // 128  # row-blocks per superpack

# Tests flip this to run through the interpreter on CPU.
INTERPRET = False


def _bf16_split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _matvec_kernel(
    voff_ref, vwin_ref, vals_hbm, x_hbm, o_ref, xbuf, dbuf, sem_x, sem_d,
    *, vmax,
):
    i = pl.program_id(0)
    ni = pl.num_programs(0)

    def chunk_copy(step, slot):
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(voff_ref[step] * 128, vmax * 128)],
            dbuf.at[slot],
            sem_d.at[slot],
        )

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(x_hbm, xbuf, sem_x)
        cp.start()
        chunk_copy(0, 0).start()
        cp.wait()

    @pl.when(i + 1 < ni)
    def _():
        chunk_copy(i + 1, (i + 1) % 2).start()

    chunk_copy(i, i % 2).wait()
    buf = dbuf.at[i % 2]
    base = voff_ref[i]

    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)

    def one_vreg(v):
        """Gather + products + bf16-split P-stacks for ONE entry vreg.
        Returns (Ph, Pl, ohT) for the quad-batched MXU reduction."""
        off = pl.multiple_of((v - base) * 128, 128)
        blk = buf[:, pl.ds(off, 128)]  # (24, 128)
        ecol = pltpu.bitcast(blk[ECOL_ROW : ECOL_ROW + 1, :], jnp.int32)
        erow = pltpu.bitcast(blk[EROW_ROW : EROW_ROW + 1, :], jnp.int32)
        m16 = jnp.broadcast_to(ecol & 127, (16, 128))
        par8 = jnp.broadcast_to((ecol >> 7) & 1, (8, 128))
        w8 = jnp.broadcast_to(ecol >> 8, (8, 128))
        # window schedule from SMEM (scalar prefetch): computing it from
        # ecol (jnp.min/max) stalls the vector pipe on a vector->scalar
        # transfer every vreg - measured ~230 cycles per window
        sched = vwin_ref[v]
        wlo = sched >> 10
        nwin = sched & 1023

        def win_body(t, g):
            w = wlo + t
            tbl = xbuf[:, pl.ds(pl.multiple_of(w * 128, 128), 128)]
            got = jnp.take_along_axis(tbl, m16, axis=-1)  # (16, 128)
            inw = w8 == w
            g = jnp.where(inw & (par8 == 0), got[:8], g)
            return jnp.where(inw & (par8 == 1), got[8:16], g)

        # the measured window count is 1.62 mean / 13 p99: two
        # unconditional bodies cover ~95% of vregs branch-free; the rare
        # tail runs the guarded loop
        g = win_body(0, jnp.zeros((8, 128), jnp.float32))
        g = win_body(1, g)
        g = jax.lax.fori_loop(2, nwin, win_body, g)
        # products
        p4 = jnp.zeros((4, 128), jnp.float32)
        for k in range(4):
            wk = blk[4 * k : 4 * k + 4, :]
            p4 = p4 + wk * jnp.broadcast_to(g[k : k + 1, :], (4, 128))
        psc = blk[16:18, :] * g[4:6, :]
        p8 = jnp.concatenate(
            [p4, psc, jnp.zeros((2, 128), jnp.float32)], axis=0
        )
        # bf16 hi/lo split BEFORE the P-stack (split of the (8,128) p8 is
        # 3 ops; splitting the stacked (128,128) costs 16x that)
        p8h, p8l = _bf16_split(p8)
        zb = jnp.zeros((8, 128), jnp.bfloat16)
        # P-stacks: rows h*8+c = p8[c] masked to row-block h = erow>>7
        hi8 = jnp.broadcast_to(erow >> 7, (8, 128))
        masks = [hi8 == h for h in range(HB)]
        Ph = jnp.concatenate(
            [jnp.where(m, p8h, zb) for m in masks], axis=0
        )
        Pl = jnp.concatenate(
            [jnp.where(m, p8l, zb) for m in masks], axis=0
        )
        ohT = (jnp.broadcast_to(erow & 127, (128, 128)) == lo_iota).astype(
            jnp.bfloat16
        )
        return Ph, Pl, ohT

    def quad_body(qd, acc):
        # 4 vregs per MXU reduction: ONE (256, 512)@(128, 512) bf16 dot
        # replaces 8 (128,128)@(128,128) dots - the per-pass MXU overhead
        # at these tiny shapes was ~60% of the kernel (measured)
        v0 = base + qd * 4
        phs, pls, ohs = [], [], []
        for d in range(4):
            ph, plo, oh = one_vreg(v0 + d)
            phs.append(ph)
            pls.append(plo)
            ohs.append(oh)
        P = jnp.concatenate(
            [jnp.concatenate(phs, axis=1), jnp.concatenate(pls, axis=1)],
            axis=0,
        )  # (256, 512)
        OH = jnp.concatenate(ohs, axis=1)  # (128, 512)
        out = jax.lax.dot_general(
            P, OH, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (256, 128)
        return acc + out[: 8 * HB] + out[8 * HB :]

    nquads = (voff_ref[i + 1] - voff_ref[i]) // 4
    acc = jax.lax.fori_loop(
        0, nquads, quad_body, jnp.zeros((8 * HB, 128), jnp.float32)
    )
    # acc row h*8+c holds y[c] for rows [h*128, (h+1)*128)
    for h in range(HB):
        for c in range(6):
            o_ref[c, h * 128 : (h + 1) * 128] = acc[h * 8 + c, :]
    o_ref[6:8, :] = jnp.zeros((2, SP), jnp.float32)


def winell_matvec(mat, x_t: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    """(6, N) -> (6, N) SpMV on a WinELL matrix (f32 compute)."""
    if interpret is None:
        interpret = INTERPRET
    n = mat.num_node
    nsteps, vmax = mat.nsteps, mat.vmax
    npad = nsteps * SP

    x8 = jnp.zeros((8, npad), jnp.float32)
    x8 = x8.at[:6, :n].set(x_t.astype(jnp.float32))
    # window layout (16, npad/2): rows 0..7 = even 128-tile, 8..15 = odd
    xr = x8.reshape(8, npad // 256, 2, 128)
    x16 = jnp.concatenate(
        [xr[:, :, 0, :].reshape(8, -1), xr[:, :, 1, :].reshape(8, -1)],
        axis=0,
    )
    # one dead window: the branch-free second window body may slice one
    # window past a vreg's last real one (its selects discard the values)
    x16 = jnp.pad(x16, ((0, 0), (0, 128)))

    kern = functools.partial(_matvec_kernel, vmax=vmax)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, SP), lambda i, voff, vwin: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((16, npad // 2 + 128), jnp.float32),
            pltpu.VMEM((2, 24, vmax * 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8, npad), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(mat.pack_voff, mat.vwin, mat.vals, x16)
    return out[:6, :n].astype(x_t.dtype)
