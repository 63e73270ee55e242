"""Microbenchmarks for the irregular-tier kernel primitives.

The windowed kernels (sparse.win_gather / win_stream / win_ring) are
built from three primitives whose TPU cost model decides the design:

  1. in-kernel lane gather: `jnp.take_along_axis` on (8,128)/(32,128)
  2. one-hot MXU gather: g = x_window @ OH(idx) (bf16-split, exact)
  3. one-hot MXU segment-reduce with HB row-blocks (the P-stack cost
     scales with HB = pack_rows/128)

This tool times each in isolation on the live device at bench-like
sizes so kernel reworks optimize the measured bottleneck, not a guess.
Prints one line per variant; no artifact.

Usage: python tools/gmicro.py [nlanes=8388608]
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from bench import _timeit, log  # noqa: E402

_B = 512  # lanes per grid step


def _run(name, kernel, n, nops_per_block, extra_in=None, reps=8):
    """Time `kernel` over a (8, n) stream in _B-lane blocks with an
    in-jit repetition loop (one dispatch+sync per measurement)."""
    x = jnp.ones((8, n), jnp.float32)
    inputs = [x] + (extra_in or [])
    in_specs = [
        pl.BlockSpec((8, _B), lambda i: (0, i), memory_space=pltpu.VMEM)
    ]
    for e in inputs[1:]:
        in_specs.append(
            pl.BlockSpec(
                (e.shape[0], _B), lambda i: (0, i), memory_space=pltpu.VMEM
            )
        )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, n), jnp.float32),
        grid=(n // _B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (8, _B), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )

    def loop(x, *extra):
        def body(_, v):
            y = call(v, *extra)
            return y

        return jax.lax.fori_loop(0, reps, body, x)

    c = jax.jit(loop).lower(*inputs).compile()
    t = _timeit(c, *inputs, r1=1, r2=3) / reps
    per_block_us = t / (n // _B) * 1e6
    log(
        f"{name:34s} {t*1e3:8.2f} ms  {per_block_us*1e3:7.1f} ns/block"
        f"  ({per_block_us*940:7.0f} cyc/blk @0.94GHz)"
    )
    return t


def k_reduce(x_ref, i_ref, o_ref, hb):
    """ring quad_body contraction: P-expand + one-hot reduce, HB blocks."""
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    zb = jnp.zeros((8, 128), jnp.bfloat16)
    phs, pls, ohs = [], [], []
    for d in range(4):
        g = x_ref[:, d * 128 : (d + 1) * 128]
        erow = i_ref[0:1, d * 128 : (d + 1) * 128] & (hb * 128 - 1)
        hi8 = jnp.broadcast_to(erow >> 7, (8, 128))
        p8h = g.astype(jnp.bfloat16)
        p8l = (g - p8h.astype(jnp.float32)).astype(jnp.bfloat16)
        masks = [hi8 == h for h in range(hb)]
        phs.append(jnp.concatenate([jnp.where(m, p8h, zb) for m in masks], 0))
        pls.append(jnp.concatenate([jnp.where(m, p8l, zb) for m in masks], 0))
        ohs.append(
            (jnp.broadcast_to(erow & 127, (128, 128)) == lo_iota).astype(
                jnp.bfloat16
            )
        )
    P = jnp.concatenate([jnp.concatenate(phs, 1), jnp.concatenate(pls, 1)], 0)
    OH = jnp.concatenate(ohs, 1)
    out = jax.lax.dot_general(
        P, OH, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc = out[: 8 * hb] + out[8 * hb :]  # (8*hb, 128)
    r = jnp.broadcast_to(jnp.sum(acc, axis=0, keepdims=True), (8, 128))
    o_ref[:, :] = jnp.concatenate([r, r, r, r], axis=1)


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 23
    rng = np.random.RandomState(0)

    # --- 1. pure copy baseline -------------------------------------------
    def k_copy(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] * 2.0

    _run("copy*2", k_copy, n, 1)

    # --- 2. take_along_axis lane gather ----------------------------------
    idx = jnp.asarray(
        rng.randint(0, 128, size=(8, n)).astype(np.int32)
    )

    def k_taa8(x_ref, i_ref, o_ref):
        # 4 independent (8,128) take_along_axis per block
        for t in range(4):
            tbl = x_ref[:, t * 128 : (t + 1) * 128]
            ii = i_ref[:, t * 128 : (t + 1) * 128]
            o_ref[:, t * 128 : (t + 1) * 128] = jnp.take_along_axis(
                tbl, ii, axis=-1
            )

    _run("take_along (8,128) x4", k_taa8, n, 4, [idx])

    def k_taa32(x_ref, i_ref, o_ref):
        # one (32,128) take_along per block (current win_* shape)
        tbl = x_ref[:, :512].reshape(32, 128)
        ii = i_ref[:, :512].reshape(32, 128) & 127
        g = jnp.take_along_axis(tbl, ii, axis=-1)
        o_ref[:, :512] = g.reshape(8, 512)

    _run("take_along (32,128) x1", k_taa32, n, 1, [idx])

    # --- 3. windowed-gather emulation (win_body shape) -------------------
    # per vreg: concat 4 tiles -> (32,128) take_along -> 4-way select
    def k_winbody(x_ref, i_ref, o_ref, nwin):
        for d in range(4):
            ids = i_ref[0:1, d * 128 : (d + 1) * 128]
            m32 = jnp.broadcast_to(ids & 127, (32, 128))
            par8 = jnp.broadcast_to((ids >> 7) & 3, (8, 128))
            w8 = jnp.broadcast_to(ids >> 9, (8, 128))

            def win_body(k, gacc, m32=m32, par8=par8, w8=w8):
                tbl = jnp.concatenate(
                    [x_ref[:, 128 * kk : 128 * kk + 128] for kk in range(4)],
                    axis=0,
                )
                got = jnp.take_along_axis(tbl, m32, axis=-1)
                for kk in range(4):
                    gacc = jnp.where(
                        (w8 == k) & (par8 == kk),
                        got[8 * kk : 8 * kk + 8],
                        gacc,
                    )
                return gacc

            g = jax.lax.fori_loop(
                0, nwin, win_body, jnp.zeros((8, 128), jnp.float32)
            )
            o_ref[:, d * 128 : (d + 1) * 128] = g

    for nw in (1, 2, 4):
        _run(
            f"win_body emul nwin={nw}",
            functools.partial(k_winbody, nwin=nw),
            n,
            nw,
            [idx],
        )

    # --- 4. one-hot MXU gather -------------------------------------------
    # g(8,128) = xwin(8,512) @ OH(512,128), bf16-split exact
    iota512 = None

    def k_ohgather(x_ref, i_ref, o_ref):
        xw = x_ref[:, :512]
        hi = xw.astype(jnp.bfloat16)
        lo = (xw - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        rows = jax.lax.broadcasted_iota(jnp.int32, (512, 128), 0)
        for d in range(4):
            ids = i_ref[0:1, d * 128 : (d + 1) * 128] & 511
            oh = (rows == jnp.broadcast_to(ids, (512, 128))).astype(
                jnp.bfloat16
            )
            g = jax.lax.dot_general(
                hi, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                lo, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[:, d * 128 : (d + 1) * 128] = g

    _run("OH-matmul gather 512-win x4", k_ohgather, n, 4, [idx])

    # --- 5. one-hot segment reduce, HB sweep -----------------------------
    for hb in (16, 8, 4, 1):
        _run(
            f"OH seg-reduce quad HB={hb}",
            functools.partial(k_reduce, hb=hb),
            n,
            1,
            [idx],
        )


if __name__ == "__main__":
    main()
