"""Measure the device's irregular-data-motion cost laws.

The irregular-mesh Jacobian scatter moves ~19M (element, pair) update
rows into ~3M matrix entries; every candidate design bottoms out in one
of a handful of primitives. This tool measures each at bench scale so
the design choice is data, not guesswork:

  1. take_rows (M, D) by K random indices, D in {4, 16, 64, 256}
     at constant gathered bytes - is the XLA row gather row-count-bound
     (latency) or byte-bound (bandwidth)?
  2. column gather x[:, idx] on (16, M) - the "free view" layout the
     element kernel can emit without a transpose.
  3. XLA transpose (64, M) -> (M, 64) - the relayout a row-major tile
     gather would require.
  4. sorted-index segment_sum of (K, 16) into S segments - XLA's own
     reduction for pre-permuted updates.
  5. take_rows with a SORTED index stream (the locality case).

Usage: python tools/gatherlaw.py [bytes_gathered_gb=1.5]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from bench import _timeit, log  # noqa: E402


def main():
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/dedflow_jax_cache_tpu"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001
        pass
    from dedflow_tpu.utils.xla import take_rows

    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
    src_bytes = 1.2e9  # the (ne*16, 16) f32 update array's size
    rng = np.random.default_rng(0)

    nrep = 4

    def timed(name, fn, *args, val_count=None):
        def loop(*a):
            def body(_, x):
                out = fn(x, *a[1:])
                leaf = jax.tree_util.tree_leaves(out)[0]
                return x.at[(0,) * x.ndim].add(
                    (1e-6 * leaf.reshape(-1)[0]).astype(x.dtype)
                )

            return fn(jax.lax.fori_loop(0, nrep - 1, body, a[0]), *a[1:])

        c = jax.jit(loop).lower(*args).compile()
        t = _timeit(c, *args, r1=1, r2=3) / nrep
        extra = ""
        if val_count:
            extra = (f"  {val_count / t / 1e9:.2f} G idx/s, "
                     f"{val_count and gb * 1e9 / t / 1e9:.0f} GB/s gathered")
        log(f"{name:44s} {t*1e3:9.2f} ms{extra}")
        return t

    for d in (4, 16, 64, 256):
        m = int(src_bytes / (4 * d))
        # TPU tiled layout T(8,128) pads the minor dim to 128: a (K, 4)
        # f32 gather output materializes as (K, 128) - cap the PADDED
        # bytes at 2 GB (measured: an uncapped d=4 probe tried 48 GB)
        k = int(min(gb * 1e9, 2e9 * d / max(d, 128)) / (4 * d))
        x = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, m, size=k).astype(np.int32))
        timed(f"take_rows ({m//1000}k, {d}) by {k//1000}k rnd", take_rows,
              x, idx, val_count=k)
        idx_s = jnp.asarray(np.sort(np.asarray(idx)).astype(np.int32))
        timed(f"take_rows ({m//1000}k, {d}) by {k//1000}k sorted",
              take_rows, x, idx_s, val_count=k)
        del x, idx, idx_s

    # column gather on the free-view layout
    m = int(src_bytes / (4 * 16))
    k = int(gb * 1e9 / (4 * 16))
    xc = jnp.asarray(rng.standard_normal((16, m)).astype(np.float32))
    idxc = jnp.asarray(rng.integers(0, m, size=k).astype(np.int32))
    timed(f"col gather (16, {m//1000}k)[:, idx] {k//1000}k rnd",
          lambda x, i: x[:, i], xc, idxc, val_count=k)
    del xc, idxc

    # transpose (64, M) -> (M, 64)
    m = int(src_bytes / (4 * 64))
    xt = jnp.asarray(rng.standard_normal((64, m)).astype(np.float32))
    timed(f"transpose (64, {m//1000}k) -> ({m//1000}k, 64)",
          lambda x: x.T.reshape(-1, 64), xt)
    del xt

    # sorted segment-sum (K, 16) -> (S, 16), mean degree 6.5
    k = int(gb * 1e9 / (4 * 16))
    s = k // 6
    seg = np.sort(rng.integers(0, s, size=k)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((k, 16)).astype(np.float32))
    segj = jnp.asarray(seg)
    timed(
        f"sorted segment_sum ({k//1000}k, 16) -> {s//1000}k",
        lambda v, t: jax.ops.segment_sum(
            v, t, num_segments=s, indices_are_sorted=True
        ),
        vals, segj, val_count=k,
    )
    # unsorted for comparison
    segu = jnp.asarray(rng.permutation(seg).astype(np.int32))
    timed(
        f"unsorted segment_sum ({k//1000}k, 16) -> {s//1000}k",
        lambda v, t: jax.ops.segment_sum(v, t, num_segments=s),
        vals, segu, val_count=k,
    )


if __name__ == "__main__":
    main()
