"""win_stream permute/reduce vs the segment-sum oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from dedflow_tpu.sparse.win_stream import (
    build_stream_plan,
    plan_stats,
    stream_index_rows,
    stream_reduce_xla,
    win_stream_reduce,
)


@pytest.fixture(
    scope="module", params=["banded", "permute", "banded-streamed"]
)
def setup(request):
    rng = np.random.default_rng(0)
    num_tgt, n_src = 5000, 20000
    n_contrib = 60000
    if request.param.startswith("banded"):
        # banded sparsity: source near 4x target (mesh-like locality)
        tgt = rng.integers(0, num_tgt, n_contrib)
        src = np.clip(
            4 * tgt + rng.integers(-300, 300, n_contrib), 0, n_src - 1
        )
    else:
        # 1:1 permutation (the state-gather use)
        n_contrib = n_src
        src = rng.permutation(n_src)
        tgt = np.clip(np.arange(n_src) // 4, 0, num_tgt - 1)
    resident = None if request.param != "banded-streamed" else False
    plan = build_stream_plan(tgt, src, num_tgt, n_src, resident=resident)
    assert plan.resident == (request.param != "banded-streamed")
    x = jnp.asarray(rng.normal(size=(6, n_src)).astype(np.float32))
    return plan, x, tgt, src


def test_oracle_matches_numpy(setup):
    plan, x, tgt, src = setup
    y = np.asarray(stream_reduce_xla(plan, x))
    ref = np.zeros((6, plan.num_tgt), np.float32)
    np.add.at(ref.T, tgt, np.asarray(x).T[src])
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_kernel_matches_oracle(setup):
    plan, x, tgt, src = setup
    idx = stream_index_rows(plan)
    y_pl = np.asarray(win_stream_reduce(plan, idx, x, interpret=True))
    y_ref = np.asarray(stream_reduce_xla(plan, x))
    np.testing.assert_allclose(y_pl, y_ref, rtol=2e-4, atol=2e-4)


def test_kernel_scale(setup):
    plan, x, tgt, src = setup
    idx = stream_index_rows(plan)
    y1 = np.asarray(win_stream_reduce(plan, idx, x, interpret=True))
    y2 = np.asarray(
        win_stream_reduce(plan, idx, x, scale=-2.0, interpret=True)
    )
    np.testing.assert_allclose(y2, -2.0 * y1, rtol=1e-6, atol=1e-5)


def test_plan_stats(setup):
    plan, x, tgt, src = setup
    st = plan_stats(plan)
    assert st["pad_frac"] < 0.2
    assert st["win_mean"] >= 1.0
