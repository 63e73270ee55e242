"""Windowed nodal-state gather (sparse.win_gather) vs its XLA oracle.

The kernel replaces the XLA row-gather+transpose of the irregular
assembly path (reference: LoadElementValueKernel assemble.cu:135-154);
these tests pin exact equality through the Pallas interpreter on the
RCM-ordered Delaunay meshes the windowed path runs on.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dedflow_tpu.mesh.gen import delaunay_mesh
from dedflow_tpu.mesh.reorder import rcm_order, reorder_mesh
from dedflow_tpu.sparse.win_gather import (
    build_gather_plan,
    win_gather,
    win_gather_xla,
)


@pytest.fixture(scope="module")
def mesh():
    m = delaunay_mesh(700, seed=11)
    return reorder_mesh(m, rcm_order(np.asarray(m.ien), m.num_node))


def test_win_gather_matches_oracle(mesh):
    ien_t = jnp.asarray(np.asarray(mesh.ien).T.astype(np.int32))
    n = mesh.num_node
    plan = build_gather_plan(np.asarray(mesh.ien).T, n)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((14, n)).astype(np.float32))
    # a representative row map: drop some comps, interleave the rest
    rowmap = tuple(
        tuple((c * 4 + a) if c % 3 != 2 else -1 for c in range(14))
        for a in range(4)
    )
    out_rows = 56
    got = win_gather(plan, ien_t, x, rowmap, out_rows, interpret=True)
    want = win_gather_xla(ien_t, x, rowmap, out_rows)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_win_gather_single_group(mesh):
    """C <= 8 path (the Jacobian's u gather)."""
    ien_t = jnp.asarray(np.asarray(mesh.ien).T.astype(np.int32))
    n = mesh.num_node
    plan = build_gather_plan(np.asarray(mesh.ien).T, n)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
    rowmap = tuple(
        tuple((c * 4 + a) if c < 3 else -1 for c in range(8))
        for a in range(4)
    )
    got = win_gather(plan, ien_t, x, rowmap, 12, interpret=True)
    want = win_gather_xla(ien_t, x, rowmap, 12)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
