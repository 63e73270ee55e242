"""Fused Pallas element-Jacobian kernel == XLA oracle (interpret mode).

The compiled-TPU equivalence and timing run in bench/microbenchmarks;
CPU CI exercises the kernel through the Pallas interpreter.
"""

import jax.numpy as jnp
import numpy as np

from dedflow_tpu.app.scenarios import (
    reference_initial_state,
    reference_scenario_config,
)
from dedflow_tpu.fem import ns, weakform
from dedflow_tpu.fem.assembly import build_context
from dedflow_tpu.fem.pallas_kernels import ns_lhs_packed_pallas
from dedflow_tpu.mesh.gen import box_mesh


def test_pallas_lhs_matches_oracle_interpret():
    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    ctx = build_context(mesh, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    wg, dwgold, dwg = (
        jnp.asarray(x, dtype=jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    ref = np.asarray(weakform.ns_lhs_packed(ctx, ef, cfg.physics, cfg.time))
    got = np.asarray(
        ns_lhs_packed_pallas(
            ctx.lhs_geom, ctx.ien_t, wa, cfg.physics, cfg.time, interpret=True
        )
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-5 * scale


def test_pallas_residual_matches_oracle_interpret():
    mesh = box_mesh(3, 2, 2)
    cfg = reference_scenario_config()
    ctx = build_context(mesh, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    wg, dwgold, dwg = (
        jnp.asarray(x, dtype=jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    ef = weakform.gather_fields(ctx.ien, wa, dwa)
    src = jnp.asarray(rng.random(mesh.num_node), jnp.float32)
    from dedflow_tpu.fem.pallas_kernels import ns_residual_pallas

    for source in (None, src):
        src_e = None if source is None else source[ctx.ien]
        ref = np.asarray(
            weakform.ns_residual_elements(ctx, ef, cfg.physics, cfg.time, src_e)
        )
        got = np.asarray(
            ns_residual_pallas(
                ctx.res_geom, ctx.ien_t, wa, dwa, cfg.physics, cfg.time,
                source, interpret=True,
            )
        )
        scale = np.abs(ref).max()
        assert np.abs(ref - got).max() < 2e-5 * scale


def test_fused_residual_kernel_interpret_matches_xla():
    """The fully-fused lattice residual kernel (window DMA + in-kernel
    node reduction) == the XLA pipeline, in Pallas interpret mode on CPU
    (the on-hardware check is tools/tpu_selfcheck.py)."""
    import numpy as np

    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem import pallas_kernels as pk
    from dedflow_tpu.fem.lattice import (
        _reduce_residual,
        _residual_inputs,
        build_lattice_context,
        residual_fused,
    )
    from dedflow_tpu.mesh.gen import box_mesh

    cfg = reference_scenario_config()
    mesh = box_mesh(3, 3, 3)
    lctx = build_lattice_context(mesh, dtype=jnp.float32, rows_backend="xla")
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    f_ref = _reduce_residual(
        lctx,
        pk.res_rows_call(
            _residual_inputs(lctx, wa.T, dwa.T, None),
            cfg.physics, cfg.time, backend="xla",
        ).astype(jnp.float32),
    )
    f_int = residual_fused(
        lctx, wa.T, dwa.T, None, cfg.physics, cfg.time, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(f_int), np.asarray(f_ref), rtol=2e-5, atol=1e-7
    )


def test_fused_carry_kernels_multiblock_interpret():
    """The sequential-grid carry accumulator: with a lane block smaller
    than the mesh (nb > 1), contributions crossing block boundaries ride
    the carry buffer. Residual AND Jacobian vs the XLA pipeline."""
    import numpy as np

    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem import pallas_kernels as pk
    from dedflow_tpu.fem.lattice import (
        _lhs_inputs,
        _reduce_lhs_planes,
        _reduce_residual,
        _residual_inputs,
        build_lattice_context,
        jacobian_fused,
        residual_fused,
    )
    from dedflow_tpu.mesh.gen import box_mesh

    cfg = reference_scenario_config()
    mesh = box_mesh(7, 7, 7)  # 512 nodes; block=128 -> 4 blocks
    lctx = build_lattice_context(mesh, dtype=jnp.float32, rows_backend="xla")
    rng = np.random.default_rng(3)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, dwa = ns.alpha_states(wg, dwgold, dwg, cfg.time)

    f_ref = _reduce_residual(
        lctx,
        pk.res_rows_call(
            _residual_inputs(lctx, wa.T, dwa.T, None),
            cfg.physics, cfg.time, backend="xla",
        ).astype(jnp.float32),
    )
    f_int = residual_fused(
        lctx, wa.T, dwa.T, None, cfg.physics, cfg.time, interpret=True,
        block=128,
    )
    np.testing.assert_allclose(
        np.asarray(f_int), np.asarray(f_ref), rtol=2e-5, atol=1e-6
    )

    j_ref = jnp.stack(
        _reduce_lhs_planes(
            lctx,
            pk.lhs_rows_call(
                _lhs_inputs(lctx, wa.T), cfg.physics, cfg.time, backend="xla"
            ),
        )
    )
    j_int = jacobian_fused(
        lctx, wa.T, cfg.physics, cfg.time, interpret=True, block=128
    )
    # the fused kernel emits the 16 state-dependent components; the
    # phi-phi/T-T identity planes are added by the masking pass
    np.testing.assert_allclose(
        np.asarray(j_int), np.asarray(j_ref[:, :16]), rtol=2e-5, atol=1e-6
    )


def test_lhs_rows_scalar_implicit_interpret_matches_xla():
    """scalar_implicit=True through the Pallas kernel (interpret mode) ==
    the XLA body: guards the kwarg forwarding in _lhs_kernel (ADVICE r4
    high: the TPU backend silently emitted frozen-identity phi/T blocks
    while only the XLA path was tested)."""
    import numpy as np

    from dedflow_tpu.fem import ns
    from dedflow_tpu.fem import pallas_kernels as pk
    from dedflow_tpu.fem.lattice import _lhs_inputs, build_lattice_context
    from dedflow_tpu.mesh.gen import box_mesh

    cfg = reference_scenario_config()
    mesh = box_mesh(3, 3, 3)
    lctx = build_lattice_context(
        mesh, dtype=jnp.float32, rows_backend="xla", scalar_implicit=True
    )
    rng = np.random.default_rng(7)
    wg, dwgold, dwg = (
        jnp.asarray(x, jnp.float32) for x in reference_initial_state(mesh)
    )
    dwg = dwg + 0.1 * jnp.asarray(rng.normal(size=dwg.shape), jnp.float32)
    wa, _ = ns.alpha_states(wg, dwgold, dwg, cfg.time)
    inp = _lhs_inputs(lctx, wa.T)
    assert inp.shape[1] == 33  # the 6 extra metric rows are present
    ref = pk.lhs_rows_call(
        inp, cfg.physics, cfg.time, backend="xla", scalar_implicit=True
    )
    got = pk.lhs_rows_call(
        inp, cfg.physics, cfg.time, backend="pallas", interpret=True,
        scalar_implicit=True,
    )
    ref = np.asarray(ref)
    got = np.asarray(got)
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() < 2e-5 * scale
    # and the phi/T tangent planes (comps 16/17) are NOT the frozen
    # identity: they must depend on the state
    phi_plane = got[:, 16 * 16 : 17 * 16, :]
    assert np.abs(phi_plane).max() > 0
    uniq = np.unique(np.round(np.abs(phi_plane), 6))
    assert len(uniq) > 2  # frozen identity would be exactly {0, 1}


def test_dia_spmv_kernel_interpret_matches_xla():
    """The halo-window DIA SpMV kernel == the shifted-slice XLA matvec,
    interpret mode on CPU."""
    import numpy as np

    from dedflow_tpu.fem.lattice import build_lattice_context
    from dedflow_tpu.mesh.gen import box_mesh
    from dedflow_tpu.sparse.dia_kernels import dia_matvec_pallas
    from dedflow_tpu.sparse.fsbsr import FSDIAMatrixT

    mesh = box_mesh(3, 3, 3)
    lctx = build_lattice_context(mesh, dtype=jnp.float32, rows_backend="xla")
    rng = np.random.RandomState(0)
    d = len(lctx.offsets)
    n = mesh.num_node
    data = jnp.asarray(rng.randn(d, 16, n), jnp.float32)
    scal = jnp.asarray(rng.randn(2 * d, n), jnp.float32)
    mat = FSDIAMatrixT(
        data=data, scal=scal, offsets=lctx.offsets, backend="xla"
    )
    x = jnp.asarray(rng.randn(6, n), jnp.float32)
    y_int = dia_matvec_pallas(data, scal, x, lctx.offsets, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y_int), np.asarray(mat.matvec_t(x)), rtol=2e-5, atol=1e-4
    )
