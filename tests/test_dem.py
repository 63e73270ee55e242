"""DEM subsystem tests (BASELINE configs #4-5; the reference has no
particle dynamics to mirror - Particle.c:120-130 are empty no-ops).

- cell-list contact forces == O(P^2) brute force,
- two-particle head-on collision: momentum conserved, energy dissipated,
- wall bounce stays inside the box,
- settling under gravity comes to rest (kinetic energy -> ~0),
- particle HDF5 round-trip in the reference layout,
- point-in-tet location + P1 interpolation exactness,
- drag exchange conserves momentum (reaction = -sum of drag).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dedflow_tpu.dem import (
    ContactParams,
    DEMConfig,
    ParticleState,
    dem_run,
    dem_step,
    particle_state,
)
from dedflow_tpu.dem.cells import build_buckets, candidate_lists, cell_stats, make_grid
from dedflow_tpu.dem.contact import brute_force_pairs, pair_forces
from dedflow_tpu.dem.integrate import forces, kinetic_energy
from dedflow_tpu.dem import coupling
from dedflow_tpu.dem.particles import load_particles, save_particles


def _random_cloud(p=200, seed=0, box=1.0, radius=0.05):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.05, box - 0.05, size=(p, 3))
    v = rng.normal(scale=0.1, size=(p, 3))
    return particle_state(x, v, radius=radius)


def test_cell_list_matches_brute_force():
    st = _random_cloud(p=300)
    grid = make_grid([0, 0, 0], [1, 1, 1], cell_size=0.12, capacity=24)
    stats = cell_stats(grid, np.asarray(st.x))
    assert stats["overflow"] == 0, stats
    prm = ContactParams(k_n=1e3, gamma_n=1.0)
    buckets = build_buckets(grid, st.x)
    cand = candidate_lists(grid, st.x, buckets)
    f_cell = pair_forces(st.x, st.v, st.radius, cand, prm)
    f_ref = brute_force_pairs(st.x, st.v, st.radius, prm)
    np.testing.assert_allclose(np.asarray(f_cell), np.asarray(f_ref), rtol=1e-12, atol=1e-12)


def test_head_on_collision_momentum_and_dissipation():
    x = np.array([[0.4, 0.5, 0.5], [0.6, 0.5, 0.5]])
    v = np.array([[1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    st = particle_state(x, v, radius=0.06)
    grid = make_grid([0, 0, 0], [1, 1, 1], cell_size=0.15, capacity=4)
    cfg = DEMConfig(
        grid=grid,
        contact=ContactParams(k_n=1e4, gamma_n=5.0),
        gravity=(0.0, 0.0, 0.0),
        dt=1e-4,
    )
    e0 = float(kinetic_energy(st))
    out = dem_run(cfg, st, 2000)
    mom = np.asarray(out.mass[:, None] * out.v).sum(axis=0)
    np.testing.assert_allclose(mom, 0.0, atol=1e-10)  # symmetric collision
    # particles separated and moving apart after the bounce
    assert float(out.x[1, 0] - out.x[0, 0]) > 0.12
    assert float(out.v[1, 0]) > 0 and float(out.v[0, 0]) < 0
    e1 = float(kinetic_energy(out))
    assert e1 < e0  # dashpot dissipates


def test_wall_bounce_stays_inside():
    st = particle_state(
        np.array([[0.5, 0.5, 0.3]]), np.array([[0.0, 0.0, -2.0]]), radius=0.05
    )
    grid = make_grid([0, 0, 0], [1, 1, 1], cell_size=0.2, capacity=4)
    cfg = DEMConfig(
        grid=grid,
        contact=ContactParams(k_n=1e5, gamma_n=2.0),
        gravity=(0.0, 0.0, 0.0),
        dt=5e-5,
        walls_lo=(0.0, 0.0, 0.0),
        walls_hi=(1.0, 1.0, 1.0),
    )
    out = dem_run(cfg, st, 4000)
    z = float(out.x[0, 2])
    assert 0.0 < z < 1.0
    assert float(out.v[0, 2]) > 0  # bounced upward


@pytest.mark.slow
def test_settling_comes_to_rest():
    # sized for suite latency: 24 particles, dt=1e-4 (well under the
    # contact stability limit 2*sqrt(m/k_n) ~ 9e-3), 1.2 s simulated
    rng = np.random.default_rng(3)
    x = rng.uniform(0.1, 0.9, size=(24, 3)) * np.array([1.0, 1.0, 0.4])
    x[:, 2] += 0.15
    st = particle_state(x, radius=0.04, mass=1.0)
    grid = make_grid([0, 0, 0], [1, 1, 1], cell_size=0.1, capacity=24)
    cfg = DEMConfig(
        grid=grid,
        contact=ContactParams(k_n=5e4, gamma_n=300.0),
        gravity=(0.0, 0.0, -9.81),
        dt=1e-4,
        walls_lo=(0.0, 0.0, 0.0),
        walls_hi=(1.0, 1.0, 1.0),
        linear_drag=2.0,
    )
    out = dem_run(cfg, st, 12000)  # 1.2 s simulated
    # at rest on the floor: low kinetic energy, all particles near z ~ radius
    assert float(kinetic_energy(out)) < 5e-2
    assert float(jnp.max(out.x[:, 2])) < 0.5  # pile collapsed
    assert float(jnp.min(out.x[:, 2])) > 0.0


def test_particle_h5_roundtrip(tmp_path):
    st = _random_cloud(p=17)
    path = str(tmp_path / "particles.h5")
    save_particles(path, "ptc", st)
    back = load_particles(path, "ptc")
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(st.x))
    np.testing.assert_allclose(np.asarray(back.v), np.asarray(st.v))
    np.testing.assert_allclose(np.asarray(back.radius), np.asarray(st.radius))


# ---------------------------------------------------------------------------
# coupling


@pytest.fixture(scope="module")
def fem_ctx():
    from dedflow_tpu.fem.assembly import build_context
    from dedflow_tpu.mesh.gen import box_mesh

    mesh = box_mesh(4, 4, 4)
    return mesh, build_context(mesh)


def test_locate_and_interpolate_linear_exact(fem_ctx):
    mesh, ctx = fem_ctx
    grid = coupling.element_grid(mesh.xg, mesh.ien)
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.uniform(0.05, 0.95, size=(40, 3)))
    elem, bary = coupling.locate(grid, ctx, pts)
    assert (np.asarray(elem) >= 0).all()
    np.testing.assert_allclose(np.asarray(bary).sum(axis=1), 1.0, atol=1e-12)
    # P1 interpolation reproduces linear fields exactly
    coeff = jnp.asarray([0.3, -1.2, 2.5])
    nodal = ctx.xg @ coeff  # (N,)
    got = coupling.interpolate(ctx, elem, bary, nodal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(pts @ coeff), atol=1e-10)
    # a point outside the mesh is reported not-found
    elem2, bary2 = coupling.locate(grid, ctx, jnp.asarray([[2.0, 2.0, 2.0]]))
    assert int(elem2[0]) == -1
    np.testing.assert_allclose(np.asarray(bary2), 0.0)


def test_drag_exchange_conserves_momentum(fem_ctx):
    mesh, ctx = fem_ctx
    grid = coupling.element_grid(mesh.xg, mesh.ien)
    rng = np.random.default_rng(5)
    st = particle_state(rng.uniform(0.2, 0.8, size=(25, 3)), radius=0.01)
    w = jnp.zeros((mesh.num_node, 6)).at[:, 0].set(1.0)  # uniform u_x = 1
    f_p, f_n = coupling.drag_exchange(grid, ctx, st, w, mu=1.0e-3)
    # drag pushes particles along +x
    assert (np.asarray(f_p)[:, 0] > 0).all()
    np.testing.assert_allclose(
        np.asarray(f_n).sum(axis=0), -np.asarray(f_p).sum(axis=0), rtol=1e-10
    )


@pytest.mark.slow
def test_coupled_fem_dem_step():
    """Two-way coupled step (BASELINE config #5, small): particles are
    dragged along by the channel flow, the fluid sees the reaction, and
    everything stays finite and convergent."""
    import jax.numpy as jnp

    from dedflow_tpu.app.coupled import CoupledConfig, CoupledSolver
    from dedflow_tpu.app.scenarios import (
        reference_initial_state,
        reference_scenario_config,
    )
    from dedflow_tpu.dem.integrate import DEMConfig
    from dedflow_tpu.mesh.gen import box_mesh

    mesh = box_mesh(4, 3, 3)
    cfg = reference_scenario_config()
    rng = np.random.default_rng(0)
    pst = particle_state(
        rng.uniform(0.3, 0.7, size=(20, 3)), radius=0.02, mass=0.01
    )
    dem_cfg = DEMConfig(
        grid=make_grid([0, 0, 0], [1, 1, 1], cell_size=0.1, capacity=8),
        contact=ContactParams(k_n=1e3, gamma_n=1.0),
        gravity=(0.0, 0.0, 0.0),
        dt=1e-3,
        walls_lo=(0.0, 0.0, 0.0),
        walls_hi=(1.0, 1.0, 1.0),
    )
    for use_grid in (False, True):
        solver = CoupledSolver(
            mesh, cfg,
            CoupledConfig(dem=dem_cfg, drag_mu=5.0, substeps=10,
                          use_grid=use_grid),
        )
        wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))
        pst_i = pst
        x0 = np.asarray(pst_i.x)
        for _ in range(3):
            wg, dwgold, dwg, pst_i, stats = solver.step(wg, dwgold, dwg, pst_i)
            assert np.isfinite(np.asarray(wg)).all()
            assert np.isfinite(np.asarray(pst_i.x)).all()
        dx = np.asarray(pst_i.x) - x0
        # flow is +x: particles drifted downstream, much less across
        assert dx[:, 0].mean() > 1e-4, use_grid
        assert abs(dx[:, 1].mean()) < dx[:, 0].mean(), use_grid

    # fixed-Newton (zero-host-sync) coupled step tracks the adaptive one
    solver = CoupledSolver(
        mesh, cfg,
        CoupledConfig(dem=dem_cfg, drag_mu=5.0, substeps=10, use_grid=True),
    )
    wg, dwgold, dwg = (jnp.asarray(x) for x in reference_initial_state(mesh))
    wg_a, dwgold_a, dwg_a, pst_a, _ = solver.step(wg, dwgold, dwg, pst)
    wg_f, dwgold_f, dwg_f, pst_f, stats_f = solver.step(
        wg, dwgold, dwg, pst, num_newton=4
    )
    assert stats_f is None
    scale = np.abs(np.asarray(wg_a)).max()
    np.testing.assert_allclose(
        np.asarray(wg_f) / scale, np.asarray(wg_a) / scale,
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.slow
def test_grid_dem_matches_candidate_path():
    """Dense grid-resident contacts == the candidate-list oracle."""
    from dedflow_tpu.dem import grid as gdem
    from dedflow_tpu.dem.integrate import DEMConfig, dem_run

    rng = np.random.default_rng(7)
    p = 150
    x = rng.uniform(0.08, 0.92, size=(p, 3))
    v = rng.normal(scale=0.05, size=(p, 3))
    st = particle_state(x, v, radius=0.03, mass=1.0)
    cell_grid = make_grid([0, 0, 0], [1, 1, 1], cell_size=0.08, capacity=8)
    assert cell_stats(cell_grid, x)["overflow"] == 0
    cfg = DEMConfig(
        grid=cell_grid,
        contact=ContactParams(k_n=2e3, gamma_n=3.0),
        gravity=(0.0, 0.0, -9.81),
        dt=1e-4,
        walls_lo=(0, 0, 0),
        walls_hi=(1, 1, 1),
        linear_drag=0.5,
    )
    # force equality at t=0
    gs = gdem.to_grid(cell_grid, st, p)
    fg = gdem.grid_forces(cfg, gs, 1.0)
    f_grid = np.zeros((p, 3))
    pid = np.asarray(gs.pid).reshape(-1)
    ok = pid < p
    for c in range(3):
        f_grid[pid[ok], c] = np.asarray(fg[c]).reshape(-1)[ok]
    from dedflow_tpu.dem.integrate import forces

    f_ref = np.asarray(forces(cfg, st))
    np.testing.assert_allclose(f_grid, f_ref, rtol=1e-10, atol=1e-10)

    # short trajectory equality (same integrator, rebuild every step)
    out_ref = dem_run(cfg, st, 40)
    out_grid = gdem.dem_run_grid(cfg, st, 40, rebuild_every=10)
    np.testing.assert_allclose(
        np.asarray(out_grid.x), np.asarray(out_ref.x), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(out_grid.v), np.asarray(out_ref.v), rtol=1e-5, atol=1e-7
    )


def test_grid_run_shardmap_matches_replicated():
    """The shard_map substep loop (explicit ppermute halo bands over
    contiguous cell slabs) must reproduce the replicated grid_run
    trajectory. The grid is elongated along x so the 27-offset neighbor
    window fits one slab of 8 (the grid_run_shardmap precondition)."""
    from dedflow_tpu.dem import grid as gdem
    from dedflow_tpu.dem.integrate import DEMConfig

    rng = np.random.default_rng(11)
    p = 120
    x = rng.uniform((0.05, 0.05, 0.05), (1.95, 0.35, 0.35), size=(p, 3))
    v = rng.normal(scale=0.05, size=(p, 3))
    st = particle_state(x, v, radius=0.03, mass=1.0)
    cell_grid = make_grid([0, 0, 0], [2, 0.4, 0.4], cell_size=0.1, capacity=8)
    cfg = DEMConfig(
        grid=cell_grid,
        contact=ContactParams(k_n=2e3, gamma_n=3.0),
        gravity=(0.0, 0.0, -9.81),
        dt=1e-4,
        walls_lo=(0, 0, 0),
        walls_hi=(2, 0.4, 0.4),
        linear_drag=0.5,
    )
    nparts = 8
    nc = int(np.prod(cell_grid.dims))
    ncp = -(-nc // nparts) * nparts
    assert gdem.shard_halo_fits(cell_grid, ncp, nparts), (
        "test misconfigured: the shardmap path would fall back"
    )
    ext = rng.normal(scale=0.2, size=(p, 3)).astype(np.float64)

    out_ref = gdem.dem_run_grid(cfg, st, 20, rebuild_every=5, ext=jnp.asarray(ext))
    dmesh = jax.make_mesh((nparts,), ("dd",))
    out_sh = gdem.dem_run_grid(
        cfg, st, 20, rebuild_every=5, ext=jnp.asarray(ext),
        shard=(dmesh, "dd"),
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.x), np.asarray(out_ref.x), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(out_sh.v), np.asarray(out_ref.v), rtol=1e-7, atol=1e-9
    )


@pytest.mark.parametrize("cap", [2, 3, 5, 11])
def test_pallas_contact_kernel_k_sweep_interpret(cap):
    """The fused contact kernel must compile and match the XLA sweep for
    ANY cell capacity K, not just the historical K=8: the r4 bench sized
    K from the measured occupancy and odd K hit a Mosaic compile error
    (VERDICT r4 weak #1 - field blocks packed at non-sublane-aligned
    row offsets). Interpret mode on CPU; the on-hardware sweep runs in
    bench.py."""
    from dedflow_tpu.dem import grid as gdem

    rng = np.random.default_rng(cap)
    p = 400
    x = rng.uniform(0.05, 0.55, size=(p, 3))
    v = rng.normal(scale=0.05, size=(p, 3))
    st = particle_state(x, v, radius=0.03, mass=1.0)
    cell_grid = make_grid(
        [0, 0, 0], [0.6, 0.6, 0.6], cell_size=0.08, capacity=cap
    )
    prm = ContactParams(k_n=2e3, gamma_n=3.0)
    gs = gdem.to_grid(cell_grid, st, p)
    gs = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        gs,
    )
    f_ref = gdem.grid_pair_forces(cell_grid, gs, prm)
    f_pal = gdem.grid_pair_forces_pallas(cell_grid, gs, prm, interpret=True)
    for c in range(3):
        np.testing.assert_allclose(
            np.asarray(f_pal[c]), np.asarray(f_ref[c]), rtol=2e-5, atol=1e-4
        )
