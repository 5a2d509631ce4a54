"""Multi-chip SPMD tests on the virtual 8-device CPU mesh: sharded ray
traces must be numerically identical to single-device runs, and the full
training step must compile+run with sharded rays (SURVEY.md §2.12)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.parallel.sharding import (make_mesh, ray_sharding,
                                                 shard_rays)


def _scene():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ('data', 'rays')
    mesh = make_mesh(8, n_data=4)
    assert mesh.devices.shape == (4, 2)


def test_sharded_trace_matches_single_device(key):
    scene = _scene()
    params = scene.init_params()
    bundle = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0.0, 0.0, -10.0])
    rays = bundle.sample(key, 4096)

    out_ref, sensors_ref, _ = jax.jit(
        lambda p, r, k: scene.simulate(p, r, k))(params, rays, key)

    mesh = make_mesh(8)
    rays_sharded = shard_rays(rays, mesh)
    out_sh, sensors_sh, _ = jax.jit(
        lambda p, r, k: scene.simulate(p, r, k))(params, rays_sharded, key)

    np.testing.assert_allclose(out_sh.pos, out_ref.pos, atol=1e-5)
    np.testing.assert_allclose(out_sh.intensity, out_ref.intensity, atol=1e-6)
    np.testing.assert_allclose(sensors_sh.moments, sensors_ref.moments,
                               rtol=1e-5)
    # The output ray state actually came back sharded over the mesh
    assert not out_sh.pos.is_fully_replicated


def test_sharded_gradients_match(key):
    scene = _scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(
        radius=jnp.float32(4.0),
        translation=[0.0, 0.0, -10.0]).sample(key, 2048)

    def loss(p, r):
        _, sensors, _ = scene.simulate(p, r, key)
        return sensors.spot_rms(0)[0]

    g_ref = jax.jit(jax.grad(loss))(params, rays)
    mesh = make_mesh(8)
    g_sh = jax.jit(jax.grad(loss))(params, shard_rays(rays, mesh))
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=1e-7)


def test_graft_dryrun():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    ge.dryrun_multichip(8)


def test_sharded_fused_trace_matches(key):
    """simulate_fused_sharded: the Pallas kernel under shard_map (per-shard
    tiles + psum'd moments/grid) reproduces the unsharded XLA trace on the
    8-device virtual mesh."""
    scene = _scene()
    scene.grid_shape = (16, 16)
    scene.grid_half_extent = 2.0
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key,
                                                                     4096)
    out_ref, s_ref, _ = scene.simulate(params, rays, key)
    mesh = make_mesh(8)
    out_sh, s_sh, _ = jax.jit(lambda p, r, k: scene.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1))(params, shard_rays(rays, mesh), key)
    np.testing.assert_allclose(np.asarray(out_sh.pos),
                               np.asarray(out_ref.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_sh.moments),
                               np.asarray(s_ref.moments), rtol=1e-5,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(s_sh.grid),
                               np.asarray(s_ref.grid), rtol=1e-5, atol=1e-4)
    scene.grid_shape = ()


def test_sharded_nonseq_fused_matches(key):
    """Scene.simulate_fused_sharded: the bounce-loop kernel under
    shard_map reproduces the unsharded XLA nonseq trace on the virtual
    mesh."""
    from raytracetorch_tpu import Scene

    scene = Scene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ], n_bounces=8)
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key,
                                                                     4096)
    out_ref, s_ref, _ = scene.simulate(params, rays, key)
    mesh = make_mesh(8)
    out_sh, s_sh, _ = jax.jit(lambda p, r, k: scene.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1))(params, shard_rays(rays, mesh), key)
    # per-ray mismatch budget for compile-cache FP jitter (see
    # tests/test_pallas.py::test_nonseq_fused_matches_xla)
    dp = np.abs(np.asarray(out_sh.pos) - np.asarray(out_ref.pos)).max(1)
    assert int(np.sum(dp > 1e-4)) <= 8
    np.testing.assert_allclose(np.asarray(s_sh.moments)[0, 0, 0],
                               np.asarray(s_ref.moments)[0, 0, 0], atol=8.0)


def test_sharded_fused_phase_grid(key):
    """simulate_fused_sharded passes the traced phase-grid side channel
    through shard_map (replicated) — values AND per-pixel gradients match
    the unsharded XLA path (the grid cotangent psums across shards via
    shard_map's transpose of the replicated in_spec)."""
    from raytracetorch_tpu import PhaseGridPlate

    n, hx = 16, 4.0
    scene = SequentialScene([
        PhaseGridPlate(half_x=hx, half_y=hx, shape=(n, n), name='pp'),
        SensorElement(radius=20.0, translation=[0, 0, 50.0], name='s')])
    xs = np.linspace(-hx, hx, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    params = scene.init_params()
    params['pp']['grid'] = jnp.asarray(3.0 * X + 0.15 * Y * Y, jnp.float32)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=0.5876).sample(key, 2048)
    mesh = make_mesh(8)

    out_ref, s_ref, _ = scene.simulate(params, rays, key)
    out_sh, s_sh, _ = jax.jit(lambda p, r, k: scene.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1))(params, shard_rays(rays, mesh), key)
    np.testing.assert_allclose(np.asarray(out_sh.dx),
                               np.asarray(out_ref.dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_sh.moments),
                               np.asarray(s_ref.moments), rtol=1e-5,
                               atol=1e-3)

    def mk(sim):
        def loss(p, r):
            _, sens, _ = sim(p, r)
            m = sens.moments[0, 0]
            return m[1] / jnp.maximum(m[0], 1e-9) + 1e-3 * m[3]
        return loss

    g_ref = jax.jit(jax.grad(mk(
        lambda p, r: scene.simulate(p, r, key))))(params, rays)
    g_sh = jax.jit(jax.grad(mk(
        lambda p, r: scene.simulate_fused_sharded(p, r, key, mesh,
                                                  block_rows=1))))(
        params, shard_rays(rays, mesh))
    np.testing.assert_allclose(np.asarray(g_sh['pp']['grid']),
                               np.asarray(g_ref['pp']['grid']), atol=1e-6)


def test_sharded_fused_aux_streams(key):
    """track_opl / track_field through the SHARDED fused drivers: per-ray
    aux streams come back sharded along N and match the unsharded XLA
    trace; the nonseq grid now psums across shards too."""
    from raytracetorch_tpu import Scene

    scene = _scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key,
                                                                     4096)
    mesh = make_mesh(8)
    _, _, aux_ref = scene.simulate(params, rays, key, track_opl=True,
                                   track_field=True)
    _, _, aux_sh = jax.jit(lambda p, r, k: scene.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1, track_opl=True,
        track_field=True))(params, shard_rays(rays, mesh), key)
    np.testing.assert_allclose(np.asarray(aux_sh['opl']),
                               np.asarray(aux_ref['opl']), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux_sh['field_power']),
                               np.asarray(aux_ref['field_power']),
                               rtol=1e-5, atol=1e-6)

    # non-sequential: grid psum + opl stream
    ns = scene.to_base()
    ns.n_bounces = 8
    ns.grid_shape = (16, 16)
    ns.grid_half_extent = 2.0
    pn = ns.init_params()
    _, s_ref, auxn_ref = ns.simulate(pn, rays, key, track_opl=True)
    _, s_sh, auxn_sh = jax.jit(lambda p, r, k: ns.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1, track_opl=True))(
            pn, shard_rays(rays, mesh), key)
    np.testing.assert_allclose(np.asarray(s_sh.grid),
                               np.asarray(s_ref.grid), rtol=1e-5,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(auxn_sh['opl']),
                               np.asarray(auxn_ref['opl']), rtol=1e-6)


def test_sharded_nonseq_fused_phase_grid(key):
    """Scene.simulate_fused_sharded passes the phase-grid side channel
    through shard_map (replicated extra, like the sequential variant) —
    the bounce-loop kernel's per-ray streams match the unsharded XLA
    trace.  (Gradients through the sharded nonseq path are a real-TPU
    feature: on CPU the custom_vjp routes to XLA-recompute, which
    cannot run inside shard_map.)"""
    from raytracetorch_tpu import PhaseGridPlate, Scene

    n, hx = 16, 4.0
    scene = Scene([
        PhaseGridPlate(half_x=hx, half_y=hx, shape=(n, n), name='pp'),
        SensorElement(radius=20.0, translation=[0, 0, 50.0], name='s')],
        n_bounces=3)
    xs = np.linspace(-hx, hx, n)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    params = scene.init_params()
    params['pp']['grid'] = jnp.asarray(3.0 * X + 0.15 * Y * Y, jnp.float32)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -3.0],
                               wavelength=0.5876).sample(key, 2048)
    mesh = make_mesh(8)
    out_ref, s_ref, _ = scene.simulate(params, rays, key)
    out_sh, s_sh, _ = jax.jit(lambda p, r, k: scene.simulate_fused_sharded(
        p, r, k, mesh, block_rows=1))(params, shard_rays(rays, mesh), key)
    np.testing.assert_allclose(np.asarray(out_sh.dx),
                               np.asarray(out_ref.dx), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_sh.moments),
                               np.asarray(s_ref.moments), rtol=1e-5,
                               atol=1e-3)


def test_shard_count_invariance_sweep(key):
    """Weak-scaling correctness artifact (round-4 VERDICT ask #6): trace
    outputs, sensor moments, irradiance grids AND gradients are
    SHARD-COUNT INVARIANT — 1/2/4/8-device meshes (make_mesh picks
    1x1 / 1x2 / 2x2 / 2x4 data-x-rays splits) all reproduce the
    unsharded XLA reference through the fused sequential kernel, and
    the fused nonseq bounce-loop kernel's moments/grid psums likewise.
    (Nonseq gradients under shard_map are a real-TPU feature — the CPU
    custom_vjp routes to XLA-recompute, which cannot run inside
    shard_map; see test_sharded_nonseq_fused_phase_grid.)  Recorded in
    BASELINE.md as the multi-chip correctness evidence alongside the
    8-device dryrun."""
    from raytracetorch_tpu import Scene

    scene = _scene()
    scene.grid_shape = (16, 16)
    scene.grid_half_extent = 2.0
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key,
                                                                     2048)
    out_ref, s_ref, _ = scene.simulate(params, rays, key)

    def loss(sim):
        def f(p, r):
            _, sens, _ = sim(p, r)
            m = sens.moments[0, 0]
            return (m[1] + m[2]) / jnp.maximum(m[0], 1e-9) \
                + 1e-3 * jnp.sum(sens.grid[0, ::4, ::4])
        return f

    g_ref = jax.jit(jax.grad(loss(
        lambda p, r: scene.simulate(p, r, key))))(params, rays)

    nonseq = Scene(list(_scene().elements), n_bounces=8)
    nonseq.grid_shape = (16, 16)
    nonseq.grid_half_extent = 2.0
    pn = nonseq.init_params()
    _, sn_ref, _ = nonseq.simulate(pn, rays, key)

    for n_dev in (1, 2, 4, 8):
        mesh = make_mesh(n_dev)
        assert mesh.devices.size == n_dev
        r_sh = shard_rays(rays, mesh)

        out_sh, s_sh, _ = jax.jit(
            lambda p, r, k, m=mesh: scene.simulate_fused_sharded(
                p, r, k, m, block_rows=1))(params, r_sh, key)
        np.testing.assert_allclose(np.asarray(out_sh.pos),
                                   np.asarray(out_ref.pos), atol=1e-5,
                                   err_msg=f'pos @ {n_dev} shards')
        np.testing.assert_allclose(np.asarray(s_sh.moments),
                                   np.asarray(s_ref.moments), rtol=1e-5,
                                   atol=1e-3,
                                   err_msg=f'moments @ {n_dev} shards')
        np.testing.assert_allclose(np.asarray(s_sh.grid),
                                   np.asarray(s_ref.grid), rtol=1e-5,
                                   atol=1e-4,
                                   err_msg=f'grid @ {n_dev} shards')

        g_sh = jax.jit(jax.grad(loss(
            lambda p, r, m=mesh: scene.simulate_fused_sharded(
                p, r, key, m, block_rows=1))))(params, r_sh)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g_sh)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=2e-3, atol=1e-6,
                err_msg=f'grad @ {n_dev} shards')

        _, sn_sh, _ = jax.jit(
            lambda p, r, k, m=mesh: nonseq.simulate_fused_sharded(
                p, r, k, m, block_rows=1))(pn, r_sh, key)
        np.testing.assert_allclose(
            np.asarray(sn_sh.moments)[0, 0, 0],
            np.asarray(sn_ref.moments)[0, 0, 0], atol=4.0,
            err_msg=f'nonseq flux @ {n_dev} shards')
        np.testing.assert_allclose(np.asarray(sn_sh.grid),
                                   np.asarray(sn_ref.grid), rtol=1e-4,
                                   atol=1e-3,
                                   err_msg=f'nonseq grid @ {n_dev} shards')
