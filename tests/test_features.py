"""Feature tests: Fuzzy apodization, irradiance grids, path recording,
headless viz outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, FuzzyAperture, Scene,
                               SensorElement, SequentialScene, SingletLens)


def test_fuzzy_apodization_sequential(key):
    """A Gaussian apodizer modulates intensity by exp(-r^2/w^2)."""
    w2 = 4.0
    fuzzy = FuzzyAperture(
        lambda hit: jnp.exp(-(hit[..., 0] ** 2 + hit[..., 1] ** 2) / w2),
        translation=[0.0, 0.0, 5.0], name='apod')
    scene = SequentialScene([fuzzy])
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0)).sample(key, 2000)
    out, _, _ = scene.simulate(p, rays, key)
    r2 = np.asarray(rays.pos[:, 0] ** 2 + rays.pos[:, 1] ** 2)
    np.testing.assert_allclose(np.asarray(out.intensity),
                               np.exp(-r2 / w2), atol=1e-5)


def test_fuzzy_apodization_nonsequential(key):
    fuzzy = FuzzyAperture(lambda hit: 0.25 * jnp.ones(hit.shape[:-1]),
                          translation=[0.0, 0.0, 5.0], name='apod')
    scene = Scene([fuzzy], n_bounces=1)
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(1.0)).sample(key, 64)
    out, _, _ = scene.simulate(p, rays, key)
    np.testing.assert_allclose(np.asarray(out.intensity), 0.25, atol=1e-6)


def _sensor_scene(grid=()):
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])
    if grid:
        scene.grid_shape = grid
        scene.grid_half_extent = 1.0
    return scene


def test_irradiance_grid(key):
    scene = _sensor_scene(grid=(32, 32))
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -10.0]).sample(key, 20000)
    _, sensors, _ = scene.simulate(p, rays, key)
    g = np.asarray(sensors.grid[0])
    assert g.shape == (32, 32)
    np.testing.assert_allclose(g.sum(), 20000.0, rtol=1e-5)  # energy conserved
    # Focused spot: central 8x8 block holds almost everything
    assert g[12:20, 12:20].sum() > 0.9 * g.sum()
    # Roughly symmetric
    cy = (g.sum(axis=1) * np.arange(32)).sum() / g.sum()
    cx = (g.sum(axis=0) * np.arange(32)).sum() / g.sum()
    np.testing.assert_allclose([cy, cx], [15.5, 15.5], atol=1.0)


def test_path_recording_sequential(key):
    scene = _sensor_scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -10.0]).sample(key, 32)
    out, _, aux = scene.simulate(p, rays, key, record_paths=True)
    paths = np.asarray(aux['paths'])
    assert paths.shape == (5, 32, 3)       # initial + 4 surfaces
    np.testing.assert_allclose(paths[0, :, 2], -10.0, atol=1e-6)
    np.testing.assert_allclose(paths[-1], np.asarray(out.pos), atol=1e-6)
    # z is monotone along each recorded path for this forward-only system
    assert (np.diff(paths[:, :, 2], axis=0) >= -1e-5).all()


def test_record_hits_and_viz(tmp_path, key):
    from raytracetorch_tpu.render.viz import (irradiance_map, path_plot,
                                              profile_plot, save_render,
                                              spot_diagram)
    from raytracetorch_tpu.render.camera import Camera, Renderer
    scene = _sensor_scene(grid=(16, 16))
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -10.0]).sample(key, 1000)
    out, sensors, aux = scene.simulate(p, rays, key, record_hits=True,
                                       record_paths=True)
    # sensor is the last surface row (index 3)
    f1 = spot_diagram(aux['hits'][3], aux['hit_weights'][3],
                      ray_ids=rays.ray_id, path=str(tmp_path / 'spot.png'))
    f2 = irradiance_map(sensors, 0, path=str(tmp_path / 'irr.png'))
    f3 = path_plot(aux['paths'], path=str(tmp_path / 'paths.png'))
    r = Renderer(scene)
    f4 = profile_plot(r, p, 0, path=str(tmp_path / 'profile.png'))
    cam = Camera(position=[20.0, 15.0, -20.0], look_at=[0.0, 0.0, 5.0],
                 width=64, height=48)
    img = r.render_3d(p, cam)
    f5 = save_render(img, str(tmp_path / 'render.png'))
    import os
    for f in (f1, f2, f3, f4, f5):
        assert os.path.getsize(f) > 400
