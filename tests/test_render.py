"""Renderer smoke + correctness tests (numeric replacement for the
reference's golden-image eyeballing, tests/render_static.py:17-105)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CircularAperture, Scene, SensorElement,
                               SingletLens, SphericalMirror)
from raytracetorch_tpu.render.camera import (Camera, OrbitCamera, Renderer,
                                             ior_color)


def _scene():
    return Scene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=5.0, translation=[0.0, 0.0, 10.0],
                         name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
        SphericalMirror(c1=-0.02, d=8.0, translation=[0.0, 0.0, 30.0],
                        name='mirror'),
    ])


def test_render_smoke():
    scene = _scene()
    p = scene.init_params()
    cam = Camera(position=[25.0, 18.0, -25.0], look_at=[0.0, 0.0, 10.0],
                 fov_deg=45.0, width=96, height=64)
    r = Renderer(scene)
    img = np.asarray(r.jit_render(cam)(p))
    assert img.shape == (64, 96, 3)
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
    # Some pixels hit geometry (not all background)
    bg = np.all(img == 1.0, axis=-1)
    frac_hit = 1.0 - bg.mean()
    assert 0.02 < frac_hit < 0.98
    # Image is not flat
    assert img.std() > 0.01


def test_render_excludes_apertures():
    """Aperture plates must not occlude elements behind them (reference
    render/camera.py:203-211)."""
    scene = _scene()
    p = scene.init_params()
    # Camera staring straight down the axis at the aperture plane
    cam = Camera(position=[0.0, 0.0, -30.0], look_at=[0.0, 0.0, 0.0],
                 fov_deg=20.0, width=32, height=32)
    img = np.asarray(Renderer(scene).render_3d(p, cam))
    # The center pixel sees the lens (refractive color = bluish/white), and
    # nothing renders pure aperture color anywhere since apertures are
    # excluded; mainly: the lens is visible, image not background at center.
    center = img[16, 16]
    assert not np.allclose(center, [1.0, 1.0, 1.0])


def test_ior_colormap_anchors():
    np.testing.assert_allclose(np.asarray(ior_color(jnp.float32(1.0))),
                               [0.9, 0.9, 0.9], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ior_color(jnp.float32(1.3))),
                               [0.0, 1.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ior_color(jnp.float32(1.4))),
                               [0.3, 0.6, 1.0], atol=1e-6)
    # midpoint between white and cyan
    mid = np.asarray(ior_color(jnp.float32(1.15)))
    np.testing.assert_allclose(mid, [0.45, 0.95, 0.95], atol=1e-6)


def test_scan_profile_recovers_lens_sag():
    scene = _scene()
    p = scene.init_params()
    r = Renderer(scene)
    coords, z, valid = r.scan_profile(p, 0, axis='x', num_points=101,
                                      bounds=(-6.0, 6.0))
    z = np.asarray(z)
    valid = np.asarray(valid)
    coords = np.asarray(coords)
    inside = np.abs(coords) <= 4.9
    # Front face (surface 0): z = -1.5 + sag(c1=0.05)
    assert valid[inside, 0].all()
    sag = 0.05 * coords ** 2 / (1 + np.sqrt(1 - 0.05 ** 2 * coords ** 2))
    np.testing.assert_allclose(z[inside, 0], (-1.5 + sag)[inside], atol=1e-4)
    # Outside the aperture the faces are invalid
    assert not valid[np.abs(coords) > 5.1, 0].any()


def test_orbit_camera_controls():
    cam = OrbitCamera(pivot=[0.0, 0.0, 0.0],
                      position=[0.0, 0.0, -30.0], look_at=[0.0, 0.0, 0.0],
                      fov_deg=30.0, width=8, height=8)
    d0 = float(jnp.linalg.norm(cam.origin - cam.pivot))
    cam.orbit(0.3, 0.1)
    np.testing.assert_allclose(float(jnp.linalg.norm(cam.origin - cam.pivot)),
                               d0, rtol=1e-5)       # orbit preserves radius
    cam.zoom(1.0)
    assert float(jnp.linalg.norm(cam.origin - cam.pivot)) < d0
    cam.pan(1.0, 0.5)
    rays = cam.generate_rays()
    assert rays.pos.shape == (64, 3)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(rays.dir, axis=1)),
                               1.0, atol=1e-5)
