"""Zernike decomposition + geometric MTF tests."""

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, Rays, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.mtf import geometric_mtf, mtf50
from raytracetorch_tpu.utils.wavefront import (opl_to_point, zernike_fit,
                                               best_focus)


def test_zernike_recovers_synthetic_terms(key):
    import jax
    k1, k2 = jax.random.split(key)
    n = 4000
    x = jax.random.uniform(k1, (n,), minval=-1, maxval=1)
    y = jax.random.uniform(k2, (n,), minval=-1, maxval=1)
    keep = x * x + y * y <= 1.0
    x, y = x[keep], y[keep]
    rho2 = x * x + y * y
    # synthetic OPD: 0.3 defocus (2rho^2 - 1) + 0.1 spherical (6rho^4-6rho^2+1)
    opd = 0.3 * (2 * rho2 - 1) + 0.1 * (6 * rho2 ** 2 - 6 * rho2 + 1)
    xy = jnp.stack([x, y], axis=1)
    coef = np.asarray(zernike_fit(xy, opd, radius=1.0))
    np.testing.assert_allclose(coef[3], 0.3, atol=1e-3)    # defocus
    np.testing.assert_allclose(coef[10], 0.1, atol=1e-3)   # spherical
    others = np.delete(coef, [0, 3, 10])
    assert np.abs(others).max() < 1e-3


def test_zernike_of_traced_singlet(key):
    """The aberrated singlet's wavefront decomposes into dominantly
    spherical aberration (plus defocus relative to the sensor plane)."""
    scene = SequentialScene([SingletLens(
        c1=0.016667, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        name='lens')])
    p = scene.init_params()
    radius = 8.0
    rays = CollimatedDisk.make(radius=jnp.float32(radius),
                               translation=[0, 0, -10.0]).sample(key, 6000)
    out, _, aux = scene.simulate(p, rays, key, track_opl=True)
    F = best_focus(out)
    opd = opl_to_point(out, aux['opl'], F)
    opd = opd - jnp.mean(opd)
    # pupil coordinates = launch positions
    xy = rays.pos[:, :2]
    coef = np.asarray(zernike_fit(xy, opd, radius=radius))
    # rotational symmetry: tilt/astig/coma negligible vs spherical
    assert abs(coef[10]) > 5 * max(abs(coef[1]), abs(coef[2]), abs(coef[6]))


def test_geometric_mtf_sharp_vs_blurred(key):
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        SensorElement(radius=2.0, translation=[0, 0, 101.2], name='sensor'),
    ])
    scene.grid_shape = (128, 128)
    scene.grid_half_extent = 0.5
    p = scene.init_params()

    def psf(radius):
        rays = CollimatedDisk.make(radius=jnp.float32(radius),
                                   translation=[0, 0, -10.0]).sample(key,
                                                                     50000)
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.grid[0]

    pitch = 1.0 / 128  # grid spans [-0.5, 0.5]
    f_sharp, mx_sharp, _ = geometric_mtf(psf(1.5), pitch)
    f_blur, mx_blur, _ = geometric_mtf(psf(10.0), pitch)
    m50_sharp = float(mtf50(f_sharp, mx_sharp))
    m50_blur = float(mtf50(f_blur, mx_blur))
    assert m50_sharp > 2 * m50_blur      # aberrated aperture kills contrast
    assert float(mx_sharp[0]) == 1.0     # normalized at DC
