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


def test_convolve_psf_matches_direct():
    """MXU image-simulation convolution (utils/imaging.py): matches a
    direct numpy convolution, conserves flux, and a delta object
    reproduces the (normalized) PSF."""
    import numpy as np

    from raytracetorch_tpu.utils.imaging import convolve_psf

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(24, 24)).astype(np.float32)
    psf = rng.uniform(size=(5, 5)).astype(np.float32)
    out = np.asarray(convolve_psf(img, psf))
    # direct 'same' convolution with zero padding
    pn = psf / psf.sum()
    ref = np.zeros_like(img)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            w = pn[2 - dy, 2 - dx]
            src = np.zeros_like(img)
            ys = slice(max(0, dy), 24 + min(0, dy))
            yd = slice(max(0, -dy), 24 + min(0, -dy))
            xs = slice(max(0, dx), 24 + min(0, dx))
            xd = slice(max(0, -dx), 24 + min(0, -dx))
            src[yd, xd] = img[ys, xs]
            ref += w * src
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    # delta object -> PSF; interior flux conserved
    delta = np.zeros((31, 31), np.float32)
    delta[15, 15] = 1.0
    out_d = np.asarray(convolve_psf(delta, psf))
    np.testing.assert_allclose(out_d[13:18, 13:18], pn, rtol=1e-5,
                               atol=1e-7)
    np.testing.assert_allclose(out_d.sum(), 1.0, rtol=1e-5)

    # per-channel kernels ([k, k, C]) convolve independently
    img3 = np.stack([img, 2 * img, 0 * img], -1)
    psf3 = np.stack([psf, psf, psf], -1)
    out3 = np.asarray(convolve_psf(img3, psf3))
    np.testing.assert_allclose(out3[..., 0], out, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out3[..., 1], 2 * out, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out3[..., 2], 0 * out, atol=1e-7)


def test_simulate_image_through_aberrated_system():
    """simulate_image: a defocused pupil blurs an edge target more than a
    flat pupil; energy is conserved; gradients flow back to the OPD."""
    import numpy as np

    from raytracetorch_tpu.utils.imaging import simulate_image

    n = 16
    yy, xx = np.mgrid[-1:1:n * 1j, -1:1:n * 1j]
    amp = jnp.asarray((xx ** 2 + yy ** 2 <= 1.0).astype(np.float32))
    r2 = jnp.asarray((xx ** 2 + yy ** 2).astype(np.float32))
    edge = jnp.asarray((np.mgrid[0:32, 0:32][1] >= 16).astype(np.float32))

    def blur_metric(defocus):
        opd = defocus * r2 * amp
        sim, _, _ = simulate_image(edge, opd, amp, wavelength=0.55,
                                   f_number=4.0)
        # edge sharpness: mean squared horizontal gradient (lower = blurrier)
        return jnp.mean((sim[:, 1:] - sim[:, :-1]) ** 2)

    import jax
    sharp = float(blur_metric(0.0))
    blurred = float(blur_metric(2.0))
    assert blurred < 0.7 * sharp, (sharp, blurred)
    g = jax.grad(blur_metric)(jnp.float32(1.0))
    assert np.isfinite(float(g)) and abs(float(g)) > 0
