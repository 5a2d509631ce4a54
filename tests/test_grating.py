"""Diffraction grating tests: the grating equation, wavelength dispersion,
reflective fold, evanescent-order blocking."""

import math

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import DiffractionGrating, Rays, SequentialScene


def _trace(scene, wl, theta_i=0.0, key=None):
    import jax
    key = key or jax.random.PRNGKey(0)
    p = scene.init_params()
    d = [0.0, 0.0, 1.0] if theta_i == 0 else [math.sin(theta_i), 0.0,
                                              math.cos(theta_i)]
    r = Rays.create([[-10.0 * d[0], 0.0, -10.0 * d[2]]], [d],
                    wavelength=[wl])
    out, _, _ = scene.simulate(p, r, key)
    return out


def test_grating_equation_normal_incidence():
    period = 2.0    # um
    scene = SequentialScene([DiffractionGrating(period_um=period, order=1,
                                                name='g')])
    for wl in (0.45, 0.55, 0.65):
        out = _trace(scene, wl)
        sin_out = float(out.dir[0, 0])
        np.testing.assert_allclose(sin_out, wl / period, rtol=1e-5)
        np.testing.assert_allclose(float(jnp.linalg.norm(out.dir[0])), 1.0,
                                   atol=1e-6)


def test_grating_equation_oblique_and_order():
    period, theta_i = 1.6, 0.3
    scene = SequentialScene([DiffractionGrating(period_um=period, order=-2,
                                                name='g')])
    wl = 0.5
    out = _trace(scene, wl, theta_i)
    np.testing.assert_allclose(float(out.dir[0, 0]),
                               math.sin(theta_i) - 2 * wl / period,
                               rtol=1e-5)


def test_reflective_grating_folds():
    scene = SequentialScene([DiffractionGrating(period_um=2.0, order=1,
                                                reflective=True, name='g')])
    out = _trace(scene, 0.55)
    assert float(out.dir[0, 2]) < 0
    np.testing.assert_allclose(float(out.dir[0, 0]), 0.55 / 2.0, rtol=1e-5)


def test_evanescent_order_blocked():
    """m*lambda/d > 1: no propagating order — ray intensity zeroed."""
    scene = SequentialScene([DiffractionGrating(period_um=0.4, order=1,
                                                name='g')])
    out = _trace(scene, 0.55)     # 0.55/0.4 = 1.375 > 1
    assert float(out.intensity[0]) == 0.0


def test_order_zero_transmits():
    import jax
    scene = SequentialScene([DiffractionGrating(period_um=2.0, order=0,
                                                name='g')])
    r = Rays.create([[0.2, -0.1, -5.0]], [[0.1, 0.05, 0.99]],
                    wavelength=[0.55])
    d0 = r.dir / jnp.linalg.norm(r.dir, axis=1, keepdims=True)
    r = Rays.create(r.pos, d0, wavelength=[0.55])
    out, _, _ = scene.simulate(scene.init_params(), r, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out.dir), np.asarray(r.dir),
                               atol=1e-6)


def test_period_gradient_and_roundtrip(tmp_path):
    import jax
    from raytracetorch_tpu import load_scene, save_project

    r = Rays.create([[0.0, 0.0, -5.0]], [[0.0, 0.0, 1.0]], wavelength=[0.6])

    def sin_out(period):
        sc = SequentialScene([DiffractionGrating(period_um=1.0, order=1,
                                                 period_grad=True, name='g')])
        p = sc.init_params()
        p['g']['period_um'] = period
        out, _, _ = sc.simulate(p, r, jax.random.PRNGKey(0))
        return out.dir[0, 0]

    # d(m*lambda/period)/d period = -m*lambda/period^2
    g = jax.grad(sin_out)(jnp.float32(2.0))
    np.testing.assert_allclose(float(g), -0.6 / 4.0, rtol=1e-5)

    sc = SequentialScene([DiffractionGrating(period_um=1.5, order=-2,
                                             reflective=True, diameter=20.0,
                                             name='g')])
    save_project(str(tmp_path / 'g.rtt'), sc)
    g2 = load_scene(str(tmp_path / 'g.rtt')).elements[0]
    assert (g2.order, g2.reflective, g2.diameter) == (-2, True, 20.0)
