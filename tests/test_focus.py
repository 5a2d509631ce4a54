"""Best-focus solves (utils/focus.py): the closed form must sit at the
minimum of the explicitly-scanned through-focus curve, beat the paraxial
image plane under spherical aberration, survive refocus round-trips
through the sensor machinery, and differentiate."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import enable_x64

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens,
                               best_focus_plane, refocus, through_focus_rms)


def _scene():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=4.0, name='stop'),
        SensorElement(radius=6.0, translation=[0, 0, 19.322],
                      name='sensor')])


def _trace(scene, p, n=20000, r=4.0):
    key = jax.random.PRNGKey(0)
    rays = CollimatedDisk.make(radius=r,
                               translation=[0, 0, -10.0]).sample(key, n)
    out, sensors, _ = scene.simulate(p, rays, key)
    return out, sensors, rays, key


def test_best_focus_matches_through_focus_minimum():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        out, _, _, _ = _trace(sc, p)
        z_star, rms = best_focus_plane(out)
        zs = jnp.linspace(float(z_star) - 0.5, float(z_star) + 0.5, 201)
        curve = np.asarray(through_focus_rms(out, zs))
        i = int(np.argmin(curve))
        assert abs(float(zs[i]) - float(z_star)) <= 0.006  # grid step
        assert np.isclose(curve[i], float(rms), rtol=1e-4)
        # quadratic: both neighbors are worse
        assert curve[i] <= curve[0] and curve[i] <= curve[-1]


def test_spherical_aberration_pulls_focus_in():
    # Marginal focus < paraxial focus for positive spherical aberration:
    # z* sits INSIDE the paraxial image plane and the RMS there is far
    # smaller than at the paraxial plane.
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        fo = sc.first_order(p, aperture=4.0)
        out, _, _, _ = _trace(sc, p)
        z_star, rms = best_focus_plane(out)
        z_par = float(fo.z_image)
        assert float(z_star) < z_par
        rms_par = float(through_focus_rms(out, jnp.asarray([z_par]))[0])
        assert float(rms) < 0.6 * rms_par


def test_refocus_moves_sensor_to_best_plane():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        key = jax.random.PRNGKey(0)
        rays = CollimatedDisk.make(radius=4.0,
                                   translation=[0, 0, -10.0]).sample(key,
                                                                     20000)
        p2, z_star, rms = refocus(sc, p, rays, key)
        assert np.isclose(float(p2['sensor']['trans'][2]), float(z_star))
        # re-trace on the refocused scene: the sensor's own spot RMS now
        # matches the solve's prediction
        _, sensors, _, _ = _trace(sc, p2)
        assert np.isclose(float(sensors.spot_rms(0)[0]), float(rms),
                          rtol=2e-2)


def test_dead_rays_excluded_by_weight():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        key = jax.random.PRNGKey(0)
        rays = CollimatedDisk.make(radius=4.0,
                                   translation=[0, 0, -10.0]).sample(key,
                                                                     20000)
        out, _, _ = sc.simulate(p, rays, key)
        z0, _ = best_focus_plane(out)
        # weight by LAUNCH pupil zone: the marginal annulus focuses
        # shorter, the inner disk longer — z* ordered accordingly
        w = np.asarray(out.intensity).copy()
        r2 = np.asarray(rays.px) ** 2 + np.asarray(rays.py) ** 2
        z_m, _ = best_focus_plane(out, weights=jnp.asarray(
            w * (r2 > np.median(r2))))
        z_i, _ = best_focus_plane(out, weights=jnp.asarray(
            w * (r2 <= np.median(r2))))
        assert float(z_m) < float(z0) < float(z_i)


def test_best_focus_gradient():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        key = jax.random.PRNGKey(0)
        rays = CollimatedDisk.make(radius=4.0,
                                   translation=[0, 0, -10.0]).sample(key,
                                                                     2000)

        def zstar(c1v):
            q = dict(p)
            q['lens'] = dict(q['lens'])
            q['lens']['c1'] = c1v
            out, _, _ = sc.simulate(q, rays, key)
            return best_focus_plane(out)[0]

        c1v = jnp.asarray(0.05, jnp.float64)
        g = float(jax.grad(zstar)(c1v))
        eps = 1e-6
        fd = float((zstar(c1v + eps) - zstar(c1v - eps)) / (2 * eps))
        assert np.isclose(g, fd, rtol=1e-5)
        assert g < 0      # stronger curvature focuses shorter
