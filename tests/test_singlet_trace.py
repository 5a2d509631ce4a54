"""End-to-end sequential trace of a thick singlet: traced rays must focus at
the analytic thick-lens back focal plane, and the paraxial engine must agree.

This is the accuracy gate of SURVEY.md §7 step 4 and the core parity check
against the reference's thick-lens analytics (elements/lens.py:60-92).
NOTE (PARITY.md): the reference's own traced rays do NOT reproduce these
analytics — its RefractSnell inverts the IOR ratio; we gate against physics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, Rays, SensorElement,
                               SequentialScene, SingletLens)


def _bench_scene():
    """The reference benchmark singlet (benchmarks/sim_benchmark.py:56-95):
    c=+/-0.05, d=10, t=3, n=1.5; f = 20.339, bfl = 19.322."""
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                    ior_glass=1.5, ior_media=1.0, name='lens'),
    ])
    return scene


def test_singlet_paraxial_matches_thick_lens_analytics():
    scene = _bench_scene()
    lens = scene.elements[0]
    p = scene.init_params()
    M = scene.paraxial(p)
    P_sys = -M[1, 0]
    f_analytic = lens.f(p['lens'])
    np.testing.assert_allclose(1.0 / P_sys, f_analytic, rtol=1e-5)
    # Known value: P = (n-1)(c1-c2) + (n-1)^2 c1 c2 t / n
    P_expect = 0.5 * 0.1 - 0.25 * 0.05 * 0.05 * 3.0 / 1.5
    np.testing.assert_allclose(P_sys, P_expect, rtol=1e-5)


def test_singlet_trace_focuses_at_bfl(key):
    scene = _bench_scene()
    lens = scene.elements[0]
    p = scene.init_params()

    # Paraxial pencil: small radius so spherical aberration is negligible
    bundle = CollimatedDisk.make(radius=jnp.float32(0.5),
                                 translation=[0.0, 0.0, -10.0])
    rays = bundle.sample(key, 2000)

    out, sensors, _ = jax.jit(
        lambda pp, r, k: scene.simulate(pp, r, k))(p, rays, key)

    assert float(jnp.mean(out.intensity)) > 0.99   # nothing blocked

    # Propagate to the analytic BFL plane and measure the RMS radius there
    lp = p['lens']
    z_focus = float(lens.f_bfl(lp)) + 1.5    # bfl measured from back vertex
    t_to = (z_focus - out.pos[:, 2]) / out.dir[:, 2]
    xy = out.pos[:, :2] + t_to[:, None] * out.dir[:, :2]
    rms = float(jnp.sqrt(jnp.mean(jnp.sum(xy ** 2, axis=1))))
    # Paraxial pencil of radius 0.5 through f/20 optics: tight focus
    assert rms < 5e-3, f"RMS at BFL plane = {rms}"


def test_singlet_trace_rays_bend_toward_axis(key):
    """A marginal ray at height h exits with slope ~ -h/f (converging)."""
    scene = _bench_scene()
    p = scene.init_params()
    rays = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    slope = float(out.dir[0, 1] / out.dir[0, 2])
    f = float(scene.elements[0].f(p['lens']))
    np.testing.assert_allclose(slope, -2.0 / f, rtol=0.05)


def test_sensor_moments_accumulate(key):
    scene = _bench_scene()
    scene.add_element(SensorElement(radius=6.0, translation=[0.0, 0.0, 19.32],
                                    name='sensor'))
    p = scene.init_params()
    bundle = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0.0, 0.0, -10.0])
    rays = bundle.sample(key, 5000)
    out, sensors, _ = scene.simulate(p, rays, key)
    w = float(sensors.total_weight(0)[0])
    assert w > 4500          # nearly all rays land on the sensor
    rms = float(sensors.spot_rms(0)[0])
    # defocus + spherical-aberration blur at the z=19.32 sensor (true focus
    # is at z ~ 20.2 for the r=4 marginal zone): measured ~0.125
    assert 0.0 < rms < 0.3
    c = np.asarray(sensors.centroid(0)[0])
    np.testing.assert_allclose(c, [0.0, 0.0], atol=0.02)


def test_trace_is_differentiable(key):
    """jax.grad through the full trace w.r.t. curvature is finite and points
    the right way (more curvature -> shorter focus)."""
    scene = _bench_scene()
    p = scene.init_params()
    bundle = CollimatedDisk.make(radius=jnp.float32(2.0),
                                 translation=[0.0, 0.0, -10.0])
    rays = bundle.sample(key, 512)

    def loss(pp):
        out, _, _ = scene.simulate(pp, rays, key)
        t_to = (19.32 - out.pos[:, 2]) / out.dir[:, 2]
        xy = out.pos[:, :2] + t_to[:, None] * out.dir[:, :2]
        return jnp.mean(jnp.sum(xy ** 2, axis=1))

    g = jax.grad(loss)(p)
    g1 = float(g['lens']['c1'])
    assert np.isfinite(g1) and g1 != 0.0
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)


def test_blocked_ray_gradients_finite(key):
    """Regression: a ray blocked by an iris (zeroed direction) used to
    NaN-poison gradients via d sqrt(disc)/d disc = inf at disc == 0."""
    from raytracetorch_tpu import CircularAperture
    scene = SequentialScene([
        CircularAperture(radius=2.0, invert=True, translation=[0, 0, 5.0],
                         name='iris'),
        SensorElement(radius=50.0, translation=[0, 0, 10.0], name='sensor'),
    ])
    p = scene.init_params()

    def loss(pp):
        r = Rays.create([[0.0, 50.0, -5.0]], [[0.0, 0.0, 1.0]])
        out, _, _ = scene.simulate(pp, r, key)
        return jnp.sum(out.pos)

    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
