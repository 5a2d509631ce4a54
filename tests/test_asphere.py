"""Aspheric surface tests: sag accuracy of the Newton solve, normals,
spherical-aberration correction, differentiability of asphere coefficients
(beyond the reference, whose Aspheric raises — geom/complex.py:6-10)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (AsphericLens, CollimatedDisk, Rays,
                               SensorElement, SequentialScene, SingletLens)


def test_asphere_hit_on_surface(key):
    """Hits satisfy z = sag(r) to float32 accuracy for a strong asphere."""
    c, k, a4, a6 = 0.05, -0.6, 1e-5, -2e-8
    lens = AsphericLens(c1=c, c2=-0.02, d=10.0, t=3.0, ior_glass=1.5,
                        k1=k, a1=(a4, a6), name='al')
    scene = SequentialScene([lens])
    p = scene.init_params()
    ys = jnp.array([0.5, 1.5, 2.5, 3.5, 4.5])
    rays = Rays.create(
        jnp.stack([jnp.zeros(5), ys, jnp.full((5,), -10.0)], axis=1),
        jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1)))
    out, _, aux = scene.simulate(p, rays, key, record_paths=True)
    # position after the first surface = the asphere hit (element frame z
    # offset by vertex at -t/2)
    hit = np.asarray(aux['paths'][1])
    r2 = hit[:, 1] ** 2
    sag = c * r2 / (1 + np.sqrt(1 - (1 + k) * c * c * r2)) \
        + a4 * r2 ** 2 + a6 * r2 ** 3
    np.testing.assert_allclose(hit[:, 2], -1.5 + sag, atol=2e-5)


def test_asphere_zero_coeffs_matches_singlet(key):
    """k=0, a=0 aspheres must reproduce the spherical singlet exactly."""
    a = AsphericLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                     name='l')
    s = SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='l')
    sa, ss = SequentialScene([a]), SequentialScene([s])
    pa, ps = sa.init_params(), ss.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 1000)
    oa, _, _ = sa.simulate(pa, rays, key)
    os_, _, _ = ss.simulate(ps, rays, key)
    np.testing.assert_allclose(np.asarray(oa.pos), np.asarray(os_.pos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(oa.dir), np.asarray(os_.dir),
                               atol=1e-5)


def test_asphere_corrects_spherical_aberration(key):
    """Optimizing the conic + a4 of the front face shrinks the marginal-zone
    blur far below the best spherical singlet."""
    # Optimize the conic constant of the front face (polynomial terms have
    # wildly different parameter scales — r^10 gradients ~1e9 — and would
    # need normalized coefficients for joint optimization, as in commercial
    # design codes; the conic alone corrects 3rd-order spherical aberration)
    scene = SequentialScene([AsphericLens(
        c1=0.0167, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        k1_grad=True, name='lens')])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(8.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)

    def loss(p):
        out, _, _ = scene.simulate(p, rays, key)
        t = (100.0 - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(x ** 2 + y ** 2)

    l0 = float(loss(params))
    from raytracetorch_tpu.optim.fit import fit
    p2, losses = fit(loss, params, trainable=scene.trainable(), steps=400,
                     lr=0.02)
    lf = float(losses[-1])
    assert lf < l0 * 0.35, f"asphere optimization failed: {l0} -> {lf}"
    k1 = float(p2['lens']['k1'])
    assert np.isfinite(k1) and k1 != 0.0


def test_asphere_gradients_finite(key):
    scene = SequentialScene([AsphericLens(
        c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
        k1=-0.5, a1=(1e-5,), name='lens')])
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 256)

    def loss(pp):
        _, s, _ = scene.simulate(pp, rays, key)
        return jnp.sum(s.moments)

    scene.add_element(SensorElement(radius=8.0, translation=[0, 0, 19.0],
                                    name='sensor'))
    p = scene.init_params()
    g = jax.grad(loss)(p)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.sum(jnp.abs(g['lens']['a1']))) > 0.0


def test_joint_polynomial_optimization_with_scales(key):
    """With natural parameter scales, Adam jointly optimizes the conic AND
    the a4..a10 polynomial without blowing up (the unscaled case NaNs —
    gradients span ~6 orders of magnitude)."""
    import numpy as np
    scene = SequentialScene([AsphericLens(
        c1=0.0167, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        k1_grad=True, a1_grad=True, name='lens')])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(9.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)

    def loss(p):
        out, _, _ = scene.simulate(p, rays, key)
        t = (100.0 - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(x ** 2 + y ** 2)

    from raytracetorch_tpu.optim.fit import fit
    l0 = float(loss(params))
    scales = {'lens': scene.elements[0].param_scales()}
    scales['lens']['a1'] = jnp.asarray(scales['lens']['a1'])
    p2, losses = fit(loss, params, trainable=scene.trainable(), steps=400,
                     lr=5e-3, scales=scales)
    lf = float(losses[-1])
    assert np.isfinite(lf)
    assert lf < l0 * 0.1, f"{l0} -> {lf}"
    assert np.isfinite(np.asarray(p2['lens']['a1'])).all()
    # the polynomial actually moved
    assert np.abs(np.asarray(p2['lens']['a1'])).max() > 0
