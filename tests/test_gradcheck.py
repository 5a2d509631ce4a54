"""Gradient correctness: jax.grad through the full trace vs central finite
differences — the strongest end-to-end differentiability check."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)


def test_grad_matches_finite_difference(key):
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        SensorElement(radius=20.0, translation=[0, 0, 100.0], name='sensor'),
    ])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)

    def loss(p):
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.spot_rms(0)[0] ** 2

    g = jax.grad(loss)(params)

    def fd(name, eps):
        def at(v):
            p2 = {k: dict(d) for k, d in params.items()}
            p2['lens'][name] = jnp.float32(v)
            return float(loss(p2))
        v0 = float(params['lens'][name])
        return (at(v0 + eps) - at(v0 - eps)) / (2 * eps)

    for name, eps, rtol in [('c1', 1e-5, 2e-2), ('c2', 1e-5, 2e-2),
                            ('t', 1e-3, 5e-2), ('ior_glass', 1e-4, 2e-2)]:
        analytic = float(g['lens'][name])
        numeric = fd(name, eps)
        np.testing.assert_allclose(analytic, numeric, rtol=rtol), name

    # pose gradients too (sensor z shifts the spot)
    def loss_z(z):
        p2 = {k: dict(d) for k, d in params.items()}
        p2['sensor'] = dict(p2['sensor'])
        p2['sensor']['trans'] = p2['sensor']['trans'].at[2].set(z)
        return loss(p2)

    z0 = jnp.float32(100.0)
    ga = float(jax.grad(loss_z)(z0))
    eps = 1e-2
    gn = (float(loss_z(z0 + eps)) - float(loss_z(z0 - eps))) / (2 * eps)
    np.testing.assert_allclose(ga, gn, rtol=2e-2)
