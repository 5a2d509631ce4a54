"""Multi-configuration (zoom-style) design via vmap over parameters —
the functional-core payoff: whole scenes batch over parameter axes with
no framework support needed."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, IdealThinLens, Rays, Scene,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit


def test_vmap_over_sensor_positions(key):
    """Trace the same lens against a batch of sensor distances in one
    vmapped call; the through-focus RMS curve has its minimum at the BFL."""
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=8.0, translation=[0, 0, 19.0], name='sensor'),
    ])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(1.0),
                               translation=[0, 0, -10.0]).sample(key, 2000)

    def rms_at(z):
        p = {k: dict(v) for k, v in params.items()}
        p['sensor'] = dict(p['sensor'])
        p['sensor']['trans'] = jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), z])
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.spot_rms(0)[0]

    zs = jnp.linspace(18.0, 23.0, 21)
    curve = jax.vmap(rms_at)(zs)
    z_best = float(zs[jnp.argmin(curve)])
    # true focus for this lens ~ 1.5 + bfl(19.49) = 20.99
    assert 20.5 < z_best < 21.5
    # curve is V-shaped around the minimum
    assert float(curve[0]) > float(curve.min()) * 3


def test_joint_multi_config_optimization(key):
    """Zoom-ish joint design: one trainable lens power must serve two object
    distances with per-config sensor positions — optimized jointly under
    vmap."""
    scene = Scene([IdealThinLens(focal=50.0, focal_grad=True, name='lens')],
                  n_bounces=2)
    params = scene.init_params()

    # configs: object at -100 (image 100), object at -150 (image 75)
    z_obj = jnp.array([-100.0, -150.0])
    z_img = jnp.array([100.0, 75.0])

    def config_loss(p, zo, zi):
        # fan from the axial object point at z = zo
        slopes = jnp.linspace(-0.02, 0.02, 16)
        r = Rays.create(
            jnp.stack([jnp.zeros(16), jnp.zeros(16),
                       jnp.full((16,), zo)], axis=1),
            jnp.stack([jnp.zeros(16), slopes, jnp.ones(16)], axis=1))
        out, _, _ = scene.simulate(p, r, key)
        t = (zi - out.pos[:, 2]) / out.dir[:, 2]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(y ** 2)

    def loss(p):
        return jnp.mean(jax.vmap(lambda zo, zi: config_loss(p, zo, zi))(
            z_obj, z_img))

    # thin lens: object 100/image 100 needs f=50; object 150/image 75
    # needs f=50 too (1/75 + 1/150 = 1/50): consistent target, perturb start
    params['lens']['P'] = jnp.float32(-1 / 40.0)
    p2, losses = fit(loss, params, trainable=scene.trainable(), steps=300,
                     lr=3e-4)
    f_final = float(-1.0 / p2['lens']['P'])
    np.testing.assert_allclose(f_final, 50.0, rtol=0.01)
    assert float(losses[-1]) < 1e-8


def test_decentered_ideal_lens_paraxial(key):
    """A laterally decentered thin lens deviates an axial ray by dx/f and
    the paraxial matrix chain (with decenter shift matrices) predicts the
    same image height (reference geom/transform.py:121-139 semantics)."""
    dx = 0.5
    scene = SequentialScene([IdealThinLens(
        focal=50.0, translation=[dx, 0.0, 0.0], name='lens')])
    p = scene.init_params()
    r = Rays.create([[0.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, r, key)
    # deflection of the axis ray: theta_x = dx / f (prism power of decenter)
    np.testing.assert_allclose(float(out.dir[0, 0] / out.dir[0, 2]),
                               dx / 50.0, rtol=1e-4)

    M = scene.paraxial(p)
    # paraxial state [x, tx, y, ty, 1]: axial ray in -> theta_x = M[1, 4]
    np.testing.assert_allclose(float(M[1, 4]), dx / 50.0, rtol=1e-4)


def test_ideal_lens_paraxial_sign(key):
    """System power of an ideal thin lens has the refraction-chain sign
    convention: P_sys = -M[1,0] = 1/f (regression for a dropped negation
    vs reference elements/ideal.py:58-62)."""
    from raytracetorch_tpu.optim.goals import focal_length_loss
    scene = SequentialScene([IdealThinLens(focal=50.0, name='lens')])
    p = scene.init_params()
    M = scene.paraxial(p)
    np.testing.assert_allclose(float(-M[1, 0]), 1.0 / 50.0, rtol=1e-6)
    assert float(focal_length_loss(scene, p, 50.0)) < 1e-12
