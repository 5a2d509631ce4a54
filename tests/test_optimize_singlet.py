"""End-to-end differentiable lens design: the north-star workload.

Replicates the reference's ``tests/test_optimize_singlet.py`` (LBFGS spot
optimization of a singlet toward the minimum-spherical-aberration "best
form", C1/C2 ~ -6 for n ~ 1.52) with physically-correct optics and actual
assertions (the reference test is print-only and its success condition is
unsatisfiable — PARITY.md §1)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.constraints import (spacing_constraint,
                                                 system_length_constraint,
                                                 thickness_constraint)
from raytracetorch_tpu.optim.fit import fit, fit_lbfgs
from raytracetorch_tpu.optim.goals import (focal_length_loss, spot_size_loss,
                                           spot_target_loss)


def _design_scene():
    """The reference's optimization lens (tests/test_optimize_singlet.py:29-49):
    f ~ 99.6, target plane z=100."""
    return SequentialScene([SingletLens(
        c1=0.016667, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        c1_grad=True, c2_grad=True, name='lens')])


def _spot_loss(scene, rays, key, target_z=100.0):
    def loss(p):
        out, _, _ = scene.simulate(p, rays, key)
        t = (target_z - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(x ** 2 + y ** 2)
    return loss


def test_lbfgs_converges_to_best_form(key):
    scene = _design_scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 3000)
    loss = _spot_loss(scene, rays, key)
    l0 = float(loss(params))
    p2, losses = fit_lbfgs(loss, params, trainable=scene.trainable(),
                           steps=25)
    lf = float(losses[-1])
    assert lf < l0 * 0.02, f"LBFGS failed to converge: {l0} -> {lf}"

    c1, c2 = float(p2['lens']['c1']), float(p2['lens']['c2'])
    ratio = c1 / c2
    # Best-form singlet for object at infinity, n ~ 1.52: C1/C2 ~ -6
    assert -7.5 < ratio < -4.5, f"ratio {ratio}"
    f = float(scene.elements[0].f(p2['lens']))
    assert 95.0 < f < 106.0, f"focal length {f}"

    # Only the trainable leaves moved
    np.testing.assert_allclose(p2['lens']['t'], 4.0)
    np.testing.assert_allclose(p2['lens']['ior_glass'], 1.5168)


def test_adam_also_converges(key):
    scene = _design_scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 4000)
    loss = _spot_loss(scene, rays, key)
    l0 = float(loss(params))
    p2, losses = fit(loss, params, trainable=scene.trainable(), steps=200,
                     lr=2e-4)
    assert float(losses[-1]) < l0 * 0.5


def test_focal_length_loss_gradient(key):
    scene = _design_scene()
    params = scene.init_params()
    val = focal_length_loss(scene, params, f_target=100.0)
    assert float(val) < 1e-8   # lens is already ~f=99.6: tiny power error
    g = jax.grad(lambda p: focal_length_loss(scene, p, 50.0))(params)
    assert float(g['lens']['c1']) != 0.0
    assert np.isfinite(float(g['lens']['c1']))


def test_sensor_based_spot_goals(key):
    scene = _design_scene()
    scene.add_element(SensorElement(radius=20.0, translation=[0, 0, 100.0],
                                    name='sensor'))
    params = scene.init_params()
    b0 = CollimatedDisk.make(radius=jnp.float32(5.0), ray_id=0,
                             translation=[0, 0, -10.0])
    b1 = CollimatedDisk.make(radius=jnp.float32(5.0), ray_id=1,
                             rotation=[-0.05, 0.0, 0.0],
                             translation=[0, 0, -10.0])
    scene.add_bundle(b0, 2000)
    scene.add_bundle(b1, 2000)
    rays = scene.sample_rays(key)
    _, sensors, _ = scene.simulate(params, rays, key)
    # Both bundles recorded separately
    w = np.asarray(sensors.total_weight(0))
    assert w.shape[0] == 2 and (w > 1500).all()
    # The tilted bundle lands off-axis in y
    c = np.asarray(sensors.centroid(0))
    assert abs(c[0, 1]) < 0.2 and c[1, 1] > 2.0

    sl = float(spot_size_loss(sensors))
    assert 0.0 < sl < 2.0
    tl = float(spot_target_loss(sensors, jnp.asarray(c)))
    assert tl < 1e-9   # targets at the measured centroids -> zero


def test_constraints_barriers(key):
    scene = _design_scene()
    params = scene.init_params()
    th = thickness_constraint(scene, params, t_min=1.0, t_max=10.0)
    assert np.isfinite(float(th))
    g = jax.grad(lambda p: thickness_constraint(scene, p, 1.0, 10.0))(params)
    # d/dt of -log(t - 1) - log(10 - t) at t=4: -1/3 + 1/6 = -1/6
    np.testing.assert_allclose(float(g['lens']['t']), -1.0 / 3.0 + 1.0 / 6.0,
                               rtol=1e-4)

    sl = system_length_constraint(scene, params, l_max=20.0)
    assert np.isfinite(float(sl))

    scene2 = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='a'),
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, translation=[0, 0, 30.0], name='b'),
    ])
    p2 = scene2.init_params()
    sp = spacing_constraint(scene2, p2, d_min=5.0)
    assert np.isfinite(float(sp))
    g2 = jax.grad(lambda p: spacing_constraint(scene2, p, 5.0))(p2)
    # gap = 26; d(-log(gap-5))/d z_b = -1/21
    np.testing.assert_allclose(float(g2['b']['trans'][2]), -1.0 / 21.0,
                               rtol=1e-4)


def test_lm_converges_in_few_iterations(key):
    """fit_lm (damped least squares — the classic lens-design optimizer,
    beyond the reference's Adam/LBFGS): per-ray transverse errors at the
    target plane as the residual vector.  Gauss-Newton structure gets the
    best-form singlet in a handful of iterations."""
    from raytracetorch_tpu.optim.fit import fit_lm

    scene = _design_scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 2000)

    def residuals(p, target_z=100.0):
        out, _, _ = scene.simulate(p, rays, key)
        t = (target_z - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.concatenate([x, y])

    c0 = 0.5 * float(jnp.sum(residuals(params) ** 2))
    p2, costs = fit_lm(residuals, params, trainable=scene.trainable(),
                       steps=12)
    assert float(costs[-1]) < c0 * 0.02, f"{c0} -> {float(costs[-1])}"
    # costs are monotone non-increasing (rejected steps keep the params)
    cs = np.asarray(costs)
    assert np.all(np.diff(cs) <= 1e-6 * cs[:-1] + 1e-12)

    ratio = float(p2['lens']['c1']) / float(p2['lens']['c2'])
    assert -7.5 < ratio < -4.5, f"ratio {ratio}"
    # non-trainable leaves are EXACTLY untouched (zeroed Jacobian columns)
    np.testing.assert_array_equal(np.asarray(p2['lens']['t']),
                                  np.asarray(params['lens']['t']))
    np.testing.assert_array_equal(np.asarray(p2['lens']['ior_glass']),
                                  np.asarray(params['lens']['ior_glass']))
