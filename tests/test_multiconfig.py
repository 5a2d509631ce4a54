"""Multi-configuration (zoom) design: shared + per-config parameters.

Beyond-reference capability (optim/multiconfig.py): the reference's Scene
holds one parameter state per element (scene/base.py:25-33) and has no
zoom/multi-config machinery, so these tests validate against analytic
optics and single-config traces of this framework itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit_lbfgs
from raytracetorch_tpu.optim.goals import spot_size_loss
from raytracetorch_tpu.optim.multiconfig import (config_params, config_sweep,
                                                 multiconfig_loss, n_configs,
                                                 stack_configs)


def _zoom_scene():
    """f~99.6 singlet (the reference's optimization lens,
    tests/test_optimize_singlet.py:29-49) on a trainable z-slide, plus a
    sensor whose position differs per configuration."""
    return SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    trans_grad=True, trans_mask=[0, 0, 1], name='lens'),
        SensorElement(radius=30.0, translation=[0, 0, 110.0], name='sensor'),
    ])


def test_stack_extract_roundtrip():
    scene = _zoom_scene()
    base = scene.init_params()
    mc, axes = stack_configs(base, [
        {'lens': {'trans': [0., 0., 5.]}},
        {'lens': {'trans': [0., 0., 25.]},
         'sensor': {'trans': [0., 0., 130.]}},
    ])
    assert n_configs(mc, axes) == 2
    # stacked leaves carry [C, ...]; shared leaves are untouched
    assert mc['lens']['trans'].shape == (2, 3)
    assert mc['sensor']['trans'].shape == (2, 3)
    assert mc['lens']['c1'].shape == base['lens']['c1'].shape

    p0 = config_params(mc, axes, 0)
    p1 = config_params(mc, axes, 1)
    np.testing.assert_allclose(p0['lens']['trans'], [0, 0, 5.])
    np.testing.assert_allclose(p1['lens']['trans'], [0, 0, 25.])
    # config 0 omitted the sensor override -> keeps the base value
    np.testing.assert_allclose(p0['sensor']['trans'], [0, 0, 110.])
    np.testing.assert_allclose(p1['sensor']['trans'], [0, 0, 130.])
    np.testing.assert_allclose(p0['lens']['c1'], base['lens']['c1'])


def test_unknown_override_leaf_raises():
    scene = _zoom_scene()
    with pytest.raises(KeyError):
        stack_configs(scene.init_params(),
                      [{'lens': {'curvature_one': 0.02}}])


def test_config_sweep_matches_single_config():
    scene = _zoom_scene()
    base = scene.init_params()
    mc, axes = stack_configs(base, [{'lens': {'c1': 0.016667}},
                                    {'lens': {'c1': 0.02}}])
    f = config_sweep(lambda p, i: -1.0 / scene.paraxial(p)[1, 0], mc, axes)
    assert f.shape == (2,)
    for i in range(2):
        p = config_params(mc, axes, i)
        np.testing.assert_allclose(f[i], -1.0 / scene.paraxial(p)[1, 0],
                                   rtol=1e-6)
    assert f[1] < f[0]  # stronger c1 -> shorter focal length


def test_shared_leaf_gradient_is_sum_over_configs(key):
    scene = _zoom_scene()
    rays = CollimatedDisk.make(radius=jnp.float32(8.0),
                               translation=[0, 0, -10.0]).sample(key, 512)
    mc, axes = stack_configs(scene.init_params(), [
        {'lens': {'trans': [0., 0., 5.]}},
        {'lens': {'trans': [0., 0., 25.]},
         'sensor': {'trans': [0., 0., 130.]}},
    ])

    def per_cfg(p, i):
        _, sensors, _ = scene.simulate(p, rays, key)
        return spot_size_loss(sensors)

    merit = multiconfig_loss(per_cfg, axes)
    g = jax.grad(merit)(mc)
    # stacked leaf: per-config gradient rows
    assert g['lens']['trans'].shape == (2, 3)
    # shared leaf: gradient is the MEAN over configs (uniform weights) of
    # the single-config gradients — the coupling that makes it one design
    g0 = jax.grad(lambda p: per_cfg(p, 0))(config_params(mc, axes, 0))
    g1 = jax.grad(lambda p: per_cfg(p, 1))(config_params(mc, axes, 1))
    np.testing.assert_allclose(
        g['lens']['c1'],
        (g0['lens']['c1'] + g1['lens']['c1']) / 2, rtol=2e-4)
    np.testing.assert_allclose(g['lens']['trans'][0],
                               g0['lens']['trans'] / 2, rtol=2e-4, atol=1e-9)


def test_weights_select_config():
    scene = _zoom_scene()
    mc, axes = stack_configs(scene.init_params(),
                             [{'lens': {'c1': 0.016667}},
                              {'lens': {'c1': 0.02}}])

    def per_cfg(p, i):
        return (-1.0 / scene.paraxial(p)[1, 0]) ** 2

    only0 = multiconfig_loss(per_cfg, axes, weights=[1.0, 0.0])(mc)
    f0 = -1.0 / scene.paraxial(config_params(mc, axes, 0))[1, 0]
    np.testing.assert_allclose(only0, f0 ** 2, rtol=1e-6)


def test_refocus_zoom_design(key):
    """The classic two-position refocus: shared curvatures + a per-config
    lens slide must bring BOTH sensor planes (z=110 and z=130) to focus.
    Since the lens BFL is config-independent, the optimum slide values
    differ by exactly the sensor spacing (20)."""
    scene = _zoom_scene()
    rays = CollimatedDisk.make(radius=jnp.float32(8.0),
                               translation=[0, 0, -10.0]).sample(key, 2000)
    mc, axes = stack_configs(scene.init_params(), [
        {'lens': {'trans': [0., 0., 5.]}},
        {'lens': {'trans': [0., 0., 25.]},
         'sensor': {'trans': [0., 0., 130.]}},
    ])

    def per_cfg(p, i):
        _, sensors, _ = scene.simulate(p, rays, key)
        return spot_size_loss(sensors)

    merit = multiconfig_loss(per_cfg, axes)
    rms0 = [float(per_cfg(config_params(mc, axes, i), i)) for i in (0, 1)]
    p2, losses = fit_lbfgs(merit, mc, trainable=scene.trainable(), steps=60)
    rms = [float(per_cfg(config_params(p2, axes, i), i)) for i in (0, 1)]

    # every configuration individually reaches focus (initial defocus blur
    # is several mm RMS; a refocused best-form singlet is far below 0.1)
    for i in (0, 1):
        assert rms[i] < min(0.05, 0.02 * rms0[i]), (
            f"config {i}: RMS {rms0[i]} -> {rms[i]}")

    z = np.asarray(p2['lens']['trans'])[:, 2]
    assert abs((z[1] - z[0]) - 20.0) < 0.5, f"slide positions {z}"

    # the x/y slide components were masked off (trans_mask=[0,0,1])
    np.testing.assert_allclose(np.asarray(p2['lens']['trans'])[:, :2],
                               [[0, 0], [0, 0]], atol=1e-6)
    # shared, non-trainable leaves untouched
    np.testing.assert_allclose(p2['lens']['t'], 4.0)
