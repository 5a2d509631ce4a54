"""Newtonian-style telescope with PHYSICAL metal mirrors + Sellmeier optics.

Round-3 feature tour:

- The primary is a parabolic mirror with a real aluminum substrate
  (``metal='Al'``): it reflects with the complex-Fresnel R ~ 91.5%, not
  the reference's ideal Reflect functor (elements/mirror.py:14-19).
- An enhanced-aluminum version adds a quarter-wave ZnS/MgF2 pair and the
  throughput measurably rises; jax.grad then fine-tunes the layer
  thicknesses THROUGH the ray trace to maximize flux on the sensor.
- The field corrector is an N-BK7 singlet with catalog Sellmeier
  dispersion (``glass('N-BK7', model='sellmeier')``).

Prints sensor throughput for bare / enhanced / optimized-enhanced
configurations and the optimized thicknesses vs the analytic quarter-wave
stack.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import optax

from raytracetorch_tpu import (CollimatedDisk, Scene, SensorElement,
                               SingletLens)
from raytracetorch_tpu.elements.mirror import ParabolicMirror
from raytracetorch_tpu.utils.glass import glass

WL = 0.5876
N_RAYS = 100_000


def build(coating, coat_d=None):
    """f=500mm parabolic primary at z=500, sensor near prime focus with a
    small Sellmeier corrector singlet in front of it."""
    if coating and coat_d is not None:
        coating = [(n, float(d)) for (n, _), d in zip(coating, coat_d)]
    # light enters at z~2 travelling +z, folds back off the f=500 primary
    # (focus near z=0), double-passes the corrector, lands on the sensor
    return Scene([
        ParabolicMirror(c1=-0.001, d=200.0, translation=[0, 0, 500.0],
                        metal='Al', coating=coating, coating_grad=True,
                        name='primary'),
        SingletLens(c1=0.0004, c2=-0.0004, d=120.0, t=5.0,
                    translation=[0, 0, 100.0], name='corrector',
                    **glass('N-BK7', model='sellmeier')),
        SensorElement(radius=40.0, translation=[0, 0, 1.0], name='ccd'),
    ], n_bounces=8)


def throughput(scene, params, key):
    rays = CollimatedDisk.make(radius=jnp.float32(50.0),
                               translation=[0, 0, 2.0],
                               wavelength=WL).sample(key, N_RAYS)
    _, sensors, _ = scene.simulate(params, rays, key)
    return sensors.total_weight(0)[0] / N_RAYS


def main():
    key = jax.random.PRNGKey(0)

    bare = build(None)
    t_bare = float(throughput(bare, bare.init_params(), key))

    # enhanced aluminum: QW high-index outermost, QW low-index on metal
    d_qw = [WL / (4 * 2.35), WL / (4 * 1.38)]
    stack = [(2.35, d_qw[0]), (1.38, d_qw[1])]
    enh = build(stack)
    p_enh = enh.init_params()
    t_enh = float(throughput(enh, p_enh, key))

    # fine-tune the stack thicknesses through the trace (start detuned)
    p = dict(p_enh)
    p['primary'] = {**p_enh['primary'],
                    'coat_d': jnp.asarray([0.05, 0.08], jnp.float32)}
    opt = optax.adam(2e-3)
    state = opt.init(p['primary']['coat_d'])

    @jax.jit
    def step(coat_d, state):
        def loss(cd):
            pp = dict(p)
            pp['primary'] = {**p['primary'], 'coat_d': cd}
            return -throughput(enh, pp, key)

        g = jax.grad(loss)(coat_d)
        up, state = opt.update(g, state)
        return jnp.clip(coat_d + up, 1e-3, 0.4), state

    cd = p['primary']['coat_d']
    for _ in range(300):
        cd, state = step(cd, state)
    p_opt = dict(p)
    p_opt['primary'] = {**p['primary'], 'coat_d': cd}
    t_opt = float(throughput(enh, p_opt, key))

    print(f"bare aluminum primary:        throughput = {t_bare:.4f}")
    print(f"enhanced (analytic QW pair):  throughput = {t_enh:.4f}")
    print(f"enhanced (grad-optimized):    throughput = {t_opt:.4f}")
    print(f"optimized thicknesses: {[round(float(x), 4) for x in cd]} "
          f"vs analytic QW {[round(x, 4) for x in d_qw]}")
    assert t_enh > t_bare and t_opt >= t_enh - 1e-3


if __name__ == '__main__':
    main()
