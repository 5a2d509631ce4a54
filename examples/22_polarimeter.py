"""Polarization optics elements: build a rotating-analyzer polarimeter
and DESIGN an isolator angle by gradient descent.

Demonstrates ``LinearPolarizer`` / ``QuarterWaveplate`` /
``HalfWaveplate`` (PhysKind.JONES — the Jones matrix acts on the
tracked E-field, axes anchored to the element frame):

1. Malus curve: sweep the analyzer angle with ONE jitted trace (the
   angle is an ordinary traced parameter) and recover cos^2.
2. Stokes polarimetry: classify linear / circular / elliptical states
   produced by waveplates.
3. Gradient design: find the analyzer angle that nulls a rotated
   elliptical beam — jax.grad through the polarizer.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, HalfWaveplate,
                               LinearPolarizer, QuarterWaveplate,
                               SensorElement, SequentialScene)
from raytracetorch_tpu.utils.polarization import stokes_parameters

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -5.0]).sample(key, 20_000)

    # --- 1. Malus curve: one jit, many angles --------------------------
    sc = SequentialScene([
        LinearPolarizer(radius=8.0, angle=0.0, angle_grad=True,
                        name='analyzer'),
        SensorElement(radius=20.0, translation=[0, 0, 20.0], name='s'),
    ])
    p0 = sc.init_params()

    @jax.jit
    def transmitted(theta):
        p = jax.tree.map(lambda x: x, p0)
        p['analyzer']['angle'] = theta
        _, _, aux = sc.simulate(p, rays, key, track_field=True)
        return aux['field_power'].mean()

    thetas = jnp.linspace(0.0, jnp.pi, 19)
    T = jax.vmap(transmitted)(thetas)
    worst = float(jnp.max(jnp.abs(T - jnp.cos(thetas) ** 2)))
    print(f'Malus curve max |T - cos^2| = {worst:.2e}')
    assert worst < 1e-5

    # --- 2. Stokes polarimetry of waveplate outputs --------------------
    def stokes_of(*els):
        s = SequentialScene(list(els) + [
            SensorElement(radius=20.0, translation=[0, 0, 30.0], name='s')])
        out, _, aux = s.simulate(s.init_params(), rays, key,
                                 track_field=True)
        s0, s1, s2, s3 = stokes_parameters(aux['field'], out.dir_c)
        return [float(jnp.mean(x / jnp.maximum(s0, 1e-12)))
                for x in (s1, s2, s3)]

    for label, els, expect in [
        ('x-linear (no optic)', (), (1, 0, 0)),
        ('QWP @ 45deg -> circular',
         (QuarterWaveplate(radius=8.0, angle=math.pi / 4, name='q'),),
         (0, 0, -1)),
        ('HWP @ 22.5deg -> 45deg linear',
         (HalfWaveplate(radius=8.0, angle=math.pi / 8, name='h'),),
         (0, -1, 0)),
    ]:
        s1, s2, s3 = stokes_of(*els)
        print(f'{label:32s} S1={s1:+.3f} S2={s2:+.3f} S3={s3:+.3f}')
        np.testing.assert_allclose([abs(s1), abs(s2), abs(s3)],
                                   np.abs(expect), atol=1e-5)

    # --- 3. Gradient design: null an unknown elliptical beam -----------
    # A HWP at an "unknown" angle rotates the polarization; find the
    # crossed analyzer angle by gradient descent on transmitted power.
    hidden = 0.337
    sc3 = SequentialScene([
        HalfWaveplate(radius=8.0, angle=hidden, name='rot'),
        LinearPolarizer(radius=8.0, angle=0.2, angle_grad=True,
                        translation=[0, 0, 5.0], name='analyzer'),
        SensorElement(radius=20.0, translation=[0, 0, 20.0], name='s'),
    ])
    p = sc3.init_params()

    @jax.jit
    def power(p):
        _, _, aux = sc3.simulate(p, rays, key, track_field=True)
        return aux['field_power'].mean()

    g = jax.jit(jax.grad(power))
    for i in range(60):
        p['analyzer']['angle'] = p['analyzer']['angle'] \
            - 0.5 * g(p)['analyzer']['angle']
    found = float(p['analyzer']['angle']) % math.pi
    target = (2 * hidden + math.pi / 2) % math.pi   # crossed to 2*hidden
    print(f'nulled analyzer angle {found:.4f} rad '
          f'(analytic {target:.4f}), leakage {float(power(p)):.2e}')
    assert float(power(p)) < 1e-6
    assert abs(found - target) < 1e-3

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(np.asarray(thetas), np.asarray(T), 'o', label='traced')
        tt = np.linspace(0, np.pi, 200)
        ax.plot(tt, np.cos(tt) ** 2, '-', lw=1, label=r'$\cos^2\theta$')
        ax.set_xlabel('analyzer angle (rad)')
        ax.set_ylabel('transmitted power')
        ax.set_title("Malus's law through the ray trace")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '22_polarimeter.png'), dpi=110)
        print('wrote', os.path.join(OUT, '22_polarimeter.png'))
    except ImportError:
        pass


if __name__ == '__main__':
    main()
