"""Freeform astigmatism corrector for a tilted spherical mirror.

The canonical freeform-optics task: a spherical mirror used 8 degrees
off-axis splits its tangential/sagittal foci (astigmatism ~ f theta^2),
so the best medial focus is an elliptical blur.  A flat window whose
front face carries a trainable XY-polynomial freeform sag
(`FreeformLens`, geom/surfaces.py::ff_refine) sits in the incoming
beam; adam descends d(spot RMS)/d(coefficients) straight through the
Newton-refined freeform intersection, the tilted-mirror reflection and
the sensor landing.

The optimizer discovers the textbook corrector on its own: an
astigmatic x^2 / y^2 pair with OPPOSITE signs (plus small cubic coma
terms), cutting the spot RMS ~17x.  The torch reference cannot express
any of this — its most general surface is the stubbed asphere
(reference geom/complex.py:6-10).

Run: python examples/19_freeform_corrector.py [--cpu]   (~3 min CPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:        # for when the TPU tunnel is claimed
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (FreeformLens, SensorElement,
                               SequentialScene, SphericalMirror, fit)
from raytracetorch_tpu.rays.ray import Rays

OUT = os.path.join(os.path.dirname(__file__), 'output')

R = 100.0                        # mirror radius  (f = 50)
THETA = np.deg2rad(8.0)          # off-axis tilt
TERMS = [(2, 0, 0.0), (0, 2, 0.0), (2, 1, 0.0), (0, 3, 0.0), (1, 1, 0.0)]


def build():
    d_beam = np.array([0.0, np.sin(2 * THETA), -np.cos(2 * THETA)])
    sens_pos = np.array([0, 0, 50.0]) + 50.0 * d_beam   # medial focus
    return SequentialScene([
        FreeformLens(c1=0.0, c2=0.0, d=24.0, t=2.0, ior_glass=1.5168,
                     translation=[0, 0, 20.0], xy1=TERMS, xy1_grad=True,
                     name='corrector'),
        SphericalMirror(c1=-1.0 / R, d=30.0, translation=[0, 0, 50.0],
                        rotation=[THETA, 0, 0], name='mirror'),
        SensorElement(radius=6.0, translation=list(sens_pos),
                      rotation=[np.pi - 2 * THETA, 0, 0], name='sensor'),
    ])


def beam(n=20000):
    k = jax.random.PRNGKey(0)
    xy = jax.random.uniform(k, (2, n), minval=-8.0, maxval=8.0)
    ok = (xy[0] ** 2 + xy[1] ** 2 <= 64.0).astype(jnp.float32)
    zero = jnp.zeros((n,))
    return Rays.from_components(
        (xy[0], xy[1], zero - 10.0), (zero, zero, jnp.ones((n,))),
        ok, jnp.zeros((n,), jnp.int32), zero)


def main():
    scene = build()
    rays = beam()
    key = jax.random.PRNGKey(1)
    params = scene.init_params()

    def spots(p):
        _, sensors, aux = scene.simulate(p, rays, key, record_hits=True)
        hits = np.asarray(aux['hits'])[-1]           # sensor-frame hits
        w = np.asarray(aux['hit_weights'])[-1]
        return float(sensors.spot_rms(0)[0]), hits[w > 0]

    rms0, h0 = spots(params)
    print(f'tilted-mirror medial focus, uncorrected: '
          f'rms {rms0 * 1e3:.1f} um')

    def loss(p):
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.spot_rms(0)[0] ** 2

    t0 = time.time()
    params, hist = fit(loss, params, trainable=scene.trainable(),
                       steps=400, lr=2e-4)
    rms1, h1 = spots(params)
    print(f'with the learned freeform: rms {rms1 * 1e3:.2f} um '
          f'({rms0 / rms1:.1f}x better, {time.time() - t0:.0f} s)')
    print('learned surface (lens units):')
    for (i, j, _), v in zip(TERMS, params['corrector']['xy1']):
        print(f'  x^{i} y^{j}: {float(v):+.3e}')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(OUT, exist_ok=True)
        fig, axes = plt.subplots(1, 2, figsize=(7, 3.4), sharex=True,
                                 sharey=True)
        for ax, h, ttl in ((axes[0], h0, f'uncorrected '
                            f'(rms {rms0*1e3:.0f} um)'),
                           (axes[1], h1, f'freeform-corrected '
                            f'(rms {rms1*1e3:.1f} um)')):
            cx, cy = h[:, 0].mean(), h[:, 1].mean()
            ax.plot(h[:, 0] - cx, h[:, 1] - cy, ',', alpha=0.3)
            ax.set_title(ttl, fontsize=9)
            ax.set_aspect('equal')
            ax.set_xlim(-0.3, 0.3)
            ax.set_ylim(-0.3, 0.3)
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '19_freeform.png'), dpi=120)
        print(f"saved {os.path.join(OUT, '19_freeform.png')}")
    except Exception as e:                      # headless-matplotlib guard
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
