"""Design a Cooke triplet with the default merit function and fit_lm.

The classic air-spaced anastigmat: two SK16 crowns around an F2 flint,
stop behind the flint.  Starting from a ~12%-perturbed version of the
textbook 50 mm f/4.5 prescription, Levenberg-Marquardt on the default
merit (RMS spot over 3 fields x F/d/C lines, optim/merit.py) recovers a
design with single-digit-micron polychromatic RMS spots — the workflow a
commercial merit editor runs, here as one differentiable program (the
torch reference's nearest machinery is a per-bundle spot loss in a
Python loop, reference optim/goals.py:99-187).

Run: python examples/16_cooke_triplet.py   (~4 min CPU; one XLA compile
of the residual Jacobian dominates)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:        # for when the TPU tunnel is claimed
    jax.config.update('jax_platforms', 'cpu')

import numpy as np

from raytracetorch_tpu import (CircularAperture, SequentialScene,
                               SingletLens, default_merit, fit_lm)
from raytracetorch_tpu.utils.fieldscan import field_scan
from raytracetorch_tpu.utils.glass import glass

OUT = os.path.join(os.path.dirname(__file__), 'output')

FIELDS = [0.0, 0.1, 0.2]                    # tan(field): 0, 5.7, 11.3 deg
LINES = [0.48613, 0.5876, 0.65627]          # F, d, C (um)
IMG_Z = 60.9                                # fixed detector plane


def build(pert=1.0):
    """Textbook 50 mm f/4.5 Cooke triplet, curvatures scaled by ``pert``."""
    sk16 = glass('N-SK16', model='sellmeier')
    f2 = glass('F2', model='sellmeier')
    c = lambda R: 1.0 / R
    return SequentialScene([
        SingletLens(c1=c(22.01) * pert, c2=c(-435.8) / pert, d=17.0, t=3.26,
                    translation=(0, 0, 1.63), c1_grad=True, c2_grad=True,
                    name='crown_front', **sk16),
        SingletLens(c1=c(-22.21) * pert, c2=c(22.26) / pert, d=11.0, t=1.0,
                    translation=(0, 0, 9.77), c1_grad=True, c2_grad=True,
                    name='flint', **f2),
        CircularAperture(radius=5.0, translation=(0, 0, 12.3), name='stop'),
        SingletLens(c1=c(79.68) * pert, c2=c(-18.40) / pert, d=13.0, t=2.95,
                    translation=(0, 0, 16.5), c1_grad=True, c2_grad=True,
                    name='crown_rear', **sk16),
    ])


def main():
    scene = build(pert=1.12)
    params = scene.init_params()
    loss, resid = default_merit(scene, fields=FIELDS, wavelengths=LINES,
                                n_pupil=24, image_z=IMG_Z)

    l0 = float(loss(params))
    print(f'start merit {l0:.4e}  (rms {np.sqrt(l0)*1e3:.1f} um)')
    t0 = time.time()
    params, costs = fit_lm(resid, params, trainable=scene.trainable(),
                           steps=30)
    lf = float(loss(params))
    print(f'end   merit {lf:.4e}  (rms {np.sqrt(lf)*1e3:.2f} um)  '
          f'[{time.time()-t0:.0f} s, {len(costs)} LM steps]')

    print('\nfinal prescription (radii in mm):')
    for name in ('crown_front', 'flint', 'crown_rear'):
        c1, c2 = float(params[name]['c1']), float(params[name]['c2'])
        print(f'  {name:12s} R1 {1/c1:9.2f}   R2 {1/c2:9.2f}')

    # field curves of the finished design (d line)
    scan = field_scan(scene, params, fields=FIELDS, wavelength=LINES[1])
    fc_t = np.asarray(scan.z_tangential) - IMG_Z
    fc_s = np.asarray(scan.z_sagittal) - IMG_Z
    print('\nfield curvature vs detector (mm):')
    for f, zt, zs in zip(FIELDS, fc_t, fc_s):
        print(f'  tan(theta)={f:4.2f}   tangential {zt:+7.3f}   '
              f'sagittal {zs:+7.3f}')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(OUT, exist_ok=True)
        fig, ax = plt.subplots(figsize=(4, 3))
        ax.semilogy(np.asarray(costs))
        ax.set_xlabel('LM step')
        ax.set_ylabel('merit (sum sq residual)')
        ax.set_title('Cooke triplet: default merit under fit_lm')
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '16_cooke_merit.png'), dpi=120)
        print(f"\nsaved {os.path.join(OUT, '16_cooke_merit.png')}")
    except Exception as e:                      # headless-matplotlib guard
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
