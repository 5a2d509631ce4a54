"""Tolerance a finished design: sensitivity table -> inverse allocation
-> compensated Monte-Carlo yield.

Takes the Cooke triplet of example 16 (textbook 50 mm f/4.5 anastigmat),
assigns shop-typical starting tolerances to every element (decenter,
tilt, despace, curvature error), and runs the classic tolerancing
sequence (utils/sensitivity.py):

1. sensitivity table: each axis perturbed to +/- its limit — all 2K+1
   as-built systems traced in ONE vmapped merit call;
2. inverse allocation: limits rescaled so every axis contributes equally
   to a 15%-merit-growth budget (log-space power-law secant, both signs);
3. yield: 512 Monte-Carlo builds, each refocused at test (the focus
   compensator — a derivative-free parabolic search per build, again all
   builds in one batched call).

The torch reference's tolerancing is per-ray pose noise only (reference
geom/transform.py:141-242) — no sensitivity table, no allocation, no
compensators, no yield.

Run: python examples/17_tolerancing_workflow.py [--cpu]   (~3 min CPU)
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

from raytracetorch_tpu import (allocate_tolerances, default_merit,
                               tolerance_sensitivity, tolerance_yield)

sys.path.insert(0, os.path.dirname(__file__))
cooke = __import__('16_cooke_triplet')

OUT = os.path.join(os.path.dirname(__file__), 'output')
FIELDS = [0.0, 0.1, 0.2]
LINES = [0.48613, 0.5876, 0.65627]
IMG_Z = 60.9


def main():
    from raytracetorch_tpu import fit_lm

    # finish the design first (a short LM run on the default merit, as
    # in example 16) — tolerancing a half-corrected system tells you
    # nothing, every build is dominated by the design residual
    scene = cooke.build(pert=1.0)
    p0 = scene.init_params()
    _, resid = default_merit(scene, fields=FIELDS, wavelengths=LINES,
                             n_pupil=24, image_z=IMG_Z)
    t0 = time.time()
    params, _ = fit_lm(resid, p0, trainable=scene.trainable(), steps=15)
    print(f'[design finished in {time.time()-t0:.0f} s]')

    # merit with the ray grid FROZEN at the nominal design (aim_params):
    # the as-built systems are probed by nominal rays
    loss, _ = default_merit(scene, fields=FIELDS, wavelengths=LINES,
                            n_pupil=24, image_z=IMG_Z, aim_params=params)

    def loss_c(p, c):                      # c[0]: focus shim at test (mm)
        l, _ = default_merit(scene, fields=FIELDS, wavelengths=LINES,
                             n_pupil=24, image_z=IMG_Z + c[0],
                             aim_params=params)
        return l(p)

    # shop-typical starting tolerances, every element
    tols = {name: {'trans': [0.02, 0.02, 0.05],      # mm
                   'rot_vec': [1e-3, 1e-3, 0.0],     # rad (~3.4 arcmin)
                   'c1': 2e-5, 'c2': 2e-5}           # 1/mm
            for name in ('crown_front', 'flint', 'crown_rear')}

    t0 = time.time()
    rep = tolerance_sensitivity(loss, params, tols)
    print(f'--- sensitivity at starting limits [{time.time()-t0:.0f} s, '
          f'{2*len(rep.labels)+1} systems in one batch] ---')
    print(rep.table())

    budget = rep.rms0 * 1.15
    t0 = time.time()
    new_tols, rep2 = allocate_tolerances(loss, params, tols, budget)
    print(f'\n--- allocated for a {budget*1e3:.1f} um as-built budget '
          f'[{time.time()-t0:.0f} s] ---')
    print(rep2.table())

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    rms_u, y_u = tolerance_yield(loss, params, new_tols, key,
                                 n_trials=512, budget=budget)
    rms_c, y_c = tolerance_yield(loss_c, params, new_tols, key,
                                 n_trials=512, budget=budget,
                                 comp0=jnp.zeros((1,)), comp_scale=0.25)
    print(f'\n--- 512-build Monte-Carlo yield [{time.time()-t0:.0f} s] ---')
    print(f'budget {budget*1e3:.1f} um rms spot')
    print(f'uncompensated: p50 {np.median(rms_u)*1e3:.1f} um  '
          f'p95 {np.percentile(rms_u, 95)*1e3:.1f} um  yield {y_u:.1%}')
    print(f'refocused:     p50 {np.median(rms_c)*1e3:.1f} um  '
          f'p95 {np.percentile(rms_c, 95)*1e3:.1f} um  yield {y_c:.1%}')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(OUT, exist_ok=True)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.6))
        order = np.argsort(rep2.contribution)[::-1]
        ax1.barh([rep2.labels[i] for i in order][::-1],
                 rep2.contribution[order][::-1] * 1e6)
        ax1.set_xlabel('merit contribution (um^2)')
        ax1.set_title('allocated sensitivity')
        ax1.tick_params(labelsize=6)
        bins = np.linspace(0, max(np.max(rms_u), budget * 1.5) * 1e3, 40)
        ax2.hist(np.asarray(rms_u) * 1e3, bins=bins, alpha=0.6,
                 label=f'uncompensated ({y_u:.0%})')
        ax2.hist(np.asarray(rms_c) * 1e3, bins=bins, alpha=0.6,
                 label=f'refocused ({y_c:.0%})')
        ax2.axvline(budget * 1e3, color='k', ls='--', lw=1)
        ax2.set_xlabel('as-built rms spot (um)')
        ax2.set_title('512-build yield')
        ax2.legend(fontsize=7)
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '17_tolerancing.png'), dpi=120)
        print(f"\nsaved {os.path.join(OUT, '17_tolerancing.png')}")
    except Exception as e:                      # headless-matplotlib guard
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
