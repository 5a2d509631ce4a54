"""Wavefront-driven Zernike corrector: measure, prescribe, polish.

The workflow Zernike surfaces exist for: a MEASURED wavefront error maps
1:1 onto a corrector prescription because analysis and surface share the
same (Noll-indexed, unnormalized) basis.

  1. MEASURE  — a tilted plano-convex singlet (flat side toward the
     collimated beam: maximal spherical aberration, plus coma/astig from
     the tilt) is traced with ``track_opl=True`` and the OPD about best
     focus is decomposed with ``utils.wavefront.zernike_fit``.
  2. PRESCRIBE — a flat plate in the collimated input space gets a
     ``ZernikeLens`` front face with z_j = +W_j/(n-1): a sag s adds
     OPD -(n-1)s at the pupil point, so this cancels the measurement
     term by term (piston/tilt excluded — they only move the focus).
  3. POLISH  — the one-shot prescription assumes a perfect pupil map;
     ``jax.grad`` descends the true traced wavefront RMS directly in
     the Zernike coefficients to mop up the residual.

The torch reference cannot express any surface beyond the stubbed even
asphere (reference geom/complex.py:6-10).

Run: python examples/20_zernike_corrector.py [--cpu]   (~2 min CPU)
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

from raytracetorch_tpu import (SensorElement, SequentialScene, SingletLens,
                               ZernikeLens, fit)
from raytracetorch_tpu.rays.ray import Rays
from raytracetorch_tpu.utils.wavefront import (best_focus, opl_to_point,
                                               wavefront_rms, zernike_fit,
                                               zernike_name)

OUT = os.path.join(os.path.dirname(__file__), 'output')

N_GLASS = 1.5168
BEAM_R = 6.0                     # pupil radius (lens units = mm)
TILT = 0.03                      # rad, breaks rotational symmetry
WAVELEN = 0.587e-3               # mm (d line)
C2 = -1.0 / (50.0 * (N_GLASS - 1.0))     # plano-convex, f ~ 50


def beam(n=20000, key=0):
    k = jax.random.PRNGKey(key)
    xy = jax.random.uniform(k, (2, n), minval=-BEAM_R, maxval=BEAM_R)
    ok = (xy[0] ** 2 + xy[1] ** 2 <= BEAM_R ** 2).astype(jnp.float32)
    zero = jnp.zeros((n,))
    return Rays.from_components(
        (xy[0], xy[1], zero - 10.0), (zero, zero, jnp.ones((n,))),
        ok, jnp.zeros((n,), jnp.int32), zero)


def build(z_terms):
    """Corrector plate (possibly flat) + the aberrated singlet + sensor."""
    els = []
    if z_terms:
        els.append(ZernikeLens(c1=0.0, c2=0.0, d=2.2 * BEAM_R, t=2.0,
                               ior_glass=N_GLASS, z1=z_terms, z1_grad=True,
                               norm_radius=BEAM_R, translation=[0, 0, -5.0],
                               name='corrector'))
    els.append(SingletLens(c1=0.0, c2=C2, d=16.0, t=3.0,
                           ior_glass=N_GLASS, rotation=[TILT, 0.0, 0.0],
                           name='lens'))
    els.append(SensorElement(radius=10.0, translation=[0, 0, 52.0],
                             name='sensor'))
    return SequentialScene(els)


def measure(scene, params, rays, key):
    """Trace -> (wavefront RMS in waves, Noll OPD coefficients, pupil/opd)."""
    out, _, aux = scene.simulate(params, rays, key, track_opl=True)
    opl, w = aux['opl'], out.intensity
    rms = wavefront_rms(out, opl, weights=w, refocus=True) / WAVELEN
    pupil = jnp.stack([rays.px, rays.py], axis=1)
    F = best_focus(out)
    opd = opl_to_point(out, opl, F)
    coef = zernike_fit(pupil, opd, BEAM_R, weights=w, n_terms=28)
    return float(rms), np.asarray(coef), (np.asarray(pupil), np.asarray(opd),
                                          np.asarray(w))


def main():
    rays = beam()
    key = jax.random.PRNGKey(1)

    # 1. MEASURE the bare system
    bare = build([])
    rms0, coef, _ = measure(bare, bare.init_params(), rays, key)
    print(f'bare tilted singlet: wavefront RMS {rms0:.2f} waves')
    print('measured OPD decomposition (waves, |c| > 0.05):')
    for i, c in enumerate(coef):
        if i >= 3 and abs(c) / WAVELEN > 0.05:
            print(f'  z{i + 1:<2d} {zernike_name(i + 1):<12s} '
                  f'{c / WAVELEN:+8.2f}')

    # 2. PRESCRIBE: z_j = +W_j/(n-1)  (a sag s adds OPD -(n-1)s; skip
    #    piston and tilt — they relocate the focus, not the blur)
    terms = [(i + 1, float(c) / (N_GLASS - 1.0))
             for i, c in enumerate(coef)
             if i >= 3 and abs(c) / WAVELEN > 0.05]
    scene = build(terms)
    params = scene.init_params()
    rms1, _, _ = measure(scene, params, rays, key)
    print(f'one-shot prescription ({len(terms)} terms): '
          f'RMS {rms0:.2f} -> {rms1:.3f} waves ({rms0 / rms1:.0f}x)')

    # 3. POLISH: descend the true traced wavefront RMS in the z_j
    def loss(p):
        out, _, aux = scene.simulate(p, rays, key, track_opl=True)
        return (wavefront_rms(out, aux['opl'], weights=out.intensity,
                              refocus=True) / WAVELEN) ** 2

    t0 = time.time()
    params, _ = fit(loss, params, trainable=scene.trainable(),
                    steps=200, lr=2e-5)
    rms2, _, _ = measure(scene, params, rays, key)
    print(f'after gradient polish: RMS {rms2:.4f} waves '
          f'({rms0 / rms2:.0f}x total, {time.time() - t0:.0f} s)'
          + (' — diffraction-limited' if rms2 < 1 / 14 else ''))
    print('corrector prescription (sag, lens units):')
    for (j, _), v in zip(terms, params['corrector']['z1']):
        print(f'  z{j:<2d} {zernike_name(j):<12s} {float(v):+.4e}')

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(OUT, exist_ok=True)
        fig, axes = plt.subplots(1, 3, figsize=(10, 3.2))
        for ax, (sc, pp, ttl) in zip(axes, (
                (bare, bare.init_params(), f'bare ({rms0:.1f}λ rms)'),
                (scene, scene.init_params(),
                 f'prescribed ({rms1:.2f}λ)'),
                (scene, params, f'polished ({rms2:.3f}λ)'))):
            _, _, (pup, opd, w) = measure(sc, pp, rays, key)
            sel = w > 0
            o = (opd - opd[sel].mean()) / WAVELEN
            s = ax.scatter(pup[sel, 0], pup[sel, 1], c=o[sel], s=1,
                           cmap='RdBu_r')
            fig.colorbar(s, ax=ax, label='OPD (waves)')
            ax.set_title(ttl, fontsize=9)
            ax.set_aspect('equal')
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '20_zernike_corrector.png'), dpi=120)
        print(f"saved {os.path.join(OUT, '20_zernike_corrector.png')}")
    except Exception as e:                      # headless-matplotlib guard
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
