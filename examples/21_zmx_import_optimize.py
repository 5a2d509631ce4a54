"""Import a Zemax prescription, optimize it, export it back.

The interop workflow .zmx support exists for: a vendor/legacy
prescription (here: a deliberately detuned air-spaced doublet written
as Zemax text) loads into a differentiable scene, `fit` re-optimizes
the surfaces the way a designer would in commercial software — except
the merit gradient comes from `jax.grad` straight through the trace —
and `save_zmx` writes the OPTIMIZED design back out for whoever needs
it in Zemax again.

Run: python examples/21_zmx_import_optimize.py [--cpu]   (~1 min CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:        # for when the TPU tunnel is claimed
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, fit_lm, load_zmx, save_zmx)

OUT = os.path.join(os.path.dirname(__file__), 'output')

# An f/4, f~80 crown/flint air-spaced doublet with the front-element curvatures
# knocked ~5% off their solution (image plane at the GOOD design's
# focus) — the 'legacy file that needs rework'.
PRESCRIPTION = """\
MODE SEQ
NAME detuned air-spaced doublet
UNIT MM X W X CM MR CPMM
ENPD 20.0
WAVM 1 0.48613270 1
WAVM 2 0.58756180 1
WAVM 3 0.65627250 1
PWAV 2
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  STOP
  TYPE STANDARD
  DISZ 1.0
  DIAM 10.0
SURF 2
  TYPE STANDARD
  CURV 0.014725
  DISZ 6.0
  GLAS N-BK7 0 0 1.5168 64.17
  DIAM 11.0
SURF 3
  TYPE STANDARD
  CURV -0.015718
  DISZ 1.5
  DIAM 11.0
SURF 4
  TYPE STANDARD
  CURV -0.010965
  DISZ 3.0
  GLAS N-SF5 0 0 1.6727 32.25
  DIAM 11.0
SURF 5
  TYPE STANDARD
  CURV -0.006528
  DISZ 73.6928
  DIAM 11.0
SURF 6
  TYPE STANDARD
  DISZ 0.0
  DIAM 2.0
"""


def spot(scene, params, rays, key):
    _, sensors, _ = scene.simulate(params, rays, key)
    return float(sensors.spot_rms(0)[0])


def main():
    imp = load_zmx(PRESCRIPTION)
    scene = imp.scene
    print(f'imported {imp.name!r}: '
          + ' + '.join(type(e).__name__ for e in scene.elements))
    params = scene.init_params()
    fo = scene.first_order(params)
    print(f'as imported: EFL {float(fo.efl):.2f}, '
          f'BFL {float(fo.bfl):.2f} (image plane sits at a stale focus)')

    key = jax.random.PRNGKey(0)
    rays = CollimatedDisk.make(
        radius=jnp.float32(imp.enpd / 2.0),
        translation=[0.0, 0.0, -10.0]).sample(key, 30_000)
    rms0 = spot(scene, params, rays, key)
    print(f'spot RMS at the imported image plane: {rms0 * 1e3:.0f} um')

    # re-optimize every curvature against the imported image position
    # (the classic 'fix the file without moving the detector' task)
    for el in scene.elements:
        if hasattr(el, '_curv_names'):
            for cn in el._curv_names:
                el._grads[cn] = True

    # damped least squares (fit_lm) — the Zemax/CodeV-style optimizer:
    # per-ray radial landing errors as the residual vector, a handful of
    # Gauss-Newton steps instead of hundreds of Adam ones
    lm_rays = CollimatedDisk.make(
        radius=jnp.float32(imp.enpd / 2.0),
        translation=[0.0, 0.0, -10.0]).sample(key, 512)

    def residuals(p):
        out, _, _ = scene.simulate(p, lm_rays, key)
        w = out.intensity / jnp.maximum(jnp.sum(out.intensity), 1e-9)
        return jnp.sqrt(w) * jnp.sqrt(out.px ** 2 + out.py ** 2 + 1e-12)

    params, _ = fit_lm(residuals, params, trainable=scene.trainable(),
                       steps=12)
    rms1 = spot(scene, params, rays, key)
    print(f'after 12 damped-least-squares steps: {rms1 * 1e3:.1f} um '
          f'({rms0 / rms1:.0f}x — LM finds the better lens bending, '
          'not just a touch-up)')
    names = [(el.name, cn) for el in scene.elements
             if hasattr(el, '_curv_names') for cn in el._curv_names]
    for nm, cn in names:
        print(f'  {nm}.{cn}: {float(params[nm][cn]):+.6f}')

    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, '21_optimized.zmx')
    save_zmx(scene, params, path=path,
             wavelengths_um=imp.wavelengths_um, enpd=imp.enpd,
             name='reoptimized doublet')
    print(f'optimized design exported to {path}')
    # sanity: the exported file re-imports to the optimized system
    imp2 = load_zmx(path)
    rms2 = spot(imp2.scene, imp2.scene.init_params(), rays, key)
    print(f'reimported-export spot RMS: {rms2 * 1e3:.1f} um '
          f'(roundtrip exact: {abs(rms2 - rms1) < 1e-6})')


if __name__ == '__main__':
    main()
