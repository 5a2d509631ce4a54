"""Extended-source image simulation through a traced lens.

Completes the imaging chain end to end: trace a singlet with OPL tracking,
bin the exit-pupil function, build the diffraction PSF, and smear a USAF-
style bar target with it (utils/imaging.py — one grouped MXU convolution,
no FFT).  Shown at best focus and 1 mm inside focus: defocus visibly fills
the bar gaps.  Everything in the chain is differentiable — the same
pipeline drives "optimize the lens for image sharpness" loops (see
tests/test_analysis.py::test_simulate_image_through_aberrated_system).
Saves a 3-panel figure."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SequentialScene, SingletLens,
                               convolve_psf, diffraction_psf,
                               pupil_from_trace)

OUT = os.path.join(os.path.dirname(__file__), 'output')
WL = 0.55e-3            # 550 nm in mm
APERTURE = 4.0          # beam semi-diameter, mm


def bar_target(n=192):
    """Three-bar resolution groups at shrinking pitch."""
    img = np.zeros((n, n), np.float32)
    y = n // 8
    for pitch in (24, 16, 10, 6, 4):
        for b in range(3):
            x0 = n // 8 + b * 2 * pitch
            img[y:y + n // 5, x0:x0 + pitch] = 1.0
        y += n // 5 + n // 16
    return jnp.asarray(img)


def pupil_at(defocus_mm, key):
    """Trace the best-form singlet, reference the pupil to the bundle's
    best focus shifted by ``defocus_mm`` along the axis (the OPD picks up
    the defocus quadratic through pupil_from_trace's spherical-reference
    ``point=``)."""
    from raytracetorch_tpu.utils.wavefront import best_focus

    lens = SingletLens(c1=0.016667, c2=-0.00283, d=2 * APERTURE + 2,
                       t=4.0, ior_glass=1.5168, name='lens')
    scene = SequentialScene([lens])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(APERTURE),
                               translation=[0, 0, -10.0]).sample(key, 200_000)
    out, _, aux = scene.simulate(params, rays, key, track_opl=True)
    focus = best_focus(out) + jnp.asarray([0.0, 0.0, defocus_mm])
    opd, amp = pupil_from_trace(rays, out, aux['opl'],
                                pupil_radius=APERTURE, n=48, point=focus)
    wsum = float(jnp.maximum(jnp.sum(amp), 1e-9))
    mean = float(jnp.sum(amp * opd)) / wsum
    rms_w = (float(jnp.sum(amp * (opd - mean) ** 2)) / wsum) ** 0.5 / WL
    f_bfl = float(scene.elements[0].f_bfl(params['lens']))
    print(f"dz={defocus_mm} mm: wavefront RMS {rms_w:.2f} waves")
    return (opd, amp), f_bfl / (2 * APERTURE)


def main():
    key = jax.random.PRNGKey(0)
    obj = bar_target()
    sims = []
    for dz in (0.0, 1.0):
        (opd, amp), fnum = pupil_at(dz, key)
        opd = opd - jnp.sum(opd * amp) / jnp.maximum(jnp.sum(amp), 1e-9)
        psf, dx = diffraction_psf(opd, amp, WL, fnum, pad=2)
        sims.append((dz, np.asarray(convolve_psf(obj, psf)), dx))
        print(f"dz={dz} mm: PSF pitch {dx * 1e3:.2f} um, "
              f"peak {float(psf.max()):.2e}")

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, axes = plt.subplots(1, 3, figsize=(12, 4.2))
    panels = [('object (bar target)', np.asarray(obj))] + [
        (f'simulated, defocus {dz:+.0f} mm', im) for dz, im, _ in sims]
    for ax, (title, im) in zip(axes, panels):
        ax.imshow(im, cmap='gray', vmin=0, vmax=1)
        ax.set_title(title, fontsize=10)
        ax.set_xticks([]), ax.set_yticks([])
    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, '12_image_simulation.png')
    fig.savefig(path, dpi=110)
    print('saved', path)


if __name__ == '__main__':
    main()
