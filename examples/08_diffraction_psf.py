"""Diffraction analysis of a parabolic mirror vs a spherical mirror at the
same speed (f/2.5): trace both with OPL tracking, bin the pupil function,
and compare diffraction PSFs, Strehl ratios and MTF curves.  The parabola
is diffraction-limited by construction (equal OPLs); the sphere's spherical
aberration at f/2.5 collapses its Strehl — the classic reason telescope
primaries are parabolized.  Saves a 4-panel figure."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (ParabolicMirror, Rays, SequentialScene,
                               SphericalMirror, diffraction_mtf,
                               diffraction_psf, pupil_from_trace,
                               strehl_ratio)

OUT = os.path.join(os.path.dirname(__file__), 'output')
WL = 0.55e-3          # 550 nm in mm
APERTURE = 4.0        # semi-diameter, mm
F = 20.0              # focal length -> f/2.5
FNUM = F / (2 * APERTURE)


def launch(n_side=81):
    u = np.linspace(-APERTURE, APERTURE, n_side)
    xx, yy = np.meshgrid(u, u)
    keep = xx ** 2 + yy ** 2 <= APERTURE ** 2
    pos = np.stack([xx[keep], yy[keep],
                    np.full_like(xx[keep], 10.0)], -1)
    d = np.broadcast_to(np.array([0.0, 0.0, -1.0]), pos.shape)
    return Rays.create(pos, d)


def pupil_of(element, key):
    scene = SequentialScene([element])
    params = scene.init_params()
    rays = launch()
    out, _, aux = scene.simulate(params, rays, key, track_opl=True)
    return pupil_from_trace(rays, out, aux['opl'], pupil_radius=APERTURE,
                            n=48)


def main():
    key = jax.random.PRNGKey(0)
    c = 1.0 / (2.0 * F)
    opd_p, amp_p = pupil_of(ParabolicMirror(c1=c, d=2 * APERTURE,
                                            name='parabola'), key)
    opd_s, amp_s = pupil_of(SphericalMirror(c1=c, d=2 * APERTURE,
                                            name='sphere'), key)

    s_p = float(strehl_ratio(opd_p, amp_p, WL))
    s_s = float(strehl_ratio(opd_s, amp_s, WL))
    psf_p, dx = diffraction_psf(opd_p, amp_p, WL, FNUM, pad=8)
    psf_s, _ = diffraction_psf(opd_s, amp_s, WL, FNUM, pad=8)
    fr, mtf_p, _ = diffraction_mtf(opd_p, amp_p, WL, FNUM)
    _, mtf_s, _ = diffraction_mtf(opd_s, amp_s, WL, FNUM)
    print(f'parabola: Strehl {s_p:.3f} (diffraction-limited)')
    print(f'sphere:   Strehl {s_s:.3f} '
          f'(spherical aberration ~D/(2048 f#^3) = '
          f'{2*APERTURE/2048/FNUM**3*1e3:.2f} um rms)')
    print(f'Airy radius 1.22 lambda F# = {1.22*WL*FNUM*1e3:.2f} um')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    os.makedirs(OUT, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(10, 9))
    span_um = 40.0
    k = int(span_um / (float(dx) * 1e3))
    c0 = psf_p.shape[0] // 2
    ext = [-span_um, span_um, -span_um, span_um]
    for ax, psf, name, s in ((axes[0, 0], psf_p, 'parabola', s_p),
                             (axes[0, 1], psf_s, 'sphere', s_s)):
        img = np.asarray(psf)[c0 - k:c0 + k, c0 - k:c0 + k]
        ax.imshow(np.log10(img / img.max() + 1e-7), extent=ext,
                  cmap='inferno', vmin=-5)
        ax.set_title(f'{name} PSF (log), Strehl {s:.3f}')
        ax.set_xlabel('um')
    fn = np.asarray(fr)
    axes[1, 0].plot(fn, np.asarray(mtf_p), label='parabola')
    axes[1, 0].plot(fn, np.asarray(mtf_s), label='sphere')
    axes[1, 0].axvline(1 / (WL * FNUM), ls=':', c='gray', label='cutoff')
    axes[1, 0].set_xlabel('cycles/mm')
    axes[1, 0].set_ylabel('diffraction MTF')
    axes[1, 0].legend()
    im = axes[1, 1].imshow(np.asarray(opd_s) / WL * np.asarray(amp_s > 0),
                           cmap='RdBu')
    fig.colorbar(im, ax=axes[1, 1], label='waves')
    axes[1, 1].set_title('sphere pupil OPD')
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, '08_diffraction_psf.png'), dpi=110)
    print('saved', os.path.join(OUT, '08_diffraction_psf.png'))


if __name__ == '__main__':
    main()
