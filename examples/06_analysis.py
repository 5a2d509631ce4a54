"""The analysis toolkit on one design: trace a singlet at best focus and
report (a) the Zernike aberration spectrum from traced optical path
lengths, (b) the geometric MTF of the focal-spot irradiance, and (c) the
pupil map of polarized (Fresnel) transmission.  Saves a 3-panel figure."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, Rays, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.polarization import polarized_sequential_trace
from raytracetorch_tpu.utils.wavefront import (ZERNIKE_NAMES, best_focus,
                                               opl_to_point, zernike_fit)
from raytracetorch_tpu.utils.mtf import geometric_mtf, mtf50

OUT = os.path.join(os.path.dirname(__file__), 'output')
PUPIL_R = 6.0


def main():
    key = jax.random.PRNGKey(0)
    lens = SingletLens(c1=0.02, c2=-0.02, d=16.0, t=4.0, ior_glass=1.5168,
                       name='lens')
    scene = SequentialScene([lens])
    params = scene.init_params()
    f_bfl = float(lens.f_bfl(params['lens']))
    print(f'singlet f_bfl = {f_bfl:.2f} mm')

    # pupil-gridded collimated bundle (keep launch xy as pupil coordinates)
    n = 96
    gx, gy = np.meshgrid(np.linspace(-PUPIL_R, PUPIL_R, n),
                         np.linspace(-PUPIL_R, PUPIL_R, n))
    keep = gx ** 2 + gy ** 2 <= PUPIL_R ** 2
    px, py = gx[keep], gy[keep]
    pos = np.stack([px, py, np.full_like(px, -10.0)], axis=1)
    d = np.tile([0.0, 0.0, 1.0], (len(px), 1))
    rays = Rays.create(pos, d, wavelength=np.full(len(px), 0.5876))

    out, _, aux = scene.simulate(params, rays, key, track_opl=True)
    alive = np.asarray(out.intensity) > 0

    # (a) Zernike spectrum of the OPD about best focus
    focus = best_focus(out)
    total = np.asarray(opl_to_point(out, aux['opl'], focus))
    opd = total - total[alive].mean()
    coefs = np.asarray(zernike_fit(jnp.asarray(np.stack([px, py], 1)),
                                   jnp.asarray(opd), PUPIL_R,
                                   weights=jnp.asarray(alive, jnp.float32)))
    wl = 0.5876e-3  # mm
    print('Zernike spectrum (waves @ 587.6nm):')
    for name, c in zip(ZERNIKE_NAMES, coefs):
        if abs(c) / wl > 0.02:
            print(f'  {name:14s} {c / wl:+8.3f}')

    # (b) geometric MTF at the focal plane
    mtf_scene = SequentialScene([lens, SensorElement(
        radius=8.0, translation=[0, 0, 2.0 + float(focus[2] - 2.0)],
        name='sensor')])
    mtf_scene.grid_shape = (128, 128)
    mtf_scene.grid_half_extent = 0.25
    mp = mtf_scene.init_params()
    key2 = jax.random.PRNGKey(1)
    b = CollimatedDisk.make(radius=jnp.float32(PUPIL_R),
                            translation=[0, 0, -10.0])
    mrays = mtf_scene.sample_rays(key2, [(b, 200_000)])
    _, sensors, _ = mtf_scene.simulate(mp, mrays, key2)
    psf = np.asarray(sensors.grid[0])
    pitch = 2 * 0.25 / 128
    freqs, mtf_x, _ = geometric_mtf(jnp.asarray(psf), pitch)
    f50 = float(mtf50(freqs, mtf_x))
    print(f'geometric MTF50 = {f50:.1f} cycles/mm')

    # (c) polarized pupil transmission (x-polarized input)
    pol_out, power, _ = polarized_sequential_trace(
        scene, params, rays, key, E0=[[1.0, 0.0, 0.0]])
    power = np.asarray(power)
    print(f'polarized transmission: mean {power[alive].mean():.4f}, '
          f'edge-of-pupil min {power[alive].min():.4f} '
          f'(Fresnel losses grow with incidence angle)')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    os.makedirs(OUT, exist_ok=True)
    fig, (ax1, ax2, ax3) = plt.subplots(1, 3, figsize=(14, 4))
    top = np.argsort(-np.abs(coefs))[:8]
    ax1.barh([ZERNIKE_NAMES[i] for i in top][::-1],
             (coefs[top] / wl)[::-1])
    ax1.set_xlabel('waves @ 587.6 nm')
    ax1.set_title('Zernike spectrum (best focus)')
    ax2.plot(np.asarray(freqs), np.asarray(mtf_x))
    ax2.axhline(0.5, color='gray', lw=0.5)
    ax2.axvline(f50, color='gray', lw=0.5)
    ax2.set_xlabel('cycles/mm')
    ax2.set_ylabel('MTF')
    ax2.set_title(f'geometric MTF (MTF50 = {f50:.0f} c/mm)')
    sc = ax3.scatter(px[alive], py[alive], c=power[alive], s=4,
                     cmap='viridis')
    fig.colorbar(sc, ax=ax3, label='transmitted fraction')
    ax3.set_aspect('equal')
    ax3.set_title('polarized (Fresnel) pupil transmission')
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, '06_analysis.png'), dpi=110)
    print('saved', os.path.join(OUT, '06_analysis.png'))


if __name__ == '__main__':
    main()
