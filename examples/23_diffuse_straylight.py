"""Diffuse stray light: a Lambertian-walled lens barrel by Monte Carlo.

``ghost_report`` (examples/09, 18) ranks SPECULAR two-reflection
ghosts; this example covers the diffuse half with scattering surfaces
(PhysKind.SCATTER): an out-of-field source illuminates a matte barrel
wall next to the optical path, the wall's cosine-lobe scatter sprays
onto the detector, and the designer compares wall albedos (a blacker
baffle coating) by re-running the SAME jitted trace — albedo is a
traced parameter.

Also shows a RoughMirror with a designable lobe: jax.grad of the spot
RMS w.r.t. surface roughness (reparameterized Gaussian sampling).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, LambertianScatterer,
                               RoughMirror, Scene, SensorElement)

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)

    # Out-of-field beam grazing down the barrel onto a tilted wall
    # segment (a matte disk standing in for the inner barrel surface);
    # the detector sits out of the direct path — only wall scatter
    # reaches it.
    beam = CollimatedDisk.make(
        radius=jnp.float32(2.0),
        translation=[0.0, 6.0, -20.0]).sample(key, 400_000)

    scene = Scene([
        LambertianScatterer(radius=6.0, albedo=0.5, albedo_grad=True,
                            translation=[0.0, 6.0, 10.0],
                            rotation=[-1.2, 0.0, 0.0], name='wall'),
        SensorElement(radius=5.0, translation=[0.0, -6.0, -5.0],
                      rotation=[0.6, 0.0, 0.0], name='det'),
    ], n_bounces=2)
    scene.grid_shape = (128, 128)
    scene.grid_half_extent = 5.0
    p = scene.init_params()

    @jax.jit
    def stray_flux(p):
        _, sens, _ = scene.simulate(p, beam, key)
        return sens.moments[0, ..., 0].sum(), sens.grid[0]

    for albedo in (0.5, 0.1, 0.02):
        p['wall']['albedo'] = jnp.float32(albedo)
        flux, grid = stray_flux(p)
        print(f'wall albedo {albedo:5.2f}: stray flux on detector '
              f'{float(flux):8.1f} rays-equivalent')
        if albedo == 0.5:
            grid_half = np.asarray(grid)

    # flux scales linearly in albedo — and jax.grad says so directly
    dflux = jax.grad(lambda p: stray_flux(p)[0])(p)['wall']['albedo']
    flux_now = float(stray_flux(p)[0])
    print(f'd(flux)/d(albedo) = {float(dflux):.1f} '
          f'(linear check: flux/albedo = {flux_now / 0.02:.1f})')
    np.testing.assert_allclose(float(dflux), flux_now / 0.02, rtol=1e-3)

    # --- rough mirror: lobe width inflates the return spot --------------
    # Slightly tilted so the return beam lands on a sensor OUT of the
    # incoming path (a sensor in the path would record the outgoing
    # pencil too).
    mirror = Scene([
        RoughMirror(radius=6.0, roughness=2e-3, roughness_grad=True,
                    translation=[0.0, 0.0, 20.0],
                    rotation=[0.1, 0.0, 0.0], name='m'),
        SensorElement(radius=2.5, translation=[0.0, 4.0, 0.0], name='det'),
    ], n_bounces=2)
    pm = mirror.init_params()
    pencil = CollimatedDisk.make(radius=jnp.float32(1.0),
                                 translation=[0, 0, -5.0]).sample(key,
                                                                  200_000)

    def rms2(pm):
        _, sens, _ = mirror.simulate(pm, pencil, key)
        return sens.spot_rms(0)[0] ** 2

    g = float(jax.grad(rms2)(pm)['m']['roughness'])
    sigma, L = 2e-3, 20.4        # mean mirror->sensor path
    print(f'd(spot rms^2)/d(roughness) = {g:.2f} '
          f'(analytic ~4*sigma*L^2 = {4 * sigma * L * L:.2f})')
    assert abs(g - 4 * sigma * L * L) / (4 * sigma * L * L) < 0.1

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots(figsize=(5, 4))
        im = ax.imshow(grid_half, origin='lower', cmap='magma',
                       extent=[-5, 5, -5, 5])
        ax.set_title('diffuse stray light on detector (albedo 0.5)')
        fig.colorbar(im, ax=ax, label='flux')
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '23_diffuse_straylight.png'), dpi=110)
        print('wrote', os.path.join(OUT, '23_diffuse_straylight.png'))
    except ImportError:
        pass


if __name__ == '__main__':
    main()
