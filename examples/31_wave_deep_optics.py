"""Wave-domain deep optics: re-optimize a phase plate against a
physical-optics merit (round-4 VERDICT ask #4).

Example 28 learns a ring former with a RAY proxy (every ray lands on a
radius-R circle).  Rays are blind to diffraction: the proxy does not
know the ring has a diffraction-limited width, cannot trade geometric
residual against sidelobe structure, and scores 26% of the launched
power inside the +/-80 um design annulus under the wave model.  Here we
take the ray-learned plate and RE-optimize the same [24, 24] pixel map
against ``wave_encircled_loss`` — jax.grad flows through the split-step
wave trace (DFT matmuls + the plate's 2-pi-m cycles screen) into every
pixel — nearly doubling the annular encircled energy (measured
0.26 -> 0.49; the diffraction ring width ~lam L / (pi w0) = 68 um means
~0.5 is close to the physical ceiling for this bucket).

Scale note: the wave grid must resolve the plate's phase slope
(R / (L m lam) cycles/mm ring kick).  Example 28's r = 2 mm @ 40 mm
ring needs 85 cycles/mm — far past a 128-point grid's Nyquist — so this
example designs a fiber-scale ring (r = 0.4 mm @ 200 mm, 3.4 cycles/mm)
instead; the ray proxy is scale-free, the wave model is not.

The torch reference has no wave model (rays only); this is the
beyond-reference design loop its deep-optics analog would need.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, PhaseGridPlate,
                               SensorElement, SequentialScene, fit,
                               wave_encircled_loss)
from raytracetorch_tpu.utils.beamprop import wave_trace

WL = 0.5876e-3        # trace units (mm)
L, R_RING = 200.0, 0.4
HX = 1.2
N, DX = 128, 0.04
W0 = 0.55


def main():
    key = jax.random.PRNGKey(0)
    sc = SequentialScene([
        PhaseGridPlate(half_x=HX, half_y=HX, shape=(24, 24),
                       name='plate'),
        SensorElement(radius=2.0, translation=[0, 0, L], name='det')])

    # stage 1 — example 28's ray proxy: every ray onto the ring
    rays = CollimatedDisk.make(radius=jnp.float32(1.0),
                               translation=[0, 0, -3.0],
                               wavelength=0.5876).sample(key, 20_000)

    def ray_loss(p):
        out, _, _ = sc.simulate(p, rays, key)
        r = jnp.sqrt(out.px ** 2 + out.py ** 2 + 1e-12)
        w = out.intensity
        return jnp.sum(w * (r - R_RING) ** 2) / jnp.maximum(jnp.sum(w),
                                                            1e-9)

    p_ray, hist = fit(ray_loss, sc.init_params(),
                      trainable=sc.trainable(), steps=400, lr=0.8)
    print(f'ray proxy: ring residual rms '
          f'{np.sqrt(float(hist[-1])) * 1e3:.0f} um')

    # stage 2 — the wave merit: encircled energy in the design annulus
    ax = (jnp.arange(N) - N // 2) * DX
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    re = jnp.exp(-r2 / W0 ** 2)
    im = jnp.zeros((N, N), jnp.float32)

    def w_loss(p):
        return wave_encircled_loss(
            sc, p, re, im, DX, WL, z0=-1.0, radius=0.0,
            annulus=(R_RING - 0.08, R_RING + 0.08), soft=2.0)

    ee_ray = 1.0 - float(w_loss(p_ray))
    p_w, whist = fit(w_loss, p_ray, trainable=sc.trainable(), steps=300,
                     lr=0.02)
    ee_wave = 1.0 - float(whist[-1])
    print(f'annular EE (+/-80 um): ray-proxy design {ee_ray:.3f} -> '
          f'wave-reoptimized {ee_wave:.3f} ({ee_wave / ee_ray:.2f}x)')
    assert ee_ray < 0.35            # the proxy really is wave-blind
    assert ee_wave > 0.42           # the wave merit fixes it
    assert ee_wave > ee_ray * 1.5

    # render both sensor fields
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(13, 4))
        for axp, p, title in ((axes[0], p_ray, 'ray-proxy design'),
                              (axes[1], p_w, 'wave-reoptimized')):
            r1, i1, _ = wave_trace(sc, p, re, im, DX, WL, z0=-1.0)
            I = np.asarray(r1) ** 2 + np.asarray(i1) ** 2
            ext = N // 2 * DX
            axp.imshow(I, origin='lower', cmap='magma',
                       extent=[-ext, ext, -ext, ext])
            th = np.linspace(0, 2 * np.pi, 200)
            for rr in (R_RING - 0.08, R_RING + 0.08):
                axp.plot(rr * np.cos(th), rr * np.sin(th), 'c--', lw=0.7)
            axp.set_title(f'{title}: sensor |E|^2')
        im2 = axes[2].imshow(np.asarray(p_w['plate']['grid']),
                             cmap='twilight', extent=[-HX, HX, -HX, HX])
        axes[2].set_title('re-optimized phase map (cycles)')
        fig.colorbar(im2, ax=axes[2])
        fig.tight_layout()
        out = os.path.join(os.path.dirname(__file__), 'output',
                           '31_wave_deep_optics.png')
        fig.savefig(out, dpi=110)
        print(f'wrote {out}')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
