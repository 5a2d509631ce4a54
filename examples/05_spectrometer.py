"""Design a grating spectrometer: a transmissive diffraction grating
disperses wavelengths, a singlet focuses each onto a line sensor, and
jax.grad tunes the lens bending + sensor placement so every channel comes
to a sharp focus.  Reports the dispersion (mm/nm) and per-channel spot
size; saves a spectral spot plot."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, DiffractionGrating,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit

OUT = os.path.join(os.path.dirname(__file__), 'output')
PERIOD_UM = 3.0          # grating period (um)
CHANNELS = np.linspace(0.45, 0.65, 9)   # um
F_NOMINAL = 80.0         # mm


def main():
    key = jax.random.PRNGKey(0)
    scene = SequentialScene([
        DiffractionGrating(period_um=PERIOD_UM, order=1, diameter=30.0,
                           name='grating'),
        SingletLens(c1=0.012, c2=-0.012, d=24.0, t=4.0, ior_glass=1.5168,
                    abbe_vd=64.17, c1_grad=True, c2_grad=True,
                    translation=[0, 0, 6.0], name='lens'),
        SensorElement(radius=30.0, translation=[0, 0, 6.0 + F_NOMINAL],
                      trans_grad=True, trans_mask=[0, 0, 1], name='sensor'),
    ])
    params = scene.init_params()

    bundles = [(CollimatedDisk.make(radius=jnp.float32(4.0), ray_id=i,
                                    wavelength=float(wl),
                                    translation=[0, 0, -5.0]), 2000)
               for i, wl in enumerate(CHANNELS)]
    rays = scene.sample_rays(key, bundles)

    def loss(p):
        _, sensors, _ = scene.simulate(p, rays, key,
                                       n_bundles=len(CHANNELS))
        return jnp.sum(sensors.spot_rms(0) ** 2)

    def report(p, tag):
        _, sensors, _ = scene.simulate(p, rays, key,
                                       n_bundles=len(CHANNELS))
        cx = np.asarray(sensors.centroid(0))[:, 0]
        rms = np.asarray(sensors.spot_rms(0))
        disp = np.polyfit(CHANNELS * 1000.0, cx, 1)[0]   # mm per nm
        print(f'{tag}: dispersion {disp * 1e3:.3f} um/nm, '
              f'mean spot RMS {rms.mean():.4f} mm, '
              f'worst {rms.max():.4f} mm')
        return cx, rms, disp

    print('channels (um):', np.round(CHANNELS, 3).tolist())
    report(params, 'before')
    params, losses = fit(loss, params, trainable=scene.trainable(),
                         steps=400, lr=2e-3)
    cx, rms, disp = report(params, 'after ')
    print(f'loss {float(losses[0]):.5f} -> {float(losses[-1]):.6f}')

    # resolving power: channel spacing on the sensor vs spot size
    spacing = np.abs(np.diff(cx)).mean()
    print(f'channel spacing {spacing:.3f} mm vs spot RMS '
          f'{rms.mean():.4f} mm -> ~{spacing / max(rms.mean(), 1e-9):.0f}x '
          f'separation (25 nm channels cleanly resolved)')

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    out, sensors, aux = scene.simulate(params, rays, key,
                                       record_hits=True)
    os.makedirs(OUT, exist_ok=True)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    hits = np.asarray(aux['hits'][-1])          # sensor-plane hit cloud
    alive = np.asarray(out.intensity) > 0
    per = len(hits) // len(CHANNELS)
    for i, wl in enumerate(CHANNELS):
        sel = np.zeros(len(hits), bool)
        sel[i * per:(i + 1) * per] = True
        sel &= alive
        ax1.plot(hits[sel, 0], hits[sel, 1], '.', ms=1,
                 color=plt.cm.rainbow(i / (len(CHANNELS) - 1)),
                 label=f'{wl * 1000:.0f} nm' if i % 2 == 0 else None)
    ax1.set_xlabel('sensor x (mm)')
    ax1.set_ylabel('sensor y (mm)')
    ax1.set_title('spectral spots (optimized)')
    ax1.legend(markerscale=12, fontsize=7)
    ax2.plot(CHANNELS * 1000, cx, 'o-')
    ax2.set_xlabel('wavelength (nm)')
    ax2.set_ylabel('centroid x (mm)')
    ax2.set_title(f'dispersion {disp * 1e3:.2f} um/nm')
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, '05_spectrometer.png'), dpi=110)
    print('saved', os.path.join(OUT, '05_spectrometer.png'))


if __name__ == '__main__':
    main()
