"""Wave optics on the MXU: through-focus PSF stack + Talbot carpet.

Two demos of utils/propagation.py (angular-spectrum / Fresnel
transfer-function propagation, complex fields as (re, im) float pairs,
every transform a separable DFT matmul):

1. The benchmark singlet is ray-traced with ``track_opl=True``, its
   exit pupil binned (pupil_from_trace), and the focal-plane field
   propagated to 41 defocus planes — the axial intensity "caustic"
   around best focus, including the spherical-aberration asymmetry a
   real singlet has (the pupil OPD rides the propagated field, so the
   through-focus stack is NOT symmetric like an ideal lens's).

2. A 16-um amplitude grating is Fresnel-propagated over two Talbot
   lengths and re-images itself at z_T = 2 p^2 / lambda — the carpet's
   self-images and half-period-shifted half-Talbot planes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens,
                               pupil_from_trace, through_focus_psf)
from raytracetorch_tpu.utils.propagation import (fresnel_transfer,
                                                 grating_field)

LAM = 0.5876e-3         # helium d line, mm


def through_focus_demo():
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=4.0, name='stop'),
        SensorElement(radius=6.0, translation=[0, 0, 19.322],
                      name='sensor')])
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    launch = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0, 0, -10.0]).sample(key,
                                                                   200_000)
    out, _, aux = scene.simulate(params, launch, key, track_opl=True)
    opd, amp = pupil_from_trace(launch, out, aux['opl'], pupil_radius=4.0,
                                n=64)
    f_number = 20.5 / 8.0                     # ~f/2.6 working
    zs = jnp.linspace(-0.4, 0.4, 41)
    stack, dx = through_focus_psf(opd, amp, LAM, f_number, zs, pad=4)
    stack = np.asarray(stack)

    # axial slice [z, x] through the PSF center row
    c = stack.shape[1] // 2
    carpet = stack[:, c, :]
    peaks = stack.max(axis=(1, 2))
    print(f'through-focus peak plane: z = {float(zs[np.argmax(peaks)]):+.3f}'
          f' mm (spherical aberration shifts it off zero)')
    assert np.isfinite(stack).all()
    return np.asarray(zs), carpet, peaks


def talbot_demo():
    n, period_px, dx = 512, 16, 1e-3
    p = period_px * dx
    zt = 2.0 * p * p / LAM
    re, im = grating_field(n, period_px)
    i0 = np.asarray(re * re)

    n_planes = 97                  # odd count: index 48 lands ON z_T
    zs = np.linspace(0.0, 2.0 * zt, n_planes)
    rows = []
    for z in zs:
        r, i = fresnel_transfer(re, im, dx, LAM, float(z))
        rows.append(np.asarray(r * r + i * i)[n // 2, 128:256])
    carpet = np.stack(rows)                     # [z, x]

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum()
                     / np.sqrt((a * a).sum() * (b * b).sum() + 1e-30))

    c1 = corr(carpet[n_planes // 2], i0[n // 2, 128:256])
    print(f'self-image correlation at z_T: {c1:.3f}')
    assert c1 > 0.9
    return zs, carpet, zt


def wave_trace_demo():
    """Full-system wave trace of the singlet: the split-step BPM
    (per-face sag screens + in-glass hops) lands its focus where the
    ray tracer puts it."""
    from raytracetorch_tpu import wave_trace
    from raytracetorch_tpu.utils.wavefront import best_focus

    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=6.0, translation=[0, 0, 19.322],
                      name='sensor')])
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    launch = CollimatedDisk.make(radius=jnp.float32(2.0),
                                 translation=[0, 0, -5.0]).sample(key,
                                                                  50_000)
    out, _, _ = scene.simulate(params, launch, key)
    z_ray = float(best_focus(out)[2])

    n, dx = 256, 0.025
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    re = (r2 <= 4.0).astype(jnp.float32)
    im = jnp.zeros_like(re)
    r1, i1, z_s = wave_trace(scene, params, re, im, dx, LAM, z0=-5.0)
    I = np.asarray(r1 * r1 + i1 * i1)
    print(f'wave-trace sensor plane z = {float(z_s):.3f}; ray best focus '
          f'z = {z_ray:.3f} (max-axial-intensity vs min-RMS-spot differ '
          'by a fraction of the SA focal spread)')
    return I, dx


def main():
    zs_f, focus_carpet, peaks = through_focus_demo()
    zs_t, talbot_carpet, zt = talbot_demo()
    sensor_I, dx_w = wave_trace_demo()
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 4, figsize=(17, 4))
        axes[0].imshow(focus_carpet.T, origin='lower', cmap='magma',
                       aspect='auto',
                       extent=[zs_f[0], zs_f[-1], 0, focus_carpet.shape[1]])
        axes[0].set_title('singlet through-focus |U|^2 (axial slice)')
        axes[0].set_xlabel('defocus [mm]')
        axes[1].plot(zs_f, peaks)
        axes[1].set_title('peak intensity vs defocus')
        axes[1].set_xlabel('defocus [mm]')
        axes[2].imshow(talbot_carpet.T, origin='lower', cmap='magma',
                       aspect='auto', extent=[0, 2, 0, talbot_carpet.shape[1]])
        axes[2].set_title(f'Talbot carpet (z_T = {zt:.2f} mm)')
        axes[2].set_xlabel('z / z_T')
        c = sensor_I.shape[0] // 2
        hw = 40
        axes[3].imshow(np.sqrt(sensor_I[c - hw:c + hw, c - hw:c + hw]),
                       origin='lower', cmap='magma',
                       extent=[-hw * dx_w, hw * dx_w,
                               -hw * dx_w, hw * dx_w])
        axes[3].set_title('full wave TRACE: field at the sensor\n'
                          '(sag screens + in-glass hops)')
        axes[3].set_xlabel('x [mm]')
        fig.tight_layout()
        fig.savefig(os.path.join(os.path.dirname(__file__), 'output',
                                 '30_wave_propagation.png'), dpi=110)
        print('wrote examples/output/30_wave_propagation.png')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
