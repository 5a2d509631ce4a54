"""The designer's analysis suite on one lens: first-order (Gaussian)
report, Seidel table, transverse ray fans, astigmatic field curves with
distortion, and the through-focus curve with the closed-form best-focus
solve — the full set of views a lens-design package puts around a
prescription (utils/firstorder.py, utils/seidel.py, utils/fieldscan.py,
utils/focus.py; the torch reference has none of this layer).  Saves a
4-panel figure."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
from jax import enable_x64

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens,
                               best_focus_plane, field_scan, ray_fan,
                               seidel_table, through_focus_rms)

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)
    with enable_x64():
        scene = SequentialScene([
            SingletLens(c1=0.035, c2=-0.015, d=12.0, t=2.5,
                        ior_glass=1.5168, abbe_vd=64.17, name='L'),
            CircularAperture(radius=4.0, translation=(0, 0, 3.0),
                             name='stop'),
            SensorElement(radius=8.0, translation=(0, 0, 40.0),
                          name='sensor')])
        p = scene.init_params(jnp.float64)

        # -- 1. Gaussian datasheet + Seidel table -------------------------
        fo = scene.first_order(p, field=0.06)
        print('=== first-order report ===')
        print(f"EFL {float(fo.efl):.4f}   BFL {float(fo.bfl):.4f}   "
              f"FFL {float(fo.ffl):.4f}   f/{float(fo.fno):.3f}   "
              f"NA {float(fo.na_image):.4f}")
        print(f"EnP z {float(fo.enp_z):.4f} (r {float(fo.enp_semi):.3f})   "
              f"ExP z {float(fo.exp_z):.4f} (r {float(fo.exp_semi):.3f})")
        print(f"principal planes {float(fo.z_principal_front):.4f} / "
              f"{float(fo.z_principal_back):.4f}   "
              f"paraxial image z {float(fo.z_image):.4f}")
        rep = scene.seidel(p, aperture=4.0, field=0.06)
        print('\n=== Seidel table ===')
        print(seidel_table(rep))

        # -- 2. ray fans at three fields ----------------------------------
        fields = (0.0, 0.04, 0.06)
        fans = [scene.ray_fan(p, field=f, n=41) for f in fields]

        # -- 3. field curves + distortion ---------------------------------
        fs = scene.field_scan(p, jnp.linspace(1e-3, 0.06, 13), n_pupil=64)

        # -- 4. through-focus + best-focus solve --------------------------
        rays = CollimatedDisk.make(radius=4.0,
                                   translation=(0, 0, -10.0)).sample(
                                       key, 20000, dtype=jnp.float64)
        out, _, _ = scene.simulate(p, rays, key)
        z_star, rms_star = best_focus_plane(out)
        zs = jnp.linspace(float(fo.z_image) - 2.5, float(fo.z_image) + 1.0,
                          121)
        curve = through_focus_rms(out, zs)
        print(f"\nbest focus z* = {float(z_star):.4f} "
              f"(paraxial {float(fo.z_image):.4f}), "
              f"RMS {float(rms_star) * 1e3:.2f} um")

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, axs = plt.subplots(1, 4, figsize=(18, 4))

    ax = axs[0]
    for f, fan in zip(fields, fans):
        m = np.asarray(fan.alive_t)
        ax.plot(np.asarray(fan.pupil)[m], np.asarray(fan.ey_t)[m] * 1e3,
                label=f'field {f}')
    ax.set_xlabel('relative pupil')
    ax.set_ylabel('transverse error ey (x1e-3)')
    ax.set_title('tangential ray fans')
    ax.legend(fontsize=8)
    ax.axhline(0, color='gray', lw=0.5)

    ax = axs[1]
    deg = np.degrees(np.arctan(np.asarray(fs.fields)))
    ax.plot(np.asarray(fs.field_t), deg, label='T')
    ax.plot(np.asarray(fs.field_s), deg, label='S')
    ax.set_xlabel('focus shift vs paraxial image')
    ax.set_ylabel('field angle (deg)')
    ax.set_title('astigmatic field curves')
    ax.legend(fontsize=8)
    ax.axvline(0, color='gray', lw=0.5)

    ax = axs[2]
    ax.plot(np.asarray(fs.distortion_pct), deg)
    ax.set_xlabel('distortion (%)')
    ax.set_ylabel('field angle (deg)')
    ax.set_title('distortion')
    ax.axvline(0, color='gray', lw=0.5)

    ax = axs[3]
    ax.plot(np.asarray(zs), np.asarray(curve) * 1e3)
    ax.axvline(float(z_star), color='tab:red', ls='--',
               label=f'z* = {float(z_star):.3f}')
    ax.axvline(float(fo.z_image), color='gray', ls=':',
               label='paraxial image')
    ax.set_xlabel('z')
    ax.set_ylabel('spot RMS (x1e-3)')
    ax.set_title('through-focus')
    ax.legend(fontsize=8)

    fig.tight_layout()
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, '14_analysis_suite.png')
    fig.savefig(path, dpi=110)
    print('saved', path)


if __name__ == '__main__':
    main()
