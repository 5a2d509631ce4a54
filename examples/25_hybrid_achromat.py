"""Hybrid refractive/diffractive achromat, designed by gradient.

A single BK7 lens focuses blue ~1.2 mm shorter than red (f/V ~ 80/64).
The classic two-glass achromat fixes this with a negative flint
element; a HYBRID achromat instead adds a WEAK diffractive surface
(`DiffractiveLens`) whose power scales as lam/lam0 — effective Abbe
number -3.452, opposite in sign and 18x stronger dispersion than the
crown glass — so a small SAME-SIGN diffractive power cancels the
chromatic shift without giving up refractive power.

jax.grad designs both at once: singlet curvature + DOE phase
coefficient against a 3-wavelength polychromatic spot merit.  The
fitted power split is compared with the closed-form thin-lens solution
P_r = P V_r/(V_r - V_d), P_d = P V_d/(V_d - V_r).
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, DiffractiveLens,
                               SensorElement, SequentialScene, SingletLens,
                               fit)

LAMS = (0.4861, 0.5876, 0.6563)     # F, d, C
N_D, V_R = 1.5168, 64.17            # BK7
V_D = 0.5876 / (0.4861 - 0.6563)    # -3.452
F_TARGET = 80.0


def beams(n=2000):
    key = jax.random.PRNGKey(0)
    return [CollimatedDisk.make(radius=jnp.float32(4.0),
                                translation=[0, 0, -10.0],
                                wavelength=lam).sample(key, n)
            for lam in LAMS]


def chromatic_shift(scene, p, key):
    """Marginal-ray axis crossings at F and C."""
    zs = []
    for lam in (0.4861, 0.6563):
        r = CollimatedDisk.make(radius=jnp.float32(1.0),
                                translation=[0, 0, -10.0],
                                wavelength=lam).sample(jax.random.PRNGKey(1),
                                                       64)
        out, _, _ = scene.simulate(p, r, key)
        t = -out.px / out.dx * out.dz
        zs.append(float(jnp.median(out.pz + t)))
    return zs[0] - zs[1]


def main():
    key = jax.random.PRNGKey(0)
    c0 = 1.0 / (2 * (N_D - 1) * F_TARGET)

    # --- baseline: bare BK7 singlet --------------------------------------
    bare = SequentialScene([
        SingletLens(c1=c0, c2=-c0, d=16.0, t=1.0, ior_glass=N_D,
                    abbe_vd=V_R, name='lens'),
        SensorElement(radius=10.0, translation=[0, 0, F_TARGET], name='s')])
    shift0 = chromatic_shift(bare, bare.init_params(), key)
    print(f'bare singlet: z_F - z_C = {shift0 * 1e3:+.0f} um '
          f'(thin-lens f/V = {F_TARGET / V_R * 1e3:.0f} um)')

    # --- hybrid: singlet + weak DOE, both trainable ----------------------
    hybrid = SequentialScene([
        SingletLens(c1=c0, c2=-c0, d=16.0, t=1.0, ior_glass=N_D,
                    abbe_vd=V_R, c1_grad=True, c2_grad=True, name='lens'),
        DiffractiveLens(radius=8.0, f=5000.0, phase_grad=True,
                        translation=[0, 0, 2.0], name='doe'),
        SensorElement(radius=10.0, translation=[0, 0, F_TARGET], name='s')])
    p = hybrid.init_params()
    rays3 = beams()

    def loss(p):
        tot = 0.0
        for r in rays3:
            _, sens, _ = hybrid.simulate(p, r, key)
            tot = tot + sens.spot_rms(0)[0] ** 2
        return tot / len(rays3)

    p, hist = fit(loss, p, trainable=hybrid.trainable(), steps=600,
                  lr=3e-2, scales={'lens': {'c1': c0, 'c2': c0},
                                   'doe': {'phase': 0.2}})
    rms0, rms1 = math.sqrt(float(hist[0])), math.sqrt(float(hist[-1]))
    shift1 = chromatic_shift(hybrid, p, key)
    print(f'hybrid after fit: poly spot rms {rms0 * 1e3:.0f} -> '
          f'{rms1 * 1e3:.1f} um, z_F - z_C = {shift1 * 1e3:+.1f} um '
          f'({abs(shift0 / shift1):.0f}x smaller)')
    assert abs(shift1) < abs(shift0) / 15

    # --- compare with the closed-form power split ------------------------
    P = 1.0 / F_TARGET
    P_d_analytic = P * V_D / (V_D - V_R)
    c1_doe = float(np.asarray(p['doe']['phase'])[0])
    P_d_fit = -2.0 * 0.5876e-3 * c1_doe
    print(f'fitted DOE power {P_d_fit:.5f} /mm vs thin-lens split '
          f'{P_d_analytic:.5f} /mm '
          f'({100 * abs(P_d_fit - P_d_analytic) / P_d_analytic:.1f}% off '
          f'— the fit also absorbs the real lens thickness)')
    assert abs(P_d_fit - P_d_analytic) / P_d_analytic < 0.25


if __name__ == '__main__':
    main()
