"""Cassegrain / Ritchey-Chretien telescope: conic mirrors end to end.

Two-mirror telescopes live on GENERAL conics (round-4 ConicMirror):

  1. CLASSICAL CASSEGRAIN — parabolic primary (k = -1) + hyperbolic
     secondary whose conic k2 = -((m+1)/(m-1))^2 makes the on-axis
     image STIGMATIC (the hyperboloid's two foci are the prime focus
     and the back focus).  Built from the analytic prescription and
     verified: the annular beam focuses to a sub-micron spot.
  2. OFF-AXIS COMA — classical Cassegrains obey the Abbe sine condition
     only approximately; a field scan shows the linear-in-field coma.
  3. RITCHEY-CHRETIEN — jax.grad re-optimizes BOTH conic constants
     against a two-field spot merit (the aplanatic RC solution): coma
     drops by an order of magnitude at the same focal length, exactly
     why research telescopes (HST, VLT, ...) are RCs.
  4. .ZMX ROUND TRIP — the same prescription imports from Zemax text
     (utils/zemax.py handles CONI + MIRROR with parity bookkeeping).

The torch reference cannot express either mirror (its elements/mirror.py
has only k = 0 and k = -1 — reference elements/mirror.py:91-123).

Run: python examples/29_cassegrain_telescope.py [--cpu]   (~2 min CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (ConicMirror, ParabolicMirror, Rays,
                               SensorElement, SequentialScene, fit)

# -- analytic classical-Cassegrain prescription ---------------------------
F1, SEP, MAG = 50.0, 40.0, 5.0          # primary f, mirror gap, secondary m
A = F1 - SEP                            # secondary-to-prime-focus
B = MAG * A                             # secondary-to-image
C2 = 1.0 / (2.0 / (1.0 / B - 1.0 / A))  # mirror equation -> R2 = -25
K2 = -((MAG + 1.0) / (MAG - 1.0)) ** 2  # stigmatic conic = -2.25
Z_P, Z_S = 100.0, 100.0 - SEP
Z_IMG = Z_S + B


def scene(k1=-1.0, k2=K2):
    return SequentialScene([
        ConicMirror(c1=-1.0 / (2 * F1), k=k1, d=60.0, k_grad=True,
                    translation=[0, 0, Z_P], name='primary'),
        ConicMirror(c1=C2, k=k2, d=16.0, k_grad=True,
                    translation=[0, 0, Z_S], name='secondary'),
        SensorElement(radius=5.0, translation=[0, 0, Z_IMG], name='img')])


def annulus(field_x=0.0, n_az=24, radii=(15.0, 20.0, 25.0)):
    """Collimated beam at field angle ``field_x`` (rad, about y)."""
    xs, ys = [], []
    for r in radii:
        for a in np.linspace(0, 2 * np.pi, n_az, endpoint=False):
            xs.append(r * np.cos(a)), ys.append(r * np.sin(a))
    xs = np.asarray(xs)
    pos = np.stack([xs, ys, np.zeros_like(xs)], -1)
    d = np.tile([np.sin(field_x), 0.0, np.cos(field_x)], (len(xs), 1))
    # back-project so all fields share the entrance plane
    return Rays.create(pos - 40.0 * d, d)


key = jax.random.PRNGKey(0)
sc = scene()
p0 = sc.init_params()

out, sens, _ = sc.simulate(p0, annulus(), key)
rms0 = float(sens.spot_rms(0)[0])
print(f'1. classical Cassegrain on-axis: EFL = {MAG * F1:.0f} mm, '
      f'spot RMS = {rms0:.2e} mm  (stigmatic)')
assert rms0 < 1e-3

FIELD = 0.004                            # 0.23 deg
_, s_f, _ = sc.simulate(p0, annulus(FIELD), key)
rms_f = float(s_f.spot_rms(0)[0])
print(f'2. at {FIELD * 1e3:.1f} mrad field: spot RMS = {rms_f * 1e3:.2f} um '
      f'(coma)')


def merit(p):
    _, s_on, _ = sc.simulate(p, annulus(), key)
    _, s_off, _ = sc.simulate(p, annulus(FIELD), key)
    return s_on.spot_rms(0)[0] ** 2 + s_off.spot_rms(0)[0] ** 2


p_rc, hist = fit(merit, p0, trainable=sc.trainable(), steps=200, lr=3e-3)
_, s_rc, _ = sc.simulate(p_rc, annulus(FIELD), key)
rms_rc = float(s_rc.spot_rms(0)[0])
k1_rc = float(p_rc['primary']['k'])
k2_rc = float(p_rc['secondary']['k'])
print(f'3. jax.grad over (k1, k2): {rms_f * 1e3:.2f} -> {rms_rc * 1e3:.2f} um '
      f'at field; k1 = {k1_rc:.4f} (< -1: RC primary), k2 = {k2_rc:.3f}')
assert rms_rc < 0.5 * rms_f

# 4. the same telescope arrives via the Zemax importer
from raytracetorch_tpu.utils.zemax import load_zmx

ZMX = f"""MODE SEQ
UNIT MM X W X CM MR CPMM
ENPD 50.0
SURF 0
  TYPE STANDARD
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV {-1.0 / (2 * F1)}
  CONI -1.0
  DISZ {-SEP}
  GLAS MIRROR
  DIAM 30.0 1 0 0 1 ""
SURF 2
  TYPE STANDARD
  CURV {C2}
  CONI {K2}
  DISZ {B}
  GLAS MIRROR
  DIAM 8.0 1 0 0 1 ""
SURF 3
  TYPE STANDARD
  DISZ 0.0
  DIAM 2.0 1 0 0 1 ""
"""
imp = load_zmx(ZMX)
_, s_z, _ = imp.scene.simulate(imp.scene.init_params(), annulus(), key)
# importer places surface 1 at z=0 (vs 100 here) — same optics
rms_z = float(s_z.spot_rms(0)[0])
print(f'4. .zmx import: {[type(e).__name__ for e in imp.elements]} '
      f'-> on-axis RMS {rms_z:.2e} mm')
assert rms_z < 1e-3

# 5. the SAME two-mirror layout as a physical-optics trace: the wave
#    layer unfolds both reflections and diffraction sets the spot.
#    (Scaled to the wave grid's sampling regime: a thin phase screen
#    needs >~2 samples per edge fringe, period lam*f1/r — the full
#    f/0.83 primary above would need a ~16k^2 grid.  Same physics.)
from raytracetorch_tpu.utils.beamprop import wave_trace

F1w, SEPw, MAGw = 40.0, 30.0, 4.0
Aw, Bw = F1w - SEPw, MAGw * (F1w - SEPw)
from raytracetorch_tpu import ConicMirror
wave_scene = SequentialScene([
    ConicMirror(c1=-1.0 / (2 * F1w), k=-1.0, d=6.0,
                translation=[0, 0, 40.0], name='primary'),
    ConicMirror(c1=(1.0 / Bw - 1.0 / Aw) / 2.0,
                k=-((MAGw + 1.0) / (MAGw - 1.0)) ** 2, d=3.0,
                translation=[0, 0, 10.0], name='secondary'),
    SensorElement(radius=2.0, translation=[0, 0, 10.0 + Bw], name='img')])
pw = wave_scene.init_params()
WLw = 0.5e-3
nw, dxw = 512, 0.008
axw = jnp.arange(nw) - nw // 2
r2w = (axw[:, None] * dxw) ** 2 + (axw[None, :] * dxw) ** 2
pupil = ((r2w <= 1.0) & (r2w >= 0.04)).astype(jnp.float32)  # annular
rw, iw, zw = wave_trace(wave_scene, pw, pupil, jnp.zeros_like(pupil),
                        dxw, WLw, z0=0.0)
Iw = np.asarray(rw) ** 2 + np.asarray(iw) ** 2
axn = np.asarray(axw) * dxw
rr = np.sqrt(axn[None, :] ** 2 + axn[:, None] ** 2)
r_airy = 1.22 * WLw * (MAGw * F1w) / 2.0   # EFL/(2*r_pupil) = f/80
ee = Iw[rr < 2 * r_airy].sum() / Iw.sum()
print(f'5. wave trace (f/80 scaled twin): image plane z = {float(zw):.0f}, '
      f'flux {Iw.sum() / float(jnp.sum(pupil)):.4f}, '
      f'EE(2 Airy radii) = {ee:.2f} — diffraction-limited, as the '
      f'stigmatic design promises')
assert ee > 0.7
print('done.')
