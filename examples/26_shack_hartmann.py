"""Shack-Hartmann wavefront sensor: measure an unknown aberration from
microlens spot displacements and reconstruct its Zernike coefficients.

The full adaptive-optics measurement chain, traced end-to-end:

  aberrator (ZernikeLens plate with a hidden coma+astigmatism sag)
    -> MicrolensArray (one ideal lenslet per pitch cell)
    -> detector at the lenslet focal plane
    -> per-cell spot centroids -> slopes = displacement / f
    -> modal least squares on the Zernike slope basis

and the recovered coefficients are checked against the hidden plate
prescription.  Every stage is the real ray trace — no paraxial
shortcut — and the whole chain is differentiable (the MLA cell choice
is zero-gradient like any winner merge).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (MicrolensArray, SensorElement,
                               SequentialScene, ZernikeLens)
from raytracetorch_tpu.geom.zernike import noll_nm, zernike_xy_poly
from raytracetorch_tpu.rays.ray import Rays

PITCH, F_LENS = 0.8, 25.0
R_PUPIL = 4.0
N_GLASS = 1.5
# hidden aberration: Noll j=6 (astigmatism 0deg) + j=8 (coma y), sag um
HIDDEN = {6: 4e-4, 8: 3e-4}


def pupil_grid():
    """One ray bundle per lenslet cell: an 11x11 sub-grid per cell so
    each centroid is well sampled."""
    cells = np.arange(-4, 5) * PITCH         # 9x9 lenslets in the pupil
    sub = (np.arange(11) - 5) / 11.0 * PITCH * 0.8
    x = (cells[:, None] + sub[None, :]).reshape(-1)
    X, Y = np.meshgrid(x, x, indexing='ij')
    x, y = X.reshape(-1), Y.reshape(-1)
    keep = np.sqrt(x * x + y * y) <= R_PUPIL - PITCH
    x, y = x[keep], y[keep]
    pos = jnp.asarray(np.stack([x, y, np.full_like(x, -5.0)], -1),
                      jnp.float32)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), pos.shape)
    return Rays.create(pos, d), x, y


def main():
    key = jax.random.PRNGKey(0)
    rays, x0, y0 = pupil_grid()
    cells_x = PITCH * np.floor(x0 / PITCH + 0.5)
    cells_y = PITCH * np.floor(y0 / PITCH + 0.5)

    plate = ZernikeLens(c1=0.0, c2=0.0, d=2 * R_PUPIL + 2, t=1.0,
                        ior_glass=N_GLASS,
                        z1=sorted(HIDDEN.items()),
                        norm_radius=R_PUPIL, name='plate')
    sh = SequentialScene([
        plate,
        MicrolensArray(half_x=R_PUPIL, half_y=R_PUPIL, pitch=PITCH,
                       f=F_LENS, translation=[0, 0, 4.0], name='mla'),
        SensorElement(radius=2 * R_PUPIL, translation=[0, 0, 4.0 + F_LENS],
                      name='det')])
    out, _, _ = sh.simulate(sh.init_params(), rays, key)
    alive = np.asarray(out.intensity) > 0
    px, py = np.asarray(out.px), np.asarray(out.py)

    # per-cell centroids -> measured slopes
    cell_ids = {}
    for i in np.nonzero(alive)[0]:
        cell_ids.setdefault((cells_x[i], cells_y[i]), []).append(i)
    groups = sorted(cell_ids.items())
    centers = np.asarray([c for c, _ in groups])
    sx_m = [(px[idx].mean() - cx) / F_LENS for (cx, _), idx in groups]
    sy_m = [(py[idx].mean() - cy) / F_LENS for (_, cy), idx in groups]
    s_meas = np.concatenate([sx_m, sy_m])
    print(f'{len(centers)} lenslets sampled, max |slope| '
          f'{np.abs(s_meas).max() * 1e3:.3f} mrad')

    # Modal least squares.  A thin plate deflects each ray by
    # -(n-1) grad(S) (prism toward the base), so the slope basis is
    # -(n-1)/R * dZ/d(x/R) — evaluated at every SUB-RAY and averaged
    # per cell, the SAME operator the centroid measurement applies
    # (skipping that average biases curvature modes like coma by the
    # intra-cell slope variation).
    js = sorted(HIDDEN) + [4, 7, 11]       # fit extra modes as controls
    u, v = x0 / R_PUPIL, y0 / R_PUPIL
    cols = []
    for j in js:
        n_, m_ = noll_nm(j)
        poly = zernike_xy_poly(n_, m_)     # {(i, k): coeff} monomials
        dzdx = np.zeros_like(u)
        dzdy = np.zeros_like(u)
        for (i, k), c in poly.items():
            c = float(c)                   # exact-rational -> float
            if i > 0:
                dzdx += c * i * u ** (i - 1) * v ** k
            if k > 0:
                dzdy += c * k * u ** i * v ** (k - 1)
        scale = -(N_GLASS - 1.0) / R_PUPIL
        cols.append(np.concatenate(
            [[dzdx[idx].mean() * scale for _, idx in groups],
             [dzdy[idx].mean() * scale for _, idx in groups]]))
    Amat = np.stack(cols, -1)
    coef, *_ = np.linalg.lstsq(Amat, s_meas, rcond=None)

    print('mode  injected   recovered')
    for j, c in zip(js, coef):
        print(f'  Z{j}   {HIDDEN.get(j, 0.0) * 1e3:8.3f}   {c * 1e3:8.3f}'
              '  (x 1e-3)')
    for j, c in zip(js, coef):
        np.testing.assert_allclose(c, HIDDEN.get(j, 0.0), atol=3e-5)
    print('Shack-Hartmann reconstruction matches the hidden plate '
          'prescription')


if __name__ == '__main__':
    main()
