"""Deep optics: gradient descent over a pixelated phase plate.

`PhaseGridPlate` exposes a [H, W] phase map whose every pixel is a
traced parameter — the ray tracer becomes a differentiable layer and
the optic itself is the network.  This example learns a RING FORMER
(laser ring generator) from a zero phase map: the loss asks every ray
of a collimated beam to land on a radius-2 circle at the detector, and
adam sculpts the plate.

The learned solution is checked against the closed form: a ring former
is an AXICON, the conical phase phi(r) = a r with
a = r_ring / (L m lam_mm) cycles/mm — the learned map's radial slope
must match it.  The final irradiance image shows the ring.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, PhaseGridPlate,
                               SensorElement, SequentialScene, fit)

HX, L, R_RING, LAM = 4.0, 40.0, 2.0, 0.5876
N_GRID = 32


def main():
    key = jax.random.PRNGKey(0)
    sc = SequentialScene([
        PhaseGridPlate(half_x=HX, half_y=HX, shape=(N_GRID, N_GRID),
                       name='plate'),
        SensorElement(radius=10.0, translation=[0, 0, L], name='det')])
    rays = CollimatedDisk.make(radius=jnp.float32(3.0),
                               translation=[0, 0, -3.0],
                               wavelength=LAM).sample(key, 30_000)

    def loss(p):
        out, _, _ = sc.simulate(p, rays, key)
        r = jnp.sqrt(out.px ** 2 + out.py ** 2 + 1e-12)
        w = out.intensity
        return jnp.sum(w * (r - R_RING) ** 2) / jnp.maximum(jnp.sum(w),
                                                            1e-9)

    p0 = sc.init_params()
    print(f'initial ring residual rms: '
          f'{math.sqrt(float(loss(p0))) * 1e3:.0f} um')
    p, hist = fit(loss, p0, trainable=sc.trainable(), steps=800, lr=1.5)
    rms = math.sqrt(float(hist[-1]))
    print(f'learned plate: ring residual rms {rms * 1e3:.0f} um '
          f'({math.sqrt(float(hist[0])) / rms:.0f}x)')
    assert rms < 0.12

    # closed-form check: a ray entering at radius r must kick by
    # (R - r)/L, so the optimal radial phase slope is
    # dphi/dr = (R - r) / (L m lam_mm) — an axicon cone PLUS a focusing
    # parabola (a pure cone would be optimal only for a thin annular
    # beam).  Fit the learned map's radial slope against [1, r]:
    grid = np.asarray(p['plate']['grid'])
    xs = np.linspace(-HX, HX, N_GRID)
    X, Y = np.meshgrid(xs, xs, indexing='xy')
    rr = np.sqrt(X ** 2 + Y ** 2)
    gy, gx = np.gradient(grid, xs, xs)
    with np.errstate(invalid='ignore'):
        dphidr = (gx * X + gy * Y) / np.maximum(rr, 1e-9)
    lit = (rr > 0.8) & (rr < 2.8)           # annulus inside the beam
    A = np.stack([np.ones(lit.sum()), rr[lit]], -1)
    (alpha, beta), *_ = np.linalg.lstsq(A, dphidr[lit], rcond=None)
    k = 1.0 / (L * LAM * 1e-3)              # cycles/mm per mm of kick
    print(f'learned dphi/dr = {alpha:.1f} + {beta:.1f} r cycles/mm '
          f'(analytic {R_RING * k:.1f} - {k:.1f} r)')
    assert abs(alpha - R_RING * k) / (R_RING * k) < 0.15
    assert abs(beta + k) / k < 0.15

    # final irradiance: the ring
    sc.grid_shape = (96, 96)
    sc.grid_half_extent = 4.0
    _, sens, _ = sc.simulate(p, rays, key)
    img = np.asarray(sens.grid[0])
    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(9, 4))
        im0 = axes[0].imshow(grid, cmap='twilight',
                             extent=[-HX, HX, -HX, HX])
        axes[0].set_title('learned phase map (cycles)')
        fig.colorbar(im0, ax=axes[0])
        axes[1].imshow(img, origin='lower', cmap='magma',
                       extent=[-4, 4, -4, 4])
        axes[1].set_title('detector irradiance: the learned ring')
        fig.tight_layout()
        fig.savefig(os.path.join(os.path.dirname(__file__), 'output',
                                 '28_deep_optics.png'), dpi=110)
        print('wrote examples/output/28_deep_optics.png')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
