"""GRIN rod design: a SELFOC endoscope relay, then a gradient-designed
working distance.

Demonstrates ``GrinRod`` (PhysKind.GRIN — fixed-step RK4 through
n^2 = n0^2 (1 - A r^2), core/grin.py):

1. A quarter-pitch rod focuses collimated light on its exit face; two
   half-pitch rods in series relay an off-axis point 1:1 (the
   endoscope stack).
2. Design by gradient: given a fixed rod length, find the profile
   constant A that puts the focus at a requested working distance
   BEHIND the rod — jax.grad through the RK4 scan.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import GrinRod, SensorElement, SequentialScene
from raytracetorch_tpu.rays.ray import Rays

A0 = 0.01                       # 1/mm^2; quarter pitch = 15.7 mm


def collimated(x0s):
    x0s = jnp.asarray(x0s, jnp.float32)
    z = jnp.full_like(x0s, -3.0)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (x0s.shape[0], 3))
    return Rays.create(jnp.stack([x0s, jnp.zeros_like(x0s), z], -1), d)


def point_source(x_src, thetas):
    thetas = jnp.asarray(thetas, jnp.float32)
    pos = jnp.broadcast_to(jnp.array([x_src, 0.0, -0.001]),
                           (thetas.shape[0], 3))
    d = jnp.stack([jnp.sin(thetas), jnp.zeros_like(thetas),
                   jnp.cos(thetas)], -1)
    return Rays.create(pos, d)


def main():
    key = jax.random.PRNGKey(0)
    Lq = math.pi / (2 * math.sqrt(A0))

    # --- 1a. quarter-pitch focus ---------------------------------------
    sc = SequentialScene([
        GrinRod(radius=5.0, thickness=Lq, n0=1.6, grin_A=A0,
                translation=[0, 0, Lq / 2], name='rod'),
        SensorElement(radius=2.0, translation=[0, 0, Lq + 1e-3],
                      name='s')])
    x0 = jnp.linspace(-0.5, 0.5, 101)
    _, sens, _ = sc.simulate(sc.init_params(), collimated(x0), key)
    print(f'quarter-pitch rod: collimated -> exit-face focus, '
          f'spot rms {float(sens.spot_rms(0)[0]) * 1e3:.3f} um')
    assert float(sens.spot_rms(0)[0]) < 5e-4

    # --- 1b. endoscope relay: two half-pitch rods image 1:1 -------------
    # (a small air gap separates the rods — coincident faces would be
    # rejected as self-intersections, CLAUDE.md / INTERSECT_EPS)
    Lh, gap = 2 * Lq, 0.05
    relay = SequentialScene([
        GrinRod(radius=5.0, thickness=Lh, n0=1.6, grin_A=A0,
                translation=[0, 0, Lh / 2], name='r1'),
        GrinRod(radius=5.0, thickness=Lh, n0=1.6, grin_A=A0,
                translation=[0, 0, 1.5 * Lh + gap], name='r2'),
        SensorElement(radius=5.0, translation=[0, 0, 2 * Lh + 2 * gap],
                      name='s')])
    x_src = 1.2
    _, sens2, _ = relay.simulate(relay.init_params(),
                                 point_source(x_src,
                                              np.linspace(-0.05, 0.05,
                                                          101)),
                                 key)
    cx = float(np.asarray(sens2.centroid(0))[0][0])
    print(f'two half-pitch rods: point at x={x_src} relays to '
          f'x={cx:+.4f} (erect 1:1), spot rms '
          f'{float(sens2.spot_rms(0)[0]) * 1e3:.1f} um '
          f'(real GRIN aberration of the exact profile, not RK4 error)')
    assert abs(cx - x_src) < 5e-3

    # --- 2. design A for a working distance ----------------------------
    # Fixed 12 mm rod; want the focus 8 mm behind the exit face.
    L, wd = 12.0, 8.0
    sc3 = SequentialScene([
        GrinRod(radius=5.0, thickness=L, n0=1.6, grin_A=0.008,
                grin_A_grad=True, translation=[0, 0, L / 2], name='rod'),
        SensorElement(radius=5.0, translation=[0, 0, L + wd], name='s')])
    p = sc3.init_params()
    rays = collimated(jnp.linspace(-0.8, 0.8, 256))

    def loss(p):
        _, sens, _ = sc3.simulate(p, rays, key)
        return sens.spot_rms(0)[0] ** 2

    from raytracetorch_tpu import fit
    # adam on A/scale with scale = the parameter's own magnitude
    p, hist = fit(loss, p, trainable=sc3.trainable(), steps=400, lr=2e-2,
                  scales={'rod': {'grin_A': 0.005}})
    A_fit = float(p['rod']['grin_A'])
    # paraxial check: focus distance behind a rod of length L is
    # wd = pz cot-like expression; verify by the residual spot instead
    rms = math.sqrt(float(loss(p)))
    print(f'designed A = {A_fit:.6f} 1/mm^2 for wd = {wd} mm: '
          f'spot rms {rms * 1e3:.3f} um')
    assert rms < 2e-3

    # closed-form cross-check: exit ray of height ~0 slope from
    # x0: x(L) = x0 cos(gL), slope u = -x0 g sin(gL) (paraxial, n0 g);
    # focus where x + u_air * wd = 0 -> wd = cos(gL)/(n0 g sin(gL))
    gA = math.sqrt(A_fit)
    wd_analytic = math.cos(gA * L) / (1.6 * gA * math.sin(gA * L))
    print(f'paraxial wd of the fitted A: {wd_analytic:.3f} mm '
          f'(target {wd})')
    assert abs(wd_analytic - wd) < 0.05


if __name__ == '__main__':
    main()
