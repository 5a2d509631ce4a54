"""Microlens array (PhysKind.MLA): exact per-cell thin-lens mapping,
Shack-Hartmann spot displacement, gradients, fused parity, guards.

The slope map is exact by construction: a ray hitting cell center xc
with slope s exits with slope s - (x - xc)/f, so at the lenslet focal
plane EVERY ray of a collimated beam lands exactly on its cell center,
and a beam tilted by theta lands exactly f*tan(theta) off the centers
— the Shack-Hartmann measurement equation with zero approximation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, MicrolensArray,
                               SensorElement, SequentialScene)
from raytracetorch_tpu.rays.ray import Rays

PITCH, F = 1.0, 20.0


def _sc(**kw):
    return SequentialScene([
        MicrolensArray(half_x=5.0, half_y=5.0, pitch=PITCH, f=F,
                       name='mla', **kw),
        SensorElement(radius=20.0, translation=[0, 0, F], name='s')])


def _beam(xs, ys, sx=0.0, sy=0.0):
    xs = jnp.asarray(xs, jnp.float32)
    ys = jnp.asarray(ys, jnp.float32)
    z = jnp.full_like(xs, -4.0)
    n = 1.0 / math.sqrt(1.0 + sx * sx + sy * sy)
    d = jnp.broadcast_to(jnp.array([sx * n, sy * n, n]), (xs.shape[0], 3))
    return Rays.create(jnp.stack([xs - 4.0 * sx, ys - 4.0 * sy, z], -1),
                       d)      # positions chosen to hit (xs, ys) at z=0


def test_mla_exact_cell_focus(key):
    """Every collimated ray lands EXACTLY on its cell center at z=f."""
    xs = np.asarray([0.1, 0.44, -0.44, 1.2, 2.49, -3.3, 0.0])
    ys = np.asarray([0.0, 0.2, -1.4, 2.1, -0.3, 1.9, 3.49])
    out, _, _ = _sc().simulate(_sc().init_params(), _beam(xs, ys), key)
    xc = PITCH * np.floor(xs / PITCH + 0.5)
    yc = PITCH * np.floor(ys / PITCH + 0.5)
    np.testing.assert_allclose(np.asarray(out.px), xc, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.py), yc, atol=2e-6)


def test_shack_hartmann_displacement(key):
    """A beam tilted by slope s lands exactly f*s off the cell centers
    (per-cell wavefront-slope measurement)."""
    sx, sy = 0.012, -0.007
    xs = np.asarray([0.2, 1.1, -2.3])
    ys = np.asarray([0.3, -0.9, 1.8])
    out, _, _ = _sc().simulate(_sc().init_params(),
                               _beam(xs, ys, sx, sy), key)
    xc = PITCH * np.floor(xs / PITCH + 0.5)
    yc = PITCH * np.floor(ys / PITCH + 0.5)
    np.testing.assert_allclose(np.asarray(out.px), xc + F * sx, atol=3e-6)
    np.testing.assert_allclose(np.asarray(out.py), yc + F * sy, atol=3e-6)


def test_mla_f_gradient(key):
    """d(spot x)/d(f) = tilt slope, exactly."""
    sx = 0.015
    sc = _sc(f_grad=True)
    rays = _beam([0.2], [0.0], sx=sx)

    def spot_x(p):
        out, _, _ = sc.simulate(p, rays, key)
        return out.px[0]

    # spot = xc + f_sensor... the sensor sits at the INIT f; moving the
    # lenslet f changes the exit slope: x(F) = x0 + F*(s - (x0-xc)/f);
    # d/df = F (x0 - xc) / f^2 at f = F
    g = float(jax.grad(spot_x)(sc.init_params())['mla']['f'])
    x0 = 0.2 + (-4.0 * sx + 4.0 * sx)   # hits at 0.2 by construction
    assert g == pytest.approx((x0 - 0.0) / F, rel=1e-3)


def test_mla_fused_parity(key):
    sc = _sc()
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -5.0]).sample(key, 513)
    out_x, sens_x, _ = sc.simulate(p, rays, key)
    out_f, sens_f, _ = sc.simulate_fused(p, rays, key, block_rows=4)
    np.testing.assert_allclose(np.asarray(out_f.pos),
                               np.asarray(out_x.pos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)


def test_mla_guards():
    with pytest.raises(ValueError, match='pitch'):
        MicrolensArray(half_x=5.0, half_y=5.0, pitch=0.0, f=10.0)
    with pytest.raises(ValueError):
        MicrolensArray(half_x=5.0, half_y=5.0, pitch=1.0, f=0.0)


def test_mla_nonseq_fused_parity(key):
    """MLA rows in the fused non-sequential kernel."""
    from raytracetorch_tpu import Scene
    sc = Scene([
        MicrolensArray(half_x=5.0, half_y=5.0, pitch=PITCH, f=F,
                       translation=[0, 0, 10.0], name='mla'),
        SensorElement(radius=20.0, translation=[0, 0, 10.0 + F],
                      name='s'),
    ], n_bounces=3)
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -5.0]).sample(key, 700)
    out_x, sens_x, _ = sc.simulate(p, rays, key)
    out_f, sens_f, _ = sc.simulate_fused(p, rays, key, block_rows=4)
    np.testing.assert_allclose(np.asarray(out_f.pos),
                               np.asarray(out_x.pos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)
