"""Freeform (XY-polynomial) surfaces: geom/surfaces.py ff_* + FreeformLens.

No reference counterpart — the reference's most general surface is the
STUBBED even asphere (reference geom/complex.py:6-10 raises).  Physics
checks are closed-form: a pure x² term is a cylinder lens of power
2·a·(n-1); a pure x term is a wedge of deviation (n-1)·a; zero terms
must reproduce the asphere bitwise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (AsphericLens, FreeformLens, SensorElement,
                               SequentialScene, WedgePrism)
from raytracetorch_tpu.rays.ray import Rays

N_GLASS = 1.5168


def _rays_line(n, axis='x', span=3.0, z0=-5.0):
    s = jnp.linspace(-span, span, n)
    zero = jnp.zeros((n,))
    x = s if axis == 'x' else zero
    y = s if axis == 'y' else zero
    return Rays.from_components(
        (x, y, jnp.full((n,), z0)), (zero, zero, jnp.ones((n,))),
        jnp.ones((n,)), jnp.zeros((n,), jnp.int32), zero)


def _scene(**ff_kw):
    return SequentialScene([
        FreeformLens(c1=0.0, c2=0.0, d=14.0, t=2.0, ior_glass=N_GLASS,
                     name='ff', **ff_kw),
        SensorElement(radius=20.0, translation=[0, 0, 60.0], name='sensor'),
    ])


def test_sag_exactness():
    # rays must land ON the polynomial surface: hit z == S(x, y)
    a = dict(xy1=[(2, 0, 0.02), (0, 2, -0.015), (3, 0, 1e-3), (2, 1, 5e-4)])
    scene = _scene(**a)
    p = scene.init_params()
    k = jax.random.PRNGKey(1)
    xy = jax.random.uniform(k, (2, 200), minval=-3.0, maxval=3.0)
    zero = jnp.zeros((200,))
    rays = Rays.from_components(
        (xy[0], xy[1], zero - 5.0), (zero, zero, jnp.ones((200,))),
        jnp.ones((200,)), jnp.zeros((200,), jnp.int32), zero)
    _, _, aux = scene.simulate(p, rays, k, record_hits=True)
    h = np.asarray(aux['hits'])[0]
    x, y = h[:, 0], h[:, 1]
    sag = (0.02 * x**2 - 0.015 * y**2 + 1e-3 * x**3 + 5e-4 * x**2 * y)
    assert np.abs(h[:, 2] - sag).max() < 1e-5


def test_cylinder_power():
    # front-face x^2 term a: thin-lens focal length 1/(2 a (n-1)) for
    # x-fans, NO power for y-fans (and vice versa for a (0,2) term)
    a = 0.01
    scene = _scene(xy1=[(2, 0, a)])
    p = scene.init_params()
    f_expect = 1.0 / (2.0 * a * (N_GLASS - 1.0))      # ~100.3 mm
    out, _, _ = scene.simulate(p, _rays_line(9, 'x'), jax.random.PRNGKey(0))
    x, dx = np.asarray(out.px), np.asarray(out.dx)
    dz = np.asarray(out.dz)
    z = np.asarray(out.pz)
    t_cross = -x / (dx / dz)
    zc = z + t_cross
    sel = np.abs(x) > 0.5
    assert np.allclose(zc[sel], f_expect, rtol=0.03)
    out_y, _, _ = scene.simulate(p, _rays_line(9, 'y'),
                                 jax.random.PRNGKey(0))
    assert np.abs(np.asarray(out_y.dy)).max() < 1e-6   # no y power


def test_linear_term_is_a_wedge():
    # z = alpha * x on one face of a plane plate == a wedge prism:
    # small-angle deviation (n - 1) * alpha, matching WedgePrism
    alpha = 0.05
    scene = _scene(xy1=[(1, 0, alpha)])
    p = scene.init_params()
    out, _, _ = scene.simulate(p, _rays_line(5, 'y', span=1.0),
                               jax.random.PRNGKey(0))
    dev = np.arctan2(np.asarray(out.dx), np.asarray(out.dz))
    assert np.allclose(np.abs(dev), (N_GLASS - 1.0) * alpha, rtol=0.02)
    # cross-check against the WedgePrism element (tilt about the other
    # axis: its wedge_angle tilts the exit face about x -> deviation in y)
    wedge = SequentialScene([
        WedgePrism(wedge_angle=alpha, d=14.0, t=2.0, ior_glass=N_GLASS,
                   name='w'),
        SensorElement(radius=20.0, translation=[0, 0, 60.0], name='s'),
    ])
    ow, _, _ = wedge.simulate(wedge.init_params(), _rays_line(5, 'x', 1.0),
                              jax.random.PRNGKey(0))
    dev_w = np.arctan2(np.asarray(ow.dy), np.asarray(ow.dz))
    assert np.allclose(np.abs(dev), np.abs(dev_w), rtol=0.02)


def test_empty_terms_reduce_to_asphere():
    kw = dict(c1=0.03, c2=-0.02, d=14.0, t=3.0, ior_glass=N_GLASS,
              k1=-0.5, a1=(1e-5, 2e-8))
    sa = SequentialScene([AsphericLens(name='l', **kw),
                          SensorElement(radius=20.0,
                                        translation=[0, 0, 40.0],
                                        name='s')])
    sf = SequentialScene([FreeformLens(name='l', **kw),
                          SensorElement(radius=20.0,
                                        translation=[0, 0, 40.0],
                                        name='s')])
    rays = _rays_line(33, 'x', span=5.0)
    k = jax.random.PRNGKey(0)
    oa, _, _ = sa.simulate(sa.init_params(), rays, k)
    of, _, _ = sf.simulate(sf.init_params(), rays, k)
    assert np.allclose(np.asarray(oa.px), np.asarray(of.px), atol=1e-6)
    assert np.allclose(np.asarray(oa.dx), np.asarray(of.dx), atol=1e-7)


def test_freeform_design_by_grad():
    # train the two quadratic coefficients to focus an astigmatic task:
    # x-fan and y-fan both onto the axis at the sensor — the optimizer
    # must find a(2,0) != a(0,2) compensating the built-in cylinder c2
    from raytracetorch_tpu import fit
    scene = SequentialScene([
        FreeformLens(c1=0.0, c2=0.0, d=14.0, t=2.0, ior_glass=N_GLASS,
                     xy1=[(2, 0, 0.004), (0, 2, 0.004)], xy1_grad=True,
                     name='ff'),
        SensorElement(radius=30.0, translation=[0, 0, 60.0], name='s'),
    ])
    p = scene.init_params()
    rx, ry = _rays_line(17, 'x'), _rays_line(17, 'y')
    key = jax.random.PRNGKey(0)

    def loss(p):
        ox, _, _ = scene.simulate(p, rx, key)
        oy, _, _ = scene.simulate(p, ry, key)
        tx = (60.0 - ox.pz) / ox.dz
        ty = (60.0 - oy.pz) / oy.dz
        return (jnp.mean((ox.px + tx * ox.dx) ** 2)
                + jnp.mean(2.0 * (oy.py + ty * oy.dy) ** 2))

    l0 = float(loss(p))
    p2, hist = fit(loss, p, trainable=scene.trainable(), steps=300,
                   lr=3e-4)
    lf = float(loss(p2))
    assert lf < l0 * 0.05, (l0, lf)
    a20, a02 = [float(v) for v in p2['ff']['xy1']]
    # both approach the focusing value 1/(2 (n-1) f) = 0.0161 for f = 60
    # (the different loss weights share the same minimizer)
    assert 0.014 < a20 < 0.018 and 0.014 < a02 < 0.018, (a20, a02)


def test_freeform_in_fused_kernel():
    # the fused sequential kernel reuses core/intersect.py, so freeform
    # rows ride in: parity vs the XLA driver (interpret mode on CPU)
    scene = _scene(xy1=[(2, 0, 0.01), (0, 2, -0.008), (3, 1, 2e-4)])
    p = scene.init_params()
    k = jax.random.PRNGKey(2)
    xy = jax.random.uniform(k, (2, 256), minval=-3.0, maxval=3.0)
    zero = jnp.zeros((256,))
    rays = Rays.from_components(
        (xy[0], xy[1], zero - 5.0), (zero, zero, jnp.ones((256,))),
        jnp.ones((256,)), jnp.zeros((256,), jnp.int32), zero)
    o1, _, _ = scene.simulate(p, rays, k)
    o2, _, _ = scene.simulate_fused(p, rays, k, block_rows=4)
    assert np.allclose(np.asarray(o1.px), np.asarray(o2.px), atol=1e-6)
    assert np.allclose(np.asarray(o1.intensity),
                       np.asarray(o2.intensity), atol=1e-6)


def test_bad_terms_raise():
    with pytest.raises(ValueError):
        FreeformLens(c1=0.0, c2=0.0, d=10.0, t=2.0, ior_glass=1.5,
                     xy1=[(0, 0, 1.0)])          # piston
    with pytest.raises(ValueError):
        FreeformLens(c1=0.0, c2=0.0, d=10.0, t=2.0, ior_glass=1.5,
                     xy1=[(2, 0, 1e-3)] * 33)    # > MAX_FF_TERMS
