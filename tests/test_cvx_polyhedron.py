"""CvxPolyhedronElement: arbitrary-half-space convex solids
(reference geom/shape.py:104-132 ``CvxPolyhedron`` with the self-exempt
inBounds; VERDICT round-1 missing #3)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (BoxElement, CollimatedDisk,
                               CvxPolyhedronElement, Rays, Scene,
                               SensorElement)

BOX_NORMALS = [(0, 0, 1), (0, 0, -1), (1, 0, 0), (-1, 0, 0),
               (0, 1, 0), (0, -1, 0)]


def test_box_equivalence(key):
    """A box stated as 6 generic half-spaces traces identically to
    BoxElement."""
    el_box = BoxElement(length=2.0, width=3.0, height=4.0, name='b',
                        translation=[0.0, 0.0, 5.0])
    el_cvx = CvxPolyhedronElement(
        BOX_NORMALS, [1.0, 1.0, 1.5, 1.5, 2.0, 2.0], name='b',
        translation=[0.0, 0.0, 5.0])
    rays = CollimatedDisk.make(radius=jnp.float32(1.8)).sample(key, 512)
    outs = []
    for el in (el_box, el_cvx):
        scene = Scene([el], n_bounces=2)
        out, _, _ = scene.simulate(scene.init_params(), rays, key)
        outs.append(out)
    np.testing.assert_allclose(np.asarray(outs[0].pos),
                               np.asarray(outs[1].pos), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(outs[0].intensity),
                                  np.asarray(outs[1].intensity))


def test_non_unit_normals_normalized(key):
    """Offsets are rescaled when normals are not unit length."""
    el = CvxPolyhedronElement(
        [(0, 0, 2), (0, 0, -2), (3, 0, 0), (-3, 0, 0), (0, 1, 0),
         (0, -1, 0)],
        [2.0, 2.0, 4.5, 4.5, 2.0, 2.0], name='b')  # => unit box 2x3x4 /2
    p = el.init_params()
    np.testing.assert_allclose(np.asarray(p['offsets']),
                               [1.0, 1.0, 1.5, 1.5, 2.0, 2.0], atol=1e-7)


def test_wedge_prism_refraction(key):
    """A glass wedge built from 7 arbitrary half-spaces deviates a normal-
    incidence ray by asin(n sin a) - a (exact thick-wedge formula; cf. the
    WedgePrism element test)."""
    alpha, n_g, t = 0.2, 1.5, 2.0
    sa, ca = math.sin(alpha), math.cos(alpha)
    prism = CvxPolyhedronElement(
        normals=[(0, 0, -1),            # entrance plane z >= 0
                 (sa, 0, ca),           # tilted exit face
                 (0, 1, 0), (0, -1, 0),
                 (1, 0, 0), (-1, 0, 0)],
        offsets=[0.0, t, 5.0, 5.0, 8.0, 8.0],
        ior_glass=n_g, name='wedge')
    scene = Scene([prism,
                   SensorElement(radius=50.0, translation=[0, 0, 30.0],
                                 name='s')], n_bounces=4)
    p = scene.init_params()
    rays = Rays.create([[0.0, 0.0, -5.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)

    delta = math.asin(n_g * sa) - alpha
    d = np.asarray(out.dir)[0]
    assert d[1] == pytest.approx(0.0, abs=1e-6)
    assert d[0] == pytest.approx(-math.sin(delta), abs=1e-5)
    assert d[2] == pytest.approx(math.cos(delta), abs=1e-5)
    assert float(out.intensity[0]) == 1.0


def test_offsets_differentiable(key):
    """Gradients flow through the half-space offsets (they set both the
    face positions and the bound checks)."""
    el = CvxPolyhedronElement(BOX_NORMALS, [1.0, 1.0, 1.5, 1.5, 2.0, 2.0],
                              ior_glass=1.5, offsets_grad=True, name='b',
                              translation=[0.0, 0.0, 5.0])
    scene = Scene([el, SensorElement(radius=50.0,
                                     translation=[0, 0, 20.0], name='s')],
                  n_bounces=4)
    rays = CollimatedDisk.make(radius=jnp.float32(0.8)).sample(key, 128)

    def loss(p):
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.spot_rms(0)[0]

    g = jax.grad(loss)(scene.init_params())
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)


def test_ctor_validation():
    with pytest.raises(ValueError, match='at least 3'):
        CvxPolyhedronElement([(0, 0, 1), (0, 0, -1)], [1.0, 1.0])
    with pytest.raises(ValueError, match='at most'):
        n = 11
        CvxPolyhedronElement([(math.cos(i), math.sin(i), 0.3)
                              for i in range(n)], [1.0] * n)
    with pytest.raises(ValueError, match='offsets must match'):
        CvxPolyhedronElement(BOX_NORMALS, [1.0])
    with pytest.raises(ValueError, match='zero-length'):
        CvxPolyhedronElement([(0, 0, 0), (0, 0, -1), (1, 0, 0)],
                             [1.0, 1.0, 1.0])
