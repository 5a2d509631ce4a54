"""ElementCustom + shape part builders: cones, single cones, custom mirrors
(the reference's arbitrary Shape x SurfaceFunction composition,
elements/parent.py:73-81)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import ElementCustom, Rays, Scene
from raytracetorch_tpu.constants import PhysKind
from raytracetorch_tpu.elements import shapes


def test_single_cone_reflector(key):
    """45-degree axicon mirror (slope=1): an on-axis-parallel ray at height y
    reflects by 90 degrees."""
    el = ElementCustom(shapes.single_cone, 1, PhysKind.REFLECT,
                       extra={'slope': 1.0}, translation=[0.0, 0.0, 10.0],
                       name='axicon')
    scene = Scene([el], n_bounces=1)
    p = scene.init_params()
    rays = Rays.create([[0.0, 2.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    # Cone surface z = |r| (upper nappe, a funnel opening along +z): the
    # ray approaches the wall from outside (y > r_cone below the hit) and a
    # 45-degree wall deflects it 90 degrees outward, along +y
    np.testing.assert_allclose(np.asarray(out.pos[0]), [0.0, 2.0, 12.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dir[0]), [0.0, 1.0, 0.0],
                               atol=1e-5)


def test_single_cone_nappe_filter(key):
    """The lower nappe (z < 0 for slope > 0) must not intersect."""
    el = ElementCustom(shapes.single_cone, 1, PhysKind.REFLECT,
                       extra={'slope': 1.0}, translation=[0.0, 0.0, 10.0],
                       name='axicon')
    scene = Scene([el], n_bounces=1)
    p = scene.init_params()
    # This ray would hit the double cone at z = 10 - 2 (lower nappe)
    rays = Rays.create([[0.0, 2.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    assert float(out.pos[0, 2]) > 11.0   # skipped the lower-nappe hit


def test_sphere_shell_block(key):
    el = ElementCustom(shapes.sphere, 1, PhysKind.BLOCK,
                       extra={'radius': 3.0}, translation=[0.0, 0.0, 20.0],
                       name='ball')
    scene = Scene([el], n_bounces=1)
    p = scene.init_params()
    hit = Rays.create([[0.0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    graze = Rays.create([[0.0, 5.0, 0.0]], [[0.0, 0.0, 1.0]])
    oh, _, _ = scene.simulate(p, hit, key)
    og, _, _ = scene.simulate(p, graze, key)
    np.testing.assert_allclose(np.asarray(oh.pos[0]), [0.0, 0.0, 17.0],
                               atol=1e-5)
    assert float(oh.intensity[0]) == 0.0
    assert float(og.intensity[0]) == 1.0   # missed


def test_custom_param_trainability(key):
    el = ElementCustom(shapes.quadric, 1, PhysKind.REFLECT,
                       extra={'c': -0.02, 'k': -1.0},
                       extra_grad={'c': True},
                       translation=[0.0, 0.0, 50.0], name='pm')
    scene = Scene([el], n_bounces=1)
    p = scene.init_params()
    tr = scene.trainable()
    assert tr['pm']['c'] is True and tr['pm']['k'] is False

    def loss(pp):
        rays = Rays.create([[0.0, 3.0, 0.0]], [[0.0, 0.0, 1.0]])
        out, _, _ = scene.simulate(pp, rays, key)
        return out.dir[0, 1] ** 2

    g = jax.grad(loss)(p)
    assert np.isfinite(float(g['pm']['c'])) and float(g['pm']['c']) != 0.0
