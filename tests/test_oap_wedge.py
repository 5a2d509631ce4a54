"""Off-axis parabola + wedge prism — real implementations of two reference
stubs (elements/mirror.py:167, geom/primitives.py:500)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (ParabolicMirrorOffAxis, Rays, Scene,
                               SequentialScene, WedgePrism)


def test_oap_focuses_at_parent_focus(key):
    """Rays parallel to the parent axis through the off-axis segment all
    pass through the parent focus — exactly (a parabola property)."""
    c, off = -0.01, 30.0          # f_parent = 1/(2|c|) = 50
    scene = Scene([ParabolicMirrorOffAxis(
        c1=c, d=15.0, off_axis=off, translation=[0, 0, 80.0], name='oap')],
        n_bounces=2)
    p = scene.init_params()
    heights = jnp.array([24.0, 28.0, 30.0, 33.0, 36.0])
    rays = Rays.create(
        jnp.stack([jnp.zeros(5), heights, jnp.zeros(5)], axis=1),
        jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1)))
    out, _, _ = scene.simulate(p, rays, key)
    # parent focus: on the axis at z = 80 + 1/(2c) = 80 - 50 = 30
    focus = np.array([0.0, 0.0, 30.0])
    for i in range(5):
        o = np.asarray(out.pos[i])
        d = np.asarray(out.dir[i])
        t = np.dot(focus - o, d)
        miss = np.linalg.norm(o + t * d - focus)
        assert miss < 1e-3, f"ray {i} misses parent focus by {miss}"
    # Off-axis rays outside the segment aperture fly by untouched
    far = Rays.create([[0.0, 5.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, far, key)
    np.testing.assert_allclose(np.asarray(out.dir[0]), [0, 0, 1], atol=1e-6)


def test_wedge_small_angle_deviation(key):
    """Beam deviation = (n-1) * alpha for a thin wedge."""
    alpha, n = 0.05, 1.5168
    scene = SequentialScene([WedgePrism(
        wedge_angle=alpha, d=20.0, t=3.0, ior_glass=n, name='wedge')])
    p = scene.init_params()
    rays = Rays.create([[0.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = scene.simulate(p, rays, key)
    dev = float(jnp.arctan2(jnp.abs(out.dir[0, 1]), out.dir[0, 2]))
    np.testing.assert_allclose(dev, (n - 1) * alpha, rtol=5e-3)


def test_wedge_angle_gradient(key):
    scene = SequentialScene([WedgePrism(
        wedge_angle=0.05, d=20.0, t=3.0, ior_glass=1.5,
        wedge_angle_grad=True, name='wedge')])
    p = scene.init_params()

    def deviation(pp):
        r = Rays.create([[0.0, 0.0, -10.0]], [[0.0, 0.0, 1.0]])
        out, _, _ = scene.simulate(pp, r, key)
        return out.dir[0, 1]

    g = float(jax.grad(deviation)(p)['wedge']['wedge_angle'])
    # d(deviation_y)/d(alpha) ~ -(n-1) (deviation toward -y for +alpha tilt)
    assert abs(abs(g) - 0.5) < 0.1
