"""Analytic unit tests of the unified surface solver and transforms.

Ports the closed-form optics checks of the reference's
``tests/test_primitive.py`` (hit points satisfy both the ray equation and the
implicit surface equation; analytic translation gradients) onto the unified
quadric representation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu.geom import surfaces as S
from raytracetorch_tpu.geom import vec3 as v3
from raytracetorch_tpu.geom.transform import Frame, compose, rodrigues
from raytracetorch_tpu.constants import BIG


def _solve_min_positive(q, o, d):
    roots = S.solve_roots(q, v3.from_array(o), v3.from_array(d))
    return S.min_positive(roots)


def _ray_batch():
    o = jnp.array([
        [0.0, 0.0, -10.0],
        [1.0, 2.0, -5.0],
        [-3.0, 0.5, -20.0],
        [0.0, 4.0, -7.0],
    ])
    d = jnp.array([
        [0.0, 0.0, 1.0],
        [0.1, -0.05, 1.0],
        [0.2, 0.0, 1.0],
        [-0.3, -0.2, 1.0],
    ])
    d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
    return o, d


@pytest.mark.parametrize('maker,args,F', [
    (S.q_plane, (), lambda p: p[..., 2]),
    (S.q_sphere, (jnp.float32(6.0),),
     lambda p: jnp.sum(p * p, axis=-1) - 36.0),
    (S.q_cylinder, (jnp.float32(5.0),),
     lambda p: p[..., 0] ** 2 + p[..., 1] ** 2 - 25.0),
    (S.q_quadric, (jnp.float32(0.05), jnp.float32(0.0)),
     lambda p: 0.05 * (p[..., 0] ** 2 + p[..., 1] ** 2)
     + 0.05 * p[..., 2] ** 2 - 2 * p[..., 2]),
    (S.q_quadric_zy, (jnp.float32(0.05), jnp.float32(-1.0)),
     lambda p: 0.05 * p[..., 1] ** 2 - 2 * p[..., 2]),
    (S.q_cone, (jnp.float32(0.5),),
     lambda p: p[..., 2] ** 2 - 0.25 * (p[..., 0] ** 2 + p[..., 1] ** 2)),
])
def test_hit_on_surface(maker, args, F):
    """Accepted hits satisfy the implicit equation F(o + t d) = 0
    (reference tests/test_primitive.py:150-161)."""
    o, d = _ray_batch()
    q, _ = maker(*args)
    t, valid = _solve_min_positive(q, o, d)
    assert bool(jnp.any(valid)), "expected at least one hit"
    hit = o + t[:, None] * d
    res = F(hit)
    np.testing.assert_allclose(np.where(valid, res, 0.0), 0.0, atol=5e-3)


def test_plane_exact_t():
    """Plane z=0: t = -oz/dz exactly (tests/test_primitive.py:23-38)."""
    o, d = _ray_batch()
    q, _ = S.q_plane()
    t, valid = _solve_min_positive(q, o, d)
    np.testing.assert_allclose(t, -o[:, 2] / d[:, 2], rtol=1e-5)
    assert bool(jnp.all(valid))


def test_sphere_miss_marked_invalid():
    q, _ = S.q_sphere(jnp.float32(1.0))
    o = jnp.array([[5.0, 5.0, -10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = _solve_min_positive(q, o, d)
    assert not bool(valid[0])
    assert float(t[0]) == 0.0   # sanitized, not inf


def test_normals_match_reference_orientation():
    """Normal orientation per family matches the reference classes
    (primitives.py:138,183,233,330,468)."""
    def normal(q, s, p):
        return v3.to_array(S.surface_normal(
            q, jnp.full((1,), s), v3.from_array(jnp.asarray(p))))

    # Plane: +z
    q, s = S.q_plane()
    np.testing.assert_allclose(normal(q, s, [[0.3, -0.2, 0.0]]),
                               [[0.0, 0.0, 1.0]], atol=1e-6)
    # Sphere: radial outward p/R
    q, s = S.q_sphere(jnp.float32(2.0))
    np.testing.assert_allclose(normal(q, s, [[0.0, 2.0, 0.0]]),
                               [[0.0, 1.0, 0.0]], atol=1e-6)
    # Quadric at vertex: +z (negated gradient)
    q, s = S.q_quadric(jnp.float32(0.05), jnp.float32(0.0))
    np.testing.assert_allclose(normal(q, s, [[0.0, 0.0, 0.0]]),
                               [[0.0, 0.0, 1.0]], atol=1e-6)
    # Cone apex: degenerate-gradient guard defaults +z
    q, s = S.q_cone(jnp.float32(0.5))
    np.testing.assert_allclose(normal(q, s, [[0.0, 0.0, 0.0]]),
                               [[0.0, 0.0, 1.0]], atol=1e-6)


def test_quadric_translation_gradient():
    """d t / d z_surface = -1 / dz for a plane hit along +z — the analytic
    translation-gradient check of tests/test_primitive.py:166-242."""
    o = jnp.array([[0.0, 0.0, -10.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])

    def t_of_z(zs):
        frame = Frame.create(translation=jnp.stack(
            [jnp.zeros_like(zs), jnp.zeros_like(zs), zs]))
        ol, dl = frame.to_local(o, d)
        q, _ = S.q_plane()
        t, _ = _solve_min_positive(q, ol, dl)
        return t[0]

    g = jax.grad(t_of_z)(jnp.float32(3.0))
    np.testing.assert_allclose(g, 1.0, rtol=1e-5)

    def t_quad(zs):
        frame = Frame.create(translation=jnp.stack(
            [jnp.zeros_like(zs), jnp.zeros_like(zs), zs]))
        ol, dl = frame.to_local(o, d)
        q, _ = S.q_quadric(jnp.float32(0.05), jnp.float32(0.0))
        t, _ = _solve_min_positive(q, ol, dl)
        return t[0]

    g = jax.grad(t_quad)(jnp.float32(3.0))
    np.testing.assert_allclose(g, 1.0, rtol=1e-4)


def test_rodrigues_matches_matrix_exp():
    """Closed-form Rodrigues equals the matrix exponential of the skew
    matrix (reference geom/transform.py:48-61 uses matrix_exp)."""
    import scipy.linalg
    from raytracetorch_tpu.geom.transform import skew
    rng = np.random.default_rng(0)
    for _ in range(5):
        r = rng.normal(size=3).astype(np.float32)
        R = np.asarray(rodrigues(jnp.asarray(r)))
        # float64 ground truth via scipy expm of the same skew layout
        R_ref = scipy.linalg.expm(np.asarray(skew(jnp.asarray(r)),
                                             dtype=np.float64))
        np.testing.assert_allclose(R, R_ref, atol=5e-4)   # f32 trig precision
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # zero rotation: identity, differentiable
    np.testing.assert_allclose(rodrigues(jnp.zeros(3)), np.eye(3), atol=1e-7)
    g = jax.jacobian(rodrigues)(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_transform_roundtrip_and_compose():
    frame = Frame.create(rotation=[0.2, -0.4, 0.1], translation=[1.0, 2.0, 3.0])
    o, d = _ray_batch()
    ol, dl = frame.to_local(o, d)
    o2, d2 = frame.to_world(ol, dl)
    np.testing.assert_allclose(o2, o, atol=1e-5)
    np.testing.assert_allclose(d2, d, atol=1e-5)

    # compose(outer, inner) == apply outer then inner
    Ro = rodrigues(jnp.array([0.1, 0.2, -0.3]))
    to = jnp.array([1.0, -1.0, 2.0])
    Ri = rodrigues(jnp.array([-0.2, 0.05, 0.4]))
    ti = jnp.array([0.5, 0.0, -2.0])
    Rc, tc = compose(Ro, to, Ri, ti)
    step = ((o - to) @ Ro - ti) @ Ri
    direct = (o - tc) @ Rc
    np.testing.assert_allclose(direct, step, atol=1e-5)


def test_cylinder_parallel_ray_no_hit():
    """Ray parallel to the cylinder axis inside the tube: the linear fallback
    must not produce a spurious nearby hit (the reference divides by A=0,
    primitives.py:224)."""
    q, _ = S.q_cylinder(jnp.float32(5.0))
    o = jnp.array([[1.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    t, valid = _solve_min_positive(q, o, d)
    # Fallback yields a huge t; either invalid or beyond any scene scale.
    assert (not bool(valid[0])) or float(t[0]) > 1e5
