"""Physics functor tests: Snell's law angles, TIR boundary, reflection,
Fresnel energy split — the numeric replacement for the reference's
fan-diagram eyeball tests (tests/test_phys_inf_plane.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu.core import physics as _P
from raytracetorch_tpu.geom import vec3 as v3


class _ArrayAPI:
    """Array-in / array-out adapter over the component-planar physics."""

    @staticmethod
    def reflect_dir(d, n):
        return v3.to_array(_P.reflect_dir(v3.from_array(d), v3.from_array(n)))

    @staticmethod
    def snell_dir(d, n, a, b):
        return v3.to_array(_P.snell_dir(v3.from_array(d), v3.from_array(n),
                                        a, b))

    @staticmethod
    def fresnel_dir(d, n, a, b, u):
        return v3.to_array(_P.fresnel_dir(v3.from_array(d), v3.from_array(n),
                                          a, b, u))

    @staticmethod
    def linear_dir(d, hit, Rw, cx, cy, dx, dy):
        return v3.to_array(_P.linear_dir(v3.from_array(d), v3.from_array(hit),
                                         Rw, cx, cy, dx, dy))

    @staticmethod
    def apply_physics(kinds, ph, Rw, sbk, sb, hit, d, n, u):
        out, imod = _P.apply_physics(kinds, ph, Rw, sbk, sb,
                                     v3.from_array(hit), v3.from_array(d),
                                     v3.from_array(n), u)
        return v3.to_array(out), imod


P = _ArrayAPI


def _unit(v):
    v = jnp.asarray(v, jnp.float32)
    return v / jnp.linalg.norm(v)


def test_reflect():
    d = jnp.array([[0.0, 0.6, 0.8]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    out = P.reflect_dir(d, n)
    np.testing.assert_allclose(out, [[0.0, 0.6, -0.8]], atol=1e-6)


def test_snell_angle_entering():
    """Air (far side) -> glass (normal side): n1 sin(t1) = n2 sin(t2).

    Geometry mirrors a lens front face: normal +z points INTO the glass,
    ray travels +z, so it arrives from the far (air) side."""
    n1, n2 = 1.0, 1.5
    theta_i = 0.4
    d = _unit([jnp.sin(theta_i), 0.0, jnp.cos(theta_i)])[None]
    n = jnp.array([[0.0, 0.0, 1.0]])
    out = P.snell_dir(d, n, jnp.float32(n2), jnp.float32(n1))
    sin_t = float(jnp.abs(out[0, 0]))
    np.testing.assert_allclose(n2 * sin_t, n1 * np.sin(theta_i), rtol=1e-5)
    # Unit output
    np.testing.assert_allclose(jnp.linalg.norm(out), 1.0, rtol=1e-5)


def test_snell_angle_exiting_and_tir():
    """Glass (normal side) -> air: refraction bends away; past the critical
    angle the ray reflects (TIR)."""
    n_glass, n_air = 1.5, 1.0
    # Ray inside the glass moving -z toward a face whose normal +z points
    # into the glass: arrives FROM the normal side.
    theta_i = 0.3
    d = _unit([np.sin(theta_i), 0.0, -np.cos(theta_i)])[None]
    n = jnp.array([[0.0, 0.0, 1.0]])
    out = P.snell_dir(d, n, jnp.float32(n_glass), jnp.float32(n_air))
    sin_t = float(jnp.abs(out[0, 0]))
    np.testing.assert_allclose(n_air * sin_t, n_glass * np.sin(theta_i),
                               rtol=1e-5)

    # Past the critical angle asin(1/1.5) ~ 0.7297: reflect
    theta_i = 0.9
    d = _unit([np.sin(theta_i), 0.0, -np.cos(theta_i)])[None]
    out = P.snell_dir(d, n, jnp.float32(n_glass), jnp.float32(n_air))
    # z-component flips sign (reflection), x preserved
    np.testing.assert_allclose(out[0, 2], np.cos(theta_i), rtol=1e-5)
    np.testing.assert_allclose(out[0, 0], np.sin(theta_i), rtol=1e-5)


def test_fresnel_normal_incidence_reflectance():
    """At normal incidence R = ((n1-n2)/(n1+n2))^2 ~ 4% for glass; the
    Monte-Carlo split should match in expectation."""
    n = jnp.array([[0.0, 0.0, 1.0]])
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (20000, 1))
    nn = jnp.tile(n, (20000, 1))
    u = jax.random.uniform(jax.random.PRNGKey(1), (20000,))
    out = P.fresnel_dir(d, nn, jnp.float32(1.5), jnp.float32(1.0), u)
    frac_reflected = float(jnp.mean(out[:, 2] < 0))
    R_expect = ((1.0 - 1.5) / (1.0 + 1.5)) ** 2
    assert abs(frac_reflected - R_expect) < 0.01


def test_linear_thin_lens_focuses():
    """Linear physics with Cx=Cy=-1/f focuses a collimated ray to f."""
    f = 50.0
    hit = jnp.array([[0.0, 5.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    Rw = jnp.eye(3)
    out = P.linear_dir(d, hit, Rw, -1.0 / f, -1.0 / f, 1.0, 1.0)
    # slope dy/dz = -h/f
    slope = float(out[0, 1] / out[0, 2])
    np.testing.assert_allclose(slope, -5.0 / f, rtol=1e-5)


def test_apply_physics_block_and_transmit():
    from raytracetorch_tpu.constants import PhysKind, SBKind
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    n = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    hit = jnp.zeros((2, 3))
    ph = jnp.zeros((2, 6))
    kinds = jnp.array([PhysKind.TRANSMIT, PhysKind.BLOCK], jnp.int32)
    Rw = jnp.tile(jnp.eye(3)[None], (2, 1, 1))
    sbk = jnp.zeros(2, jnp.int32)
    sb = jnp.zeros((2, 4))
    u = jnp.zeros(2)
    out, imod = P.apply_physics(kinds, ph, Rw, sbk, sb, hit, d, n, u)
    np.testing.assert_allclose(out[0], [0.0, 0.0, 1.0])
    np.testing.assert_allclose(out[1], [0.0, 0.0, 0.0])
    np.testing.assert_allclose(imod, [1.0, 0.0])
