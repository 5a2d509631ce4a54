"""Thin-film coating module (utils/coatings.py): validated against the
classical closed forms of Macleod ch. 2 and against the core Fresnel
physics for the bare-interface limit."""

import numpy as np

import jax
import jax.numpy as jnp

from raytracetorch_tpu.utils.coatings import (coating_rt,
                                              unpolarized_reflectance)

NS = 1.5168          # BK7
NC = 1.38            # MgF2
WL = 0.55            # um


def test_bare_interface_matches_fresnel():
    """Empty stack reduces to the bare Fresnel interface at any angle."""
    from raytracetorch_tpu.core.physics import (fresnel_reflectance,
                                                refract_components)
    for theta in (0.0, 0.3, 0.6, 1.0):
        cos_i = jnp.float32(np.cos(theta))
        d = (jnp.float32(np.sin(theta)), jnp.float32(0.0),
             jnp.float32(np.cos(theta)))
        n = (jnp.float32(0.0), jnp.float32(0.0), jnp.float32(-1.0))
        _, ci, n1, n2, _, _, ct, _ = refract_components(
            d, n, jnp.float32(1.0), jnp.float32(NS))
        R_core = float(fresnel_reflectance(ci, ct, n1, n2))
        R_coat = float(unpolarized_reflectance([], [], 1.0, NS, cos_i,
                                               jnp.float32(WL)))
        np.testing.assert_allclose(R_coat, R_core, rtol=1e-5)


def test_quarter_wave_and_absentee():
    """QW layer: R = ((ns - nc^2)/(ns + nc^2))^2; HW layer is absentee."""
    c1 = jnp.float32(1.0)
    d_qw = WL / (4 * NC)
    R, T = coating_rt([NC], [d_qw], 1.0, NS, c1, jnp.float32(WL))
    expect = ((NS - NC * NC) / (NS + NC * NC)) ** 2
    np.testing.assert_allclose(float(R), expect, rtol=1e-5)
    np.testing.assert_allclose(float(R + T), 1.0, rtol=1e-6)   # dielectric
    R2, _ = coating_rt([NC], [2 * d_qw], 1.0, NS, c1, jnp.float32(WL))
    bare = ((NS - 1) / (NS + 1)) ** 2
    np.testing.assert_allclose(float(R2), bare, rtol=1e-4)


def test_brewster_zero_p_reflectance():
    thB = np.arctan(NS)
    Rp, _ = coating_rt([], [], 1.0, NS, jnp.float32(np.cos(thB)),
                       jnp.float32(WL), pol='p')
    assert float(Rp) < 1e-8


def test_v_coat_design_converges():
    """jax.grad designs a 2-layer V-coat: optimizing both thicknesses
    drives R at the design wavelength well below the single-QW floor."""
    import optax

    n1, n2 = 1.38, 2.35          # MgF2 / ZnS high-index pair
    c1 = jnp.float32(1.0)

    def R_of(d):
        # low index on the AIR side (stack listed from incidence medium)
        r, _ = coating_rt([n1, n2], [d[0], d[1]], 1.0, NS, c1,
                          jnp.float32(WL))
        return r

    d = jnp.asarray([0.1, 0.06], jnp.float32)
    opt = optax.adam(2e-3)
    state = opt.init(d)
    for _ in range(500):
        g = jax.grad(lambda dd: R_of(dd))(d)
        up, state = opt.update(g, state)
        d = jnp.clip(d + up, 1e-3, 0.5)
    final = float(R_of(d))
    qw_floor = ((NS - NC * NC) / (NS + NC * NC)) ** 2     # 1.28%
    assert final < 1e-4 < qw_floor


def test_gradients_finite_through_tir_clamp():
    """Steep incidence beyond a layer's TIR angle: the clamped cosine
    keeps R in [0, 1] and gradients finite."""
    cos_i = jnp.float32(0.05)     # ~87 degrees
    R = unpolarized_reflectance([NC], [0.1], 1.0, NS, cos_i,
                                jnp.float32(WL))
    assert 0.0 <= float(R) <= 1.0 + 1e-6
    g = jax.grad(lambda d: unpolarized_reflectance(
        [NC], [d], 1.0, NS, cos_i, jnp.float32(WL)))(jnp.float32(0.1))
    assert np.isfinite(float(g))
