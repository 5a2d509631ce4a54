"""ConicMirror / AsphericMirror (round-3 VERDICT missing #2): the
general-k mirror family the reference lacks (its elements/mirror.py has
only k = 0 and k = -1), validated against closed-form conic optics —
the stigmatic foci of the hyperboloid (a classical Cassegrain focuses
EXACTLY at its analytic back focus) and the asphere machinery composed
with REFLECT physics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (AsphericMirror, ConicMirror,
                               ParabolicMirror, Rays, Scene,
                               SensorElement, SequentialScene)


def _annulus(radii, n_az=8):
    """Collimated +z annular beam at the given radii, launched at z=0."""
    rs, xs, ys = [], [], []
    for r in radii:
        for a in np.linspace(0.0, 2 * np.pi, n_az, endpoint=False):
            xs.append(r * np.cos(a))
            ys.append(r * np.sin(a))
    xs, ys = jnp.asarray(xs, jnp.float32), jnp.asarray(ys, jnp.float32)
    pos = jnp.stack([xs, ys, jnp.zeros_like(xs)], -1)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (xs.shape[0], 3))
    return Rays.create(pos, d)


def test_cassegrain_focuses_at_analytic_back_focus(key):
    """Classical Cassegrain: parabolic primary f1 = 50 (vertex z = 100),
    hyperbolic secondary 10 inside the prime focus with magnification
    m = 5.  Mirror equation: f2 = 1/(1/b - 1/a) with a = 10, b = 50 ->
    R2 = -25, and the stigmatic conic k2 = -((m+1)/(m-1))^2 = -2.25.
    Every ray passes through the analytic back focus (0, 0, 110)
    EXACTLY (hyperboloid foci property, no aberration on axis)."""
    f1, s, m = 50.0, 40.0, 5.0
    a = f1 - s                                   # 10
    b = m * a                                    # 50
    c2 = 1.0 / (2.0 / (1.0 / b - 1.0 / a))       # 1/R2 = -0.04
    k2 = -((m + 1.0) / (m - 1.0)) ** 2           # -2.25
    z_p, z_s = 100.0, 100.0 - s
    z_focus = z_s + b                            # 110
    sc = SequentialScene([
        ParabolicMirror(c1=-1.0 / (2 * f1), d=60.0,
                        translation=[0, 0, z_p], name='primary'),
        ConicMirror(c1=c2, k=k2, d=16.0, translation=[0, 0, z_s],
                    name='secondary'),
        SensorElement(radius=5.0, translation=[0, 0, z_focus],
                      name='det')])
    p = sc.init_params()
    rays = _annulus([15.0, 20.0, 25.0])
    out, sens, _ = sc.simulate(p, rays, key)
    assert float(jnp.sum(out.intensity)) == rays.n  # all rays survive
    # every ray's line passes through the back focus
    focus = np.array([0.0, 0.0, z_focus])
    o = np.asarray(out.pos)
    d = np.asarray(out.dir)
    t = ((focus - o) * d).sum(-1)
    miss = np.linalg.norm(o + t[:, None] * d - focus, axis=-1)
    assert miss.max() < 1e-3, miss.max()
    rms = float(sens.spot_rms(0)[0])
    assert rms < 1e-3


def test_conic_mirror_vertex_sheet_only(key):
    """Non-sequential safety: a hyperboloid's far sheet is a phantom —
    rays aimed where only the far sheet exists must MISS (the HEMI
    vertex-sheet clip), not reflect off it."""
    sc = Scene([ConicMirror(c1=-0.04, k=-2.25, d=16.0,
                            translation=[0, 0, 60.0], name='sec')],
               n_bounces=2)
    p = sc.init_params()
    # far sheet vertex sits at z = 60 + 2/(c(1+k)) = 60 + 40 = 100 for
    # this surface; a +z ray at r = 0 from z = 80 can only meet the far
    # sheet — it must fly through untouched
    r = Rays.create([[0.0, 0.0, 80.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = sc.simulate(p, r, key)
    np.testing.assert_allclose(np.asarray(out.dir[0]), [0, 0, 1],
                               atol=1e-6)
    np.testing.assert_allclose(float(out.intensity[0]), 1.0)
    # while a -z ray from past the vertex sheet does reflect
    r2 = Rays.create([[3.0, 0.0, 40.0]], [[0.0, 0.0, 1.0]])
    out2, _, _ = sc.simulate(p, r2, key)
    assert float(out2.dir[0, 2]) < 0          # convex mirror sends it back


def test_aspheric_mirror_sag_and_normal(key):
    """An a4 term displaces the reflection point and tilts the normal:
    check the traced hit against the analytic sag z = c r^2 /
    (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 and the reflected direction
    against the analytic polynomial normal."""
    c, k, a4 = -0.01, -0.8, 2e-6
    sc = Scene([AsphericMirror(c1=c, d=40.0, k=k, a=[a4],
                               translation=[0, 0, 50.0], name='m')],
               n_bounces=2)
    p = sc.init_params()
    r0 = 12.0
    rays = Rays.create([[r0, 0.0, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = sc.simulate(p, rays, key)
    # hit point: pos after reflection lies on the line from the hit
    # along the reflected dir; recompute the hit z from the sag
    sag = c * r0 ** 2 / (1 + np.sqrt(1 - (1 + k) * c * c * r0 ** 2)) \
        + a4 * r0 ** 4
    # analytic normal of z = S(r): dS/dr at r0
    dS = (c * r0 / np.sqrt(1 - (1 + k) * c * c * r0 ** 2)
          + 4 * a4 * r0 ** 3)
    n = np.array([-dS, 0.0, 1.0])
    n /= np.linalg.norm(n)
    d_in = np.array([0.0, 0.0, 1.0])
    d_ref = d_in - 2 * np.dot(d_in, n) * n
    np.testing.assert_allclose(np.asarray(out.dir[0]), d_ref, atol=1e-5)
    # the output position lies on the reflected line through the hit
    hit = np.array([r0, 0.0, 50.0 + sag])
    o = np.asarray(out.pos[0])
    t = np.dot(o - hit, d_ref)
    np.testing.assert_allclose(o, hit + t * d_ref, atol=1e-4)


def test_aspheric_mirror_gradients(key):
    """jax.grad through the Halley-refined asphere intersection + mirror
    reflection: d(landing x)/d(a4) matches finite differences."""
    c = -0.01
    sc = Scene([AsphericMirror(c1=c, d=40.0, k=0.0, a=[2e-6],
                               a_grad=True, translation=[0, 0, 50.0],
                               name='m'),
                SensorElement(radius=50.0, translation=[0, 0, 1.0],
                              rotation=[0.0, np.pi, 0.0], name='s')],
               n_bounces=3)
    p = sc.init_params()
    rays = Rays.create([[10.0, 0.0, 20.0]], [[0.0, 0.0, 1.0]])

    def loss(pp):
        out, _, _ = sc.simulate(pp, rays, key)
        return out.px[0]

    g = jax.grad(loss)(p)['m']['a'][0]
    h = 1e-8
    p_hi = {**p, 'm': {**p['m'], 'a': p['m']['a'].at[0].add(h)}}
    p_lo = {**p, 'm': {**p['m'], 'a': p['m']['a'].at[0].add(-h)}}
    fd = (float(loss(p_hi)) - float(loss(p_lo))) / (2 * h)
    assert float(g) == pytest.approx(fd, rel=2e-2)
    assert np.isfinite(float(g)) and abs(float(g)) > 0


def test_conic_mirror_roundtrip_config(key):
    """Registry roundtrip of the new classes (config auto-capture; the
    registry-wide sweep in test_config_roundtrip.py covers them too)."""
    from raytracetorch_tpu.config import element_config, instantiate_element
    for el in (ConicMirror(c1=-0.04, k=-2.25, d=16.0, name='cm'),
               AsphericMirror(c1=-0.01, d=40.0, k=-0.5, a=[1e-6, -2e-9],
                              name='am')):
        el2 = instantiate_element(element_config(el))
        r1 = el.build(el.init_params())[0]
        r2 = el2.build(el2.init_params())[0]
        np.testing.assert_allclose(np.asarray(r1.q), np.asarray(r2.q))
        np.testing.assert_allclose(np.asarray(r1.sb), np.asarray(r2.sb))


def test_mangin_mirror_matches_its_paraxial(key):
    """ManginMirror: the traced double-pass (front refract, back mirror
    in glass, front refract out) focuses a collimated paraxial pencil at
    the axial crossing its own unfolded paraxial chain predicts, and the
    thin-element limit approaches phi = 2(n-1)c1 + 2n c2."""
    from raytracetorch_tpu import ManginMirror

    c1, c2, t, n_g, z0 = -0.012, -0.01, 2.0, 1.5, 50.0
    sc = SequentialScene([ManginMirror(c1=c1, c2=c2, d=30.0, t=t,
                                       ior_glass=n_g,
                                       translation=[0, 0, z0],
                                       name='mangin')])
    p = sc.init_params()
    M = np.asarray(sc.paraxial(p))[:2, :2]
    z1 = z0 - t / 2.0
    y = 1e-3
    yp, up = M[0, 0] * y, M[1, 0] * y
    # reversed-beam output convention (plain mirror: u' = -2 c y, focus
    # at z_v - y'/u'): physical crossing z = z1 - y'/u'
    z_star = z1 - yp / up

    heights = np.array([0.4, 0.7, 1.0, 1.3]) * 1e-2
    rays = Rays.create(
        np.stack([heights, np.zeros(4), np.zeros(4)], -1),
        np.tile([[0.0, 0.0, 1.0]], (4, 1)))
    out, _, _ = sc.simulate(p, rays, key)
    assert float(jnp.sum(out.intensity)) == 4.0
    assert float(out.dz[0]) < 0        # beam reversed by the silvered back
    d = np.asarray(out.dir)
    o = np.asarray(out.pos)
    z_cross = o[:, 2] - o[:, 0] * d[:, 2] / d[:, 0]
    np.testing.assert_allclose(z_cross, z_star, atol=5e-3)
    # thin-element sanity: path-frame thin power of the double pass is
    # 2(n-1)c1 - 2n c2 (front surface twice + the in-glass mirror seen
    # by the reversed beam); f measured from the front vertex
    phi_thin = 2 * (n_g - 1) * c1 - 2 * n_g * c2
    np.testing.assert_allclose(z0 - z_star, 1.0 / phi_thin, rtol=0.05)


def test_mangin_metal_back_loses_power(key):
    """A silver-backed Mangin reflects with the glass-immersed complex
    Fresnel R < 1; throughput = R exactly (front faces are lossless
    SNELL)."""
    from raytracetorch_tpu import ManginMirror
    from raytracetorch_tpu.utils.coatings import METALS, metal_reflectance

    sc = SequentialScene([ManginMirror(c1=-0.012, c2=-0.01, d=30.0, t=2.0,
                                       ior_glass=1.5, metal='Ag',
                                       translation=[0, 0, 50.0],
                                       name='mangin')])
    p = sc.init_params()
    rays = Rays.create([[0.0, 1e-3, 0.0]], [[0.0, 0.0, 1.0]])
    out, _, _ = sc.simulate(p, rays, key)
    n_m, k_m = METALS['AG']
    # normal incidence, ambient = the glass
    R = float(metal_reflectance([], [], 1.5, n_m, k_m,
                                jnp.asarray(1.0), 0.5876, pol='s'))
    np.testing.assert_allclose(float(out.intensity[0]), R, atol=1e-4)
