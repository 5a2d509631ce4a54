"""Third-order (Seidel) aberration analysis: every coefficient is
validated against an independent ground truth — analytic formulas
(parabola zero-spherical, mirror W040 = h^4/32f^3, thin-lens Petzval),
REAL ray traces through the same scene (transverse spherical, tangential
coma, distortion, astigmatic foci, axial/lateral color), the classical
stop-shift transformation identities, and finite differences for the
gradient path.  (The reference has no aberration theory; the closest
machinery is its 5x5 paraxial matrices, reference elements/lens.py:129-147.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import enable_x64

from raytracetorch_tpu import (AsphericLens, CircularAperture, CylSingletLens,
                               ParabolicMirror, Rays, SequentialScene,
                               SingletLens, SphericalMirror, WedgePrism,
                               seidel, seidel_table)
from raytracetorch_tpu.utils.seidel import LINE_C, LINE_F

N_G, C1, C2, T = 1.5, 0.02, -0.02, 1.0


def _singlet(**kw):
    return SingletLens(c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, name='L',
                       **kw)


def _report(scene, aperture=3.0, field=0.05, **kw):
    p = scene.init_params(jnp.float64)
    return p, seidel(scene, p, aperture=aperture, field=field, **kw)


def _land(scene, p, z_img, y0, uy, z0=-5.0, lam=None, x0=0.0):
    """Real-ray (x, y) at plane z_img plus the exit slope/position."""
    pos = np.array([[x0, y0, z0]])
    d = np.array([[0.0, uy, 1.0]])
    lamv = None if lam is None else np.array([lam])
    rays = Rays.create(pos, d, wavelength=lamv, dtype=jnp.float64)
    out, _, _ = scene.simulate(p, rays, jax.random.PRNGKey(0))
    pp = np.asarray(out.pos)[0]
    dd = np.asarray(out.dir)[0]
    return (pp[0] + (z_img - pp[2]) * dd[0] / dd[2],
            pp[1] + (z_img - pp[2]) * dd[1] / dd[2], pp, dd)


# ---------------------------------------------------------------------------
# Analytic ground truths
# ---------------------------------------------------------------------------

def test_parabolic_mirror_zero_spherical():
    # Parabola at infinite conjugates is free of spherical aberration —
    # the conic (k = -1) Seidel term must cancel the base sphere EXACTLY.
    with enable_x64():
        sc = SequentialScene([ParabolicMirror(c1=-0.025, d=10.0, name='m')])
        _, rep = _report(sc, aperture=4.0, field=0.01)
        assert abs(float(rep.S_I)) < 1e-15
        assert np.isclose(float(rep.z_image), -20.0)


def test_spherical_mirror_w040():
    # Textbook: |W040| = h^4 / (32 |f|^3) with the stop at the mirror
    # (f = 1/(2c) = -20 here; the textbook form assumes f > 0 for a
    # concave mirror, our signed n -> -n convention sets the sign), and
    # the real marginal ray lands where transverse_spherical says.
    with enable_x64():
        sc = SequentialScene([SphericalMirror(c1=-0.025, d=10.0, name='m')])
        p, rep = _report(sc, aperture=4.0, field=0.01)
        h, f = 4.0, 20.0
        assert np.isclose(abs(float(rep.wavefront_coeffs['W040'])),
                          h ** 4 / (32.0 * f ** 3), rtol=1e-12)
        z_img = float(rep.z_image)
        _, y_img, _, _ = _land(sc, p, z_img, h, 0.0, z0=-5.0)
        # 3% — an f/2.5 mirror carries visible 5th-order spherical
        assert np.isclose(y_img, float(rep.transverse_spherical), rtol=3e-2)


def test_thin_lens_petzval():
    # Welford: S_IV = +H^2 phi / n for a thin lens in air, any bending.
    with enable_x64():
        sc = SequentialScene([_singlet()])
        _, rep = _report(sc)
        phi = (N_G - 1.0) * (C1 - C2)
        H = float(rep.H)
        assert np.isclose(float(rep.S_IV), H * H * phi / N_G, rtol=2e-2)
        # petzval_curvature = -n' S_IV / H^2 = -phi/n exactly (thin limit)
        assert np.isclose(float(rep.petzval_curvature), -phi / N_G,
                          rtol=2e-2)


def test_aplanatic_center_of_curvature():
    # Object at a surface's center of curvature: the marginal ray meets
    # it normally (A = 0), killing that surface's S_I and S_II.
    with enable_x64():
        sc = SequentialScene([_singlet()])
        p = sc.init_params(jnp.float64)
        z_center = -T / 2.0 + 1.0 / C1
        rep = seidel(sc, p, aperture=1.0, field=0.01, object_z=z_center,
                     stop_z=-T / 2.0)
        assert abs(float(rep.A[0])) < 1e-12
        assert abs(float(rep.s1[0])) < 1e-12
        assert abs(float(rep.s2[0])) < 1e-12


# ---------------------------------------------------------------------------
# Real-ray cross-validation (the strongest evidence the sums are right)
# ---------------------------------------------------------------------------

def test_transverse_spherical_vs_real_ray():
    with enable_x64():
        sc = SequentialScene([_singlet()])
        p, rep = _report(sc, aperture=3.0, field=0.0)
        z_img = float(rep.z_image)
        # marginal ray: height 3.0 at the stop (= first vertex, z=-T/2)
        _, y_img, _, _ = _land(sc, p, z_img, 3.0, 0.0, z0=-T / 2.0)
        assert np.isclose(y_img, float(rep.transverse_spherical), rtol=2e-2)


def test_tangential_coma_vs_real_ray():
    with enable_x64():
        sc = SequentialScene([_singlet()])
        h, th = 3.0, 0.05
        p, rep = _report(sc, aperture=h, field=th)
        z_img = float(rep.z_image)
        z0, dzs = -5.0, -T / 2.0 + 5.0
        _, y_up, _, _ = _land(sc, p, z_img, h - th * dzs, th, z0=z0)
        _, y_dn, _, _ = _land(sc, p, z_img, -h - th * dzs, th, z0=z0)
        _, y_ch, _, _ = _land(sc, p, z_img, -th * dzs, th, z0=z0)
        coma_real = 0.5 * (y_up + y_dn) - y_ch
        assert np.isclose(coma_real, float(rep.coma_tangential), rtol=3e-2)


def test_distortion_vs_real_ray():
    # Chief ray at field th vs the linearly-scaled tiny-field chief:
    # the residual is pure distortion (other Seidel terms need aperture).
    with enable_x64():
        sc = SequentialScene([_singlet()])
        th = 0.05
        p, rep = _report(sc, aperture=3.0, field=th)
        z_img = float(rep.z_image)
        z0, dzs = -5.0, -T / 2.0 + 5.0
        _, y_ch, _, _ = _land(sc, p, z_img, -th * dzs, th, z0=z0)
        eps = 1e-4
        _, y_eps, _, _ = _land(sc, p, z_img, -eps * dzs, eps, z0=z0)
        dist_real = y_ch - y_eps * (th / eps)
        assert np.isclose(dist_real, float(rep.distortion_transverse),
                          rtol=1e-3)


def test_astigmatic_foci_vs_real_rays():
    with enable_x64():
        sc = SequentialScene([_singlet()])
        th = 0.05
        p, rep = _report(sc, aperture=3.0, field=th)
        z_img = float(rep.z_image)
        z0, dzs, dh = -5.0, -T / 2.0 + 5.0, 0.05
        # tangential: close meridional pair about the chief
        _, _, pa, da = _land(sc, p, z_img, dh - th * dzs, th, z0=z0)
        _, _, pb, db = _land(sc, p, z_img, -dh - th * dzs, th, z0=z0)
        ua, ub = da[1] / da[2], db[1] / db[2]
        zT = (pb[1] - pa[1] + pa[2] * ua - pb[2] * ub) / (ua - ub)
        # sagittal: skew ray x = dh through the stop center; focus where
        # it recrosses the meridional plane
        _, _, ps, ds = _land(sc, p, z_img, -th * dzs, th, z0=z0, x0=dh)
        zS = ps[2] - ps[0] / (ds[0] / ds[2])
        assert np.isclose(zT - zS, float(rep.astigmatism_ts), rtol=2e-2)
        assert np.isclose(zS - z_img, float(rep.field_curvature_sagittal),
                          rtol=2e-2)
        assert np.isclose(zT - z_img, float(rep.field_curvature_tangential),
                          rtol=2e-2)


def test_chromatic_sums_vs_real_rays():
    with enable_x64():
        lens = SingletLens(c1=C1, c2=C2, d=14.0, t=T, ior_glass=1.5168,
                           abbe_vd=64.17, name='L')
        sc = SequentialScene([lens])
        h, th = 0.05, 0.05   # tiny aperture: pure paraxial chromatics
        p, rep = _report(sc, aperture=h, field=th)
        z_img = float(rep.z_image)
        z0, dzs = -5.0, -T / 2.0 + 5.0

        def focus_z(lam):
            _, _, pp, dd = _land(sc, p, z_img, h, 0.0, z0=-T / 2.0, lam=lam)
            return pp[2] - pp[1] / (dd[1] / dd[2])

        ax_real = focus_z(LINE_F) - focus_z(LINE_C)
        assert ax_real < 0  # crown singlet: blue focuses closer
        assert np.isclose(ax_real, float(rep.axial_color_longitudinal),
                          rtol=1e-2)

        def chief_y(lam):
            _, y, _, _ = _land(sc, p, z_img, -th * dzs, th, z0=z0, lam=lam)
            return y

        lat_real = chief_y(LINE_F) - chief_y(LINE_C)
        assert np.isclose(lat_real, float(rep.lateral_color_transverse),
                          rtol=1e-3)


# ---------------------------------------------------------------------------
# Structural identities
# ---------------------------------------------------------------------------

def test_stop_shift_identities():
    # Moving the stop leaves S_I, S_IV, C_I and H invariant and transforms
    # S_II/S_III/S_V/C_II by the classical eccentricity polynomials with
    # E = delta(Abar)/A (the same at every surface).
    with enable_x64():
        lens = _singlet()
        for z_stop_new in (-4.0, 6.0):
            sc = SequentialScene([lens])
            p = sc.init_params(jnp.float64)
            r0 = seidel(sc, p, aperture=3.0, field=0.05, stop_z=-T / 2.0)
            # keep the SAME marginal ray: the new stop's semi-aperture is
            # the original marginal's height at the new plane
            if z_stop_new < -T / 2.0:
                ap_new = 3.0   # object space, u = 0: height unchanged
            else:
                ap_new = float(r0.y[-1]
                               + (z_stop_new - T / 2.0) * r0.u_img)
            r1 = seidel(sc, p, aperture=ap_new, field=0.05,
                        stop_z=z_stop_new)
            assert np.isclose(float(r0.S_I), float(r1.S_I), rtol=1e-12)
            assert np.isclose(float(r0.S_IV), float(r1.S_IV), rtol=1e-12)
            assert np.isclose(float(r0.H), float(r1.H), rtol=1e-12)
            E = np.asarray((r1.Abar - r0.Abar) / r0.A)
            assert np.allclose(E, E[0])  # surface-independent
            E = E[0]
            assert np.isclose(float(r1.S_II), float(r0.S_II + E * r0.S_I),
                              rtol=1e-9)
            assert np.isclose(
                float(r1.S_III),
                float(r0.S_III + 2 * E * r0.S_II + E * E * r0.S_I),
                rtol=1e-9)
            assert np.isclose(
                float(r1.S_V),
                float(r0.S_V + E * (3 * r0.S_III + r0.S_IV)
                      + 3 * E * E * r0.S_II + E ** 3 * r0.S_I), rtol=1e-9)


def test_stop_from_aperture_element():
    # An explicit CircularAperture element defines the default stop.
    with enable_x64():
        sc_explicit = SequentialScene([
            CircularAperture(radius=3.0, translation=(0, 0, -4.0),
                             name='stop'),
            _singlet()])
        p = sc_explicit.init_params(jnp.float64)
        r_auto = seidel(sc_explicit, p, aperture=3.0, field=0.05)
        sc_plain = SequentialScene([_singlet()])
        p2 = sc_plain.init_params(jnp.float64)
        r_manual = seidel(sc_plain, p2, aperture=3.0, field=0.05,
                          stop_z=-4.0)
        assert np.isclose(float(r_auto.S_II), float(r_manual.S_II),
                          rtol=1e-12)
        assert np.isclose(float(r_auto.S_V), float(r_manual.S_V),
                          rtol=1e-12)


def test_folded_axis_direction():
    # test_x64's parabola scene: rays travel -z onto a c=+0.025 parabola.
    with enable_x64():
        sc = SequentialScene([ParabolicMirror(c1=0.025, d=10.0, name='m')])
        p = sc.init_params(jnp.float64)
        rep = seidel(sc, p, aperture=4.0, field=0.01, axis_direction=-1)
        assert abs(float(rep.S_I)) < 1e-15
        # report z's live in the flipped frame: true z = -z_report
        assert np.isclose(-float(rep.z_image), 20.0)


# ---------------------------------------------------------------------------
# Aspheres and gradients: aberration-targeted design
# ---------------------------------------------------------------------------

def test_asphere_cancels_spherical():
    with enable_x64():
        sph = SequentialScene([_singlet()])
        p0, rep0 = _report(sph, field=0.0)
        # solve a4 on face 1 to zero total S_I: dS_I = 8 a4 (n2-n1) y^4
        y1 = float(rep0.y[0])
        a4 = -float(rep0.S_I) / (8.0 * (N_G - 1.0) * y1 ** 4)
        asph = SequentialScene([AsphericLens(
            c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, a1=(a4,), name='L')])
        p1, rep1 = _report(asph, field=0.0)
        assert abs(float(rep1.S_I)) < 1e-12 * abs(float(rep0.S_I)) + 1e-15
        # ... and the REAL marginal ray confirms: transverse aberration
        # at the paraxial image collapses by far more than 10x
        z_img = float(rep1.z_image)
        _, y_sph, _, _ = _land(sph, p0, z_img, 3.0, 0.0, z0=-T / 2.0)
        _, y_asp, _, _ = _land(asph, p1, z_img, 3.0, 0.0, z0=-T / 2.0)
        assert abs(y_asp) < abs(y_sph) / 10.0


def test_conic_term_matches_polynomial():
    # k and a4 enter only through eps4 = k c^3/8 + a4: a pure-conic face
    # and the equivalent a4 face give identical 4th-order sums.
    with enable_x64():
        k1 = -2.0
        a4_equiv = k1 * C1 ** 3 / 8.0
        sc_k = SequentialScene([AsphericLens(
            c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, k1=k1, name='L')])
        sc_a = SequentialScene([AsphericLens(
            c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, a1=(a4_equiv,),
            name='L')])
        _, rk = _report(sc_k)
        _, ra = _report(sc_a)
        for f in ('S_I', 'S_II', 'S_III', 'S_V'):
            assert np.isclose(float(getattr(rk, f)), float(getattr(ra, f)),
                              rtol=1e-12)


def test_seidel_gradients():
    with enable_x64():
        sc = SequentialScene([_singlet()])
        p = sc.init_params(jnp.float64)

        def S_I_of_c1(c1v):
            q = jax.tree_util.tree_map(lambda x: x, p)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1v
            return seidel(sc, q, aperture=3.0, field=0.05).S_I

        c1v = jnp.asarray(C1, jnp.float64)
        g = jax.grad(S_I_of_c1)(c1v)
        eps = 1e-6
        fd = (S_I_of_c1(c1v + eps) - S_I_of_c1(c1v - eps)) / (2 * eps)
        assert np.isclose(float(g), float(fd), rtol=1e-6)


# ---------------------------------------------------------------------------
# API guards and the report surface
# ---------------------------------------------------------------------------

def test_unsupported_elements_raise():
    with enable_x64():
        sc = SequentialScene([CylSingletLens(c1=0.01, c2=-0.01, height=10.0,
                                             width=10.0, t=1.0,
                                             ior_glass=1.5, name='cyl')])
        with pytest.raises(ValueError, match='[Cc]ylindrical'):
            seidel(sc, sc.init_params(jnp.float64), aperture=1.0, field=0.0)
        sc2 = SequentialScene([WedgePrism(wedge_angle=0.01, d=10.0, t=2.0,
                                          ior_glass=1.5, name='w')])
        with pytest.raises(ValueError, match='Seidel'):
            seidel(sc2, sc2.init_params(jnp.float64), aperture=1.0,
                   field=0.0)


def test_decentered_element_raises():
    with enable_x64():
        sc = SequentialScene([SingletLens(c1=C1, c2=C2, d=14.0, t=T,
                                          ior_glass=N_G, name='L',
                                          translation=(0.5, 0.0, 0.0))])
        with pytest.raises(ValueError, match='decentered'):
            seidel(sc, sc.init_params(jnp.float64), aperture=1.0, field=0.0)


def test_seidel_table_smoke():
    with enable_x64():
        sc = SequentialScene([_singlet()])
        _, rep = _report(sc)
        txt = seidel_table(rep)
        assert 'L[0]' in txt and 'L[1]' in txt and 'TOTAL' in txt
