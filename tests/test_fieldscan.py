"""Real-ray field-scan analysis (utils/fieldscan.py): the astigmatic
field curves, distortion and vignetting are validated against the
independently-tested Seidel third-order predictions in the small-field
limit, against geometry for the vignetting fraction, and against finite
differences for the gradient path.  (The torch reference has no field
analysis; closest machinery is its 5x5 paraxial matrices,
reference elements/lens.py:129-147.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import enable_x64

from raytracetorch_tpu import (CircularAperture, RectangularAperture,
                               SequentialScene, SingletLens, field_scan)

N_G, C1, C2, T = 1.5, 0.02, -0.02, 1.0


def _scene(extra=()):
    els = [SingletLens(c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, name='L'),
           CircularAperture(radius=3.0, translation=(0, 0, 2.0),
                            name='stop')]
    return SequentialScene(list(els) + list(extra))


def test_field_curves_match_seidel():
    # Small-field z_T / z_S splits must approach the Seidel (third-order)
    # astigmatism and field-curvature predictions of the SAME scene.
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        th = 0.04
        fs = field_scan(sc, p, jnp.asarray([1e-3, th]), n_pupil=0)
        rep = sc.seidel(p, aperture=3.0, field=th, stop_z=2.0)
        assert np.isclose(float(fs.z_image), float(rep.z_image), rtol=1e-9)
        assert np.isclose(float(fs.astigmatism[1]),
                          float(rep.astigmatism_ts), rtol=2e-2)
        assert np.isclose(float(fs.field_s[1]),
                          float(rep.field_curvature_sagittal), rtol=2e-2)
        assert np.isclose(float(fs.field_t[1]),
                          float(rep.field_curvature_tangential), rtol=2e-2)
        # field curves scale ~ theta^2: the tiny-field point is ~1600x less
        assert abs(float(fs.field_t[0])) < abs(float(fs.field_t[1])) / 100


def test_distortion_matches_seidel():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        th = 0.05
        fs = field_scan(sc, p, jnp.asarray([th]), n_pupil=0)
        rep = sc.seidel(p, aperture=3.0, field=th, stop_z=2.0)
        dist_seidel_pct = 100.0 * float(rep.distortion_transverse) \
            / float(fs.y_ref[0])
        assert np.isclose(float(fs.distortion_pct[0]), dist_seidel_pct,
                          rtol=2e-2)


def test_vignetting_unclipped_then_clipped():
    with enable_x64():
        # stop alone: the aimed pupil disk passes untouched at every field
        sc = _scene()
        p = sc.init_params(jnp.float64)
        fs = field_scan(sc, p, jnp.asarray([1e-3, 0.05]), aperture=2.9,
                        n_pupil=128)
        assert np.allclose(np.asarray(fs.transmission), 1.0)
        # a BLOCKING iris (invert=True — non-inverted apertures let
        # missing rays fly by, reference phys/filter.py semantics) near
        # the image plane, where the converging beam is ~0.3 wide and the
        # chief walks off at ~0.43/0.01 field: on-axis the 0.5-radius
        # iris passes the whole cone, mid-field part of it, far field
        # nothing
        sc2 = _scene(extra=[CircularAperture(radius=0.5, invert=True,
                                             translation=(0, 0, 45.0),
                                             name='vig')])
        p2 = sc2.init_params(jnp.float64)
        fs2 = field_scan(sc2, p2, jnp.asarray([1e-3, 0.012, 0.06]),
                         aperture=2.9, n_pupil=128, stop_z=2.0)
        t = np.asarray(fs2.transmission)
        r = np.asarray(fs2.rel_illumination)
        assert t[0] == 1.0                    # unvignetted on axis
        assert 0.0 < r[1] < 0.95              # partially vignetted
        assert r[2] < 0.05                    # fully walked off the iris


def test_chief_aiming_hits_stop_center():
    # The paraxially-aimed chief ray must cross the stop plane on axis:
    # shrink the stop to a BLOCKING pinhole and the chief still gets
    # through (anything mis-aimed by > 0.02 would die there).
    with enable_x64():
        els = [SingletLens(c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G,
                           name='L'),
               CircularAperture(radius=0.02, invert=True,
                                translation=(0, 0, 2.0), name='stop')]
        sc = SequentialScene(els)
        p = sc.init_params(jnp.float64)
        fs = field_scan(sc, p, jnp.asarray([0.05]), aperture=3.0, n_pupil=0,
                        rel_probe=1e-3)
        # chief landed near the paraxial reference height -> it survived
        # the pinhole (blocked rays never reach the image plane)
        assert np.isclose(float(fs.chief_y[0]), float(fs.y_ref[0]),
                          rtol=5e-2)


def test_gradient_flatten_tangential_field():
    # d(field_t)/d(c1) by jax.grad matches finite differences — the scan
    # is usable as a field-flattening design target.
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)

        def ft(c1v):
            q = dict(p)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1v
            fs = field_scan(sc, q, jnp.asarray([0.04]), n_pupil=0)
            return fs.field_t[0]

        c1v = jnp.asarray(C1, jnp.float64)
        g = float(jax.grad(ft)(c1v))
        eps = 1e-6
        fd = float((ft(c1v + eps) - ft(c1v - eps)) / (2 * eps))
        assert np.isclose(g, fd, rtol=1e-5)


def test_requires_aperture_or_stop():
    with enable_x64():
        sc = SequentialScene([SingletLens(c1=C1, c2=C2, d=14.0, t=T,
                                          ior_glass=N_G, name='L')])
        p = sc.init_params(jnp.float64)
        with pytest.raises(ValueError, match='aperture'):
            field_scan(sc, p, jnp.asarray([0.01]))
        # explicit aperture works without a stop element (stop = vertex)
        fs = field_scan(sc, p, jnp.asarray([1e-3, 0.02]), aperture=3.0)
        assert np.all(np.isfinite(np.asarray(fs.z_tangential)))


def test_rect_aperture_scene_rejected_by_prescription():
    # non-rotationally-symmetric elements flow through the same guards as
    # the Seidel prescription (apertures are fine — they're stops)
    with enable_x64():
        sc = _scene(extra=[RectangularAperture(half_x=1.0, half_y=1.0,
                                               translation=(0, 0, 12.0),
                                               name='r')])
        p = sc.init_params(jnp.float64)
        fs = field_scan(sc, p, jnp.asarray([1e-3]), n_pupil=16)
        assert np.isfinite(float(fs.z_sagittal[0]))


# ---------------------------------------------------------------------------
# Real-ray pupil aiming (aiming='real')
# ---------------------------------------------------------------------------

def _strong_scene():
    els = [SingletLens(c1=0.08, c2=-0.08, d=10.0, t=3.5, ior_glass=N_G,
                       name='L'),
           CircularAperture(radius=3.0, translation=(0, 0, 4.0),
                            name='stop')]
    return SequentialScene(els)


def test_real_aiming_centers_chief_on_stop():
    # A strong lens ahead of the stop bends the chief nonlinearly (pupil
    # aberration): the paraxial aim misses the stop center at wide field;
    # 3 Newton iterations land it to float precision.
    from raytracetorch_tpu.rays.ray import Rays
    from raytracetorch_tpu.utils.fieldscan import _aim, _stop_crossing
    from raytracetorch_tpu.utils.seidel import (_resolve_stop, _y_at,
                                                paraxial_prescription,
                                                paraxial_ray)
    with enable_x64():
        sc = _strong_scene()
        p = sc.init_params(jnp.float64)
        surfs, apz, _, _ = paraxial_prescription(sc, p)
        stop_z, seg = _resolve_stop(surfs, apz, None, None)
        yP, _, uP, _ = paraxial_ray(surfs, 1.0, 0.0)
        yQ, _, uQ, _ = paraxial_ray(surfs, 0.0, 1.0)
        YsP = _y_at(surfs, yP, uP, 0.0, stop_z, seg)
        YsQ = _y_at(surfs, yQ, uQ, 1.0, stop_z, seg)
        u = 0.3
        z1 = float(surfs[0].z)
        z_start = z1 - 40.0
        y0 = float((0.0 - u * YsQ) / YsP - (z1 - z_start) * u)
        norm = 1.0 / np.sqrt(1.0 + u * u)
        pos = jnp.asarray([[0.0, y0, z_start]])
        dirs = jnp.asarray([[0.0, u * norm, norm]])
        key = jax.random.PRNGKey(0)

        def miss(pos_):
            rays = Rays.create(pos_, dirs, dtype=jnp.float64)
            _, _, aux = sc.simulate(p, rays, key, record_paths=True)
            xy, found = _stop_crossing(aux['paths'],
                                       jnp.asarray(stop_z, jnp.float64))
            assert bool(found[0])
            return abs(float(xy[0, 1]))

        m_par = miss(pos)
        pos_re = _aim(sc, p, pos, dirs, jnp.zeros((1, 2), jnp.float64),
                      YsP, stop_z, key, None, 3, jnp.float64)
        m_real = miss(pos_re)
        assert m_par > 1e-4, f"test not probing pupil aberration: {m_par}"
        assert m_real < 1e-7, f"real aim residual {m_real}"
        assert m_real < m_par / 1e3


def test_real_aiming_matches_paraxial_small_field():
    # Pupil aberration vanishes at small field: both aim modes must give
    # the same curves (and the real mode must not perturb anything else).
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)
        th = jnp.asarray([1e-3, 0.03])
        a = field_scan(sc, p, th, n_pupil=16)
        b = field_scan(sc, p, th, n_pupil=16, aiming='real')
        np.testing.assert_allclose(np.asarray(a.z_tangential),
                                   np.asarray(b.z_tangential), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.z_sagittal),
                                   np.asarray(b.z_sagittal), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(a.distortion_pct),
                                   np.asarray(b.distortion_pct),
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.transmission),
                                   np.asarray(b.transmission), atol=1e-9)


def test_real_aiming_wide_field_shifts_distortion():
    # At wide field on the strong lens the two aim modes measure visibly
    # different distortion (the paraxial chief samples the wrong pupil
    # zone) — the whole point of ray aiming.
    with enable_x64():
        sc = _strong_scene()
        p = sc.init_params(jnp.float64)
        th = jnp.asarray([0.3])
        a = field_scan(sc, p, th, n_pupil=0)
        b = field_scan(sc, p, th, n_pupil=0, aiming='real')
        assert abs(float(a.chief_y[0]) - float(b.chief_y[0])) > 1e-5


def test_real_aiming_gradient():
    with enable_x64():
        sc = _scene()
        p = sc.init_params(jnp.float64)

        def ft(c1v):
            q = dict(p)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1v
            fs = field_scan(sc, q, jnp.asarray([0.04]), n_pupil=0,
                            aiming='real')
            return fs.field_t[0]

        c1v = jnp.asarray(C1, jnp.float64)
        g = float(jax.grad(ft)(c1v))
        eps = 1e-6
        fd = float((ft(c1v + eps) - ft(c1v - eps)) / (2 * eps))
        assert np.isclose(g, fd, rtol=1e-4)


def test_bad_aiming_value_raises():
    sc = _scene()
    p = sc.init_params()
    with pytest.raises(ValueError):
        field_scan(sc, p, jnp.asarray([0.02]), n_pupil=0, aiming='newton')
