"""First-order system report + ray fans (utils/firstorder.py): EFL/BFL/
FFL and principal planes validated against the independently-tested
thick-lens analytics (elements/lens.py), pupils against the thin-lens
imaging formula, the Lagrange invariant against the Seidel module, and
the ray fan's cubic against the Seidel transverse spherical.  (The torch
reference has per-element 5x5 matrices only — no system report, pupils
or fan plots; reference elements/lens.py:129-147.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import enable_x64

from raytracetorch_tpu import (CircularAperture, SequentialScene,
                               SingletLens, first_order, ray_fan)

N_G, C1, C2, T = 1.5, 0.02, -0.02, 1.0


def _lens(**kw):
    return SingletLens(c1=C1, c2=C2, d=14.0, t=T, ior_glass=N_G, name='L',
                       **kw)


def test_focal_lengths_match_thick_lens_analytics():
    with enable_x64():
        lens = _lens()
        sc = SequentialScene([lens])
        p = sc.init_params(jnp.float64)
        fo = first_order(sc, p, aperture=3.0)
        lp = p['L']
        assert np.isclose(float(fo.efl), float(lens.f(lp)), rtol=1e-12)
        assert np.isclose(float(fo.bfl), float(lens.f_bfl(lp)), rtol=1e-12)
        assert np.isclose(float(fo.ffl), float(lens.f_ffl(lp)), rtol=1e-12)
        p1z, p2z = lens.principal_planes(lp)
        assert np.isclose(float(fo.z_principal_front), float(p1z),
                          atol=1e-12)
        assert np.isclose(float(fo.z_principal_back), float(p2z),
                          atol=1e-12)
        # f' measured from P' reaches the back focal point
        assert np.isclose(float(fo.z_back_focal),
                          float(p2z) + float(fo.efl), rtol=1e-12)


def test_pupils_stop_at_thin_lens():
    # Stop coincident with a (nearly) thin lens: both pupils sit at the
    # stop and have the stop's size.
    with enable_x64():
        t = 0.03                              # thin vs f = 50
        sc = SequentialScene([
            SingletLens(c1=C1, c2=C2, d=2.0, t=t, ior_glass=N_G,
                        name='L'),
            CircularAperture(radius=0.8, translation=(0, 0, t), name='stop')])
        p = sc.init_params(jnp.float64)
        fo = first_order(sc, p)
        assert np.isclose(float(fo.enp_z), 0.0, atol=0.05)
        assert np.isclose(float(fo.exp_z), t / 2, atol=0.05)
        assert np.isclose(float(fo.enp_semi), 0.8, rtol=1e-2)
        assert np.isclose(float(fo.exp_semi), 0.8, rtol=1e-2)
        assert float(fo.stop_semi) == 0.8     # default from the element


def test_entrance_pupil_thick_lens_single_surface_imaging():
    # Stop at the BACK vertex of the thick singlet: its entrance pupil is
    # the image through the front surface alone — the single-refracting-
    # surface conjugate n/l = n'/l' - phi1 gives l = 1/(n_g/t - phi1)
    # from the front vertex, magnified m = YsP-consistently.
    with enable_x64():
        lens = _lens()
        sc = SequentialScene([
            lens, CircularAperture(radius=2.0, translation=(0, 0, T / 2),
                                   name='stop')])
        p = sc.init_params(jnp.float64)
        fo = first_order(sc, p)
        phi1 = C1 * (N_G - 1.0)
        l = 1.0 / (N_G / T - phi1)            # object-space conjugate
        assert np.isclose(float(fo.enp_z), -T / 2 + l, rtol=1e-9)
        # exit pupil: nothing follows the stop -> the stop itself
        assert np.isclose(float(fo.exp_z), T / 2, atol=1e-9)
        assert np.isclose(float(fo.exp_semi), 2.0, rtol=1e-9)


def test_entrance_pupil_thin_lens_imaging():
    # Stop a distance s behind a (nearly) thin lens: the entrance pupil
    # is its image through the lens at s' = s f / (f - s), magnified by
    # f / (f - s) (positive: virtual, behind the lens).
    with enable_x64():
        t = 0.03                              # thin vs f = 50
        lens = SingletLens(c1=C1, c2=C2, d=2.0, t=t, ior_glass=N_G,
                           name='L')
        s = 10.0
        sc = SequentialScene([
            lens, CircularAperture(radius=0.8, translation=(0, 0, s),
                                   name='stop')])
        p = sc.init_params(jnp.float64)
        fo = first_order(sc, p)
        f = float(lens.f(p['L']))                     # ~50.0
        s_img = s * f / (f - s)                       # ~12.5
        m = f / (f - s)                               # ~1.25
        assert np.isclose(float(fo.enp_z), s_img, rtol=5e-3)
        assert np.isclose(float(fo.enp_semi), 0.8 * m, rtol=5e-3)
        # exit pupil: nothing follows the stop -> the stop itself
        assert np.isclose(float(fo.exp_z), s, atol=1e-9)
        assert np.isclose(float(fo.exp_semi), 0.8, rtol=1e-9)
        # F-number from the entrance pupil
        assert np.isclose(float(fo.fno), f / (2 * 0.8 * m), rtol=5e-3)


def test_lagrange_matches_seidel():
    with enable_x64():
        sc = SequentialScene([
            _lens(), CircularAperture(radius=3.0, translation=(0, 0, 2.0),
                                      name='stop')])
        p = sc.init_params(jnp.float64)
        fo = first_order(sc, p, field=0.05)
        rep = sc.seidel(p, aperture=3.0, field=0.05)
        assert np.isclose(float(fo.lagrange_H), float(rep.H), rtol=1e-12)
        assert np.isclose(float(fo.z_image), float(rep.z_image), rtol=1e-9)


def test_first_order_differentiable():
    with enable_x64():
        sc = SequentialScene([_lens()])
        p = sc.init_params(jnp.float64)

        def efl(c1v):
            q = dict(p)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1v
            return first_order(sc, q, aperture=3.0).efl

        c1v = jnp.asarray(C1, jnp.float64)
        g = float(jax.grad(efl)(c1v))
        eps = 1e-7
        fd = float((efl(c1v + eps) - efl(c1v - eps)) / (2 * eps))
        assert np.isclose(g, fd, rtol=1e-5)


# ---------------------------------------------------------------------------
# ray fans
# ---------------------------------------------------------------------------

def test_on_axis_fan_is_odd_and_matches_seidel_cubic():
    with enable_x64():
        sc = SequentialScene([_lens()])
        p = sc.init_params(jnp.float64)
        fan = ray_fan(sc, p, field=0.0, aperture=3.0, n=33)
        ey = np.asarray(fan.ey_t)
        assert np.allclose(ey, -ey[::-1], atol=1e-12)     # odd
        assert np.allclose(np.asarray(fan.ey_s), 0.0, atol=1e-12)
        ex = np.asarray(fan.ex_s)
        assert np.allclose(ex, -ex[::-1], atol=1e-12)
        # full-aperture tangential error = Seidel transverse spherical
        rep = sc.seidel(p, aperture=3.0, field=0.01)
        assert np.isclose(ey[-1], float(rep.transverse_spherical),
                          rtol=2e-2)
        # dominant cubic: ey(p) ~ TSA p^3 across the fan
        pup = np.asarray(fan.pupil)
        fit = np.polyfit(pup, ey, 5)
        assert abs(fit[-4]) > 50 * abs(fit[-2])   # p^3 >> p^1 at focus


def test_vignetted_fan_probes_flagged_dead():
    with enable_x64():
        sc = SequentialScene([
            _lens(),
            CircularAperture(radius=3.0, translation=(0, 0, 2.0),
                             name='stop'),
            CircularAperture(radius=0.5, invert=True,
                             translation=(0, 0, 45.0), name='iris')])
        p = sc.init_params(jnp.float64)
        fan = ray_fan(sc, p, field=0.012, aperture=2.9, n=21)
        alive = np.asarray(fan.alive_t)
        assert alive.any() and not alive.all()    # partially vignetted


def test_fan_gradient():
    with enable_x64():
        sc = SequentialScene([_lens()])
        p = sc.init_params(jnp.float64)

        def edge(c1v):
            q = dict(p)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1v
            return ray_fan(sc, q, aperture=3.0, n=5).ey_t[-1]

        c1v = jnp.asarray(C1, jnp.float64)
        g = float(jax.grad(edge)(c1v))
        eps = 1e-6
        fd = float((edge(c1v + eps) - edge(c1v - eps)) / (2 * eps))
        assert np.isclose(g, fd, rtol=1e-4)
