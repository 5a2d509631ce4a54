"""Chromatic dispersion tests: Cauchy/Abbe model, longitudinal chromatic
aberration of a singlet, and achromatic doublet design by jax.grad —
a capability beyond the reference (its rays carry wavelengths that nothing
consumes; SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, DoubletLens, Rays,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.elements.lens import abbe_to_cauchy_b

F_LINE, D_LINE, C_LINE = 0.4861, 0.5876, 0.6563


def _axis_cross(out, i=0):
    t = -out.pos[i, 1] / out.dir[i, 1]
    return float(out.pos[i, 2] + t * out.dir[i, 2])


def test_abbe_cauchy_roundtrip():
    """B reproduces the defining relation v_d = (n_d-1)/(n_F-n_C)."""
    nd, vd = 1.5168, 64.17   # N-BK7
    b = float(abbe_to_cauchy_b(nd, vd))
    nF = nd + b * (1 / F_LINE ** 2 - 1 / D_LINE ** 2)
    nC = nd + b * (1 / C_LINE ** 2 - 1 / D_LINE ** 2)
    np.testing.assert_allclose((nd - 1) / (nF - nC), vd, rtol=1e-6)


def test_singlet_longitudinal_chromatic_aberration(key):
    """Blue focuses shorter than red; d-line matches the non-dispersive
    trace; paraxial LCA ~ f/v_d."""
    lens_kw = dict(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                   ior_glass=1.5168, name='lens')
    disp = SequentialScene([SingletLens(abbe_vd=64.17, **lens_kw)])
    plain = SequentialScene([SingletLens(**lens_kw)])
    pd_, pp = disp.init_params(), plain.init_params()

    def cross(scene, p, wl):
        rays = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]],
                           wavelength=[wl])
        out, _, _ = scene.simulate(p, rays, key)
        return _axis_cross(out)

    z_d = cross(disp, pd_, D_LINE)
    z_plain = cross(plain, pp, D_LINE)
    np.testing.assert_allclose(z_d, z_plain, rtol=1e-5)   # d line unchanged
    z_unset = cross(disp, pd_, 0.0)                        # unset -> d line
    np.testing.assert_allclose(z_unset, z_d, rtol=1e-5)

    z_f = cross(disp, pd_, F_LINE)
    z_c = cross(disp, pd_, C_LINE)
    assert z_f < z_d < z_c                                 # blue focuses short
    # paraxial longitudinal chromatic aberration ~ f / v_d ~ 99.6/64.17 ~ 1.55
    np.testing.assert_allclose(z_c - z_f, 99.6 / 64.17, rtol=0.1)


def test_achromat_design_by_grad(key):
    """Optimize a crown/flint doublet's curvatures to pull the F and C foci
    together: the classic achromat, found by jax.grad through the
    dispersive trace."""
    scene = SequentialScene([DoubletLens(
        c1=0.02, c2=-0.025, c3=-0.004, d=20.0, t1=4.0, t2=2.0,
        ior_glass1=1.5168, ior_glass2=1.6727,   # N-BK7 / SF2-ish
        abbe_vd1=64.17, abbe_vd2=32.25,
        c1_grad=True, c2_grad=True, c3_grad=True, name='achromat')])
    params = scene.init_params()

    b_f = CollimatedDisk.make(radius=jnp.float32(3.0), ray_id=0,
                              wavelength=F_LINE, translation=[0, 0, -10.0])
    b_c = CollimatedDisk.make(radius=jnp.float32(3.0), ray_id=1,
                              wavelength=C_LINE, translation=[0, 0, -10.0])
    rays = scene.sample_rays(key, [(b_f, 2000), (b_c, 2000)])

    target_z = 100.0

    def loss(p):
        out, _, _ = scene.simulate(p, rays, key)
        t = (target_z - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(x ** 2 + y ** 2)   # both colors sharp at one plane

    def focus_gap(p):
        def cross(wl):
            r = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]],
                            wavelength=[wl])
            out, _, _ = scene.simulate(p, r, key)
            return _axis_cross(out)
        return abs(cross(F_LINE) - cross(C_LINE))

    gap0 = focus_gap(params)
    from raytracetorch_tpu.optim.fit import fit_lbfgs
    p2, losses = fit_lbfgs(loss, params, trainable=scene.trainable(),
                           steps=40)
    gap1 = focus_gap(p2)
    assert gap1 < gap0 * 0.25, f"achromatization failed: {gap0} -> {gap1}"
    assert float(losses[-1]) < float(losses[0])
