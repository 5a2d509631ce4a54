"""Diffractive surfaces (PhysKind.DOE): exact momentum mapping, focus,
the -3.452 diffractive Abbe number, hybrid achromatization, kinoform
efficiency, field transport, fused parity, gradients, guards.

Beyond the reference (specular-only functors, phys/std.py).  Anchors
are closed-form: the r^2 kinoform's momentum kick is EXACTLY
p_t += m lam 2 c1 r (no small-angle approximation in doe_dir), and the
diffractive power scales exactly as lam/lam0.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, DiffractiveLens,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.rays.ray import Rays

F0, LAM0 = 100.0, 0.5876


def _heights(x0s, wavelength=0.0):
    x0s = jnp.asarray(x0s, jnp.float32)
    pos = jnp.stack([x0s, jnp.zeros_like(x0s),
                     jnp.full_like(x0s, -5.0)], -1)
    d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (x0s.shape[0], 3))
    wl = jnp.full_like(x0s, wavelength)
    return Rays.create(pos, d, wavelength=wl)


def test_doe_exact_mapping(key):
    """Collimated height x0 exits with p_x = -x0/f exactly; position at
    a downstream plane follows the unit-direction geometry exactly."""
    L = 60.0
    sc = SequentialScene([
        DiffractiveLens(radius=10.0, f=F0, name='doe'),
        SensorElement(radius=50.0, translation=[0, 0, L], name='s')])
    x0s = [0.5, 2.0, -4.0, 8.0]
    out, _, _ = sc.simulate(sc.init_params(), _heights(x0s), key)
    for i, x0 in enumerate(x0s):
        px = -x0 / F0
        pz = math.sqrt(1.0 - px * px)
        np.testing.assert_allclose(float(out.dx[i]), px, rtol=1e-6)
        np.testing.assert_allclose(float(out.px[i]), x0 + L * px / pz,
                                   rtol=1e-5)


def test_doe_focus_and_chromatic_power(key):
    """Marginal-ray crossing z(lam): P(lam) = P0 lam/lam0 exactly, so
    the effective Abbe number lam_d/(lam_F - lam_C) = -3.452."""
    crossings = {}
    for lam in (0.4861, 0.5876, 0.6563):
        sc = SequentialScene([DiffractiveLens(radius=10.0, f=F0,
                                              name='doe')])
        out, _, _ = sc.simulate(sc.init_params(),
                                _heights([3.0], wavelength=lam), key)
        # crossing of the axis: z = -x / (dx/dz) past the DOE plane
        z = -float(out.px[0] - 0.0) / float(out.dx[0]) * float(out.dz[0]) \
            + float(out.pz[0])
        crossings[lam] = z
    f_d = crossings[0.5876]
    # paraxial f vs exact marginal crossing at h=3: cos factor ~ 1e-4
    assert f_d == pytest.approx(F0 * math.sqrt(1 - 0.03 ** 2), rel=1e-4)
    P = {k: 1.0 / v for k, v in crossings.items()}
    V_eff = P[0.5876] / (P[0.4861] - P[0.6563])
    assert V_eff == pytest.approx(0.5876 / (0.4861 - 0.6563), rel=1e-3)


def test_hybrid_achromat(key):
    """Thin-lens hybrid split P_r = P V_r/(V_r - V_d),
    P_d = P V_d/(V_d - V_r): adding the DOE collapses the BK7 singlet's
    chromatic focal shift by >20x."""
    lam_F, lam_C = 0.4861, 0.6563
    V_r, V_d = 64.17, 0.5876 / (lam_F - lam_C)     # BK7, DOE

    def crossing(elements, lam):
        sc = SequentialScene(list(elements))
        out, _, _ = sc.simulate(sc.init_params(),
                                _heights([1.0], wavelength=lam), key)
        return (-float(out.px[0]) / float(out.dx[0]) * float(out.dz[0])
                + float(out.pz[0]))

    def singlet(f_r):
        # thin biconvex BK7: P = (n-1) * 2c
        n_d = 1.5168
        c = 1.0 / (2.0 * (n_d - 1.0) * f_r)
        return SingletLens(c1=c, c2=-c, d=16.0, t=0.8, ior_glass=n_d,
                           abbe_vd=V_r, name='lens')

    # pure singlet, f = 80: chromatic focal shift ~ f/V
    zF = crossing([singlet(80.0)], lam_F)
    zC = crossing([singlet(80.0)], lam_C)
    shift_singlet = abs(zF - zC)
    assert shift_singlet == pytest.approx(80.0 / V_r, rel=0.05)

    # hybrid with the same total power: P_r = P V_r/(V_r-V_d)
    P = 1.0 / 80.0
    P_r = P * V_r / (V_r - V_d)
    P_d = P * V_d / (V_d - V_r)
    hybrid = [singlet(1.0 / P_r),
              DiffractiveLens(radius=10.0, f=1.0 / P_d,
                              translation=[0, 0, 2.0], name='doe')]
    zF_h = crossing(hybrid, lam_F)
    zC_h = crossing(hybrid, lam_C)
    assert abs(zF_h - zC_h) < shift_singlet / 20.0
    # total power preserved (same d-line focus within thin-lens slop)
    z_d = crossing(hybrid, 0.5876)
    assert z_d == pytest.approx(80.0, rel=0.05)


def test_kinoform_efficiency(key):
    sc = SequentialScene([DiffractiveLens(radius=10.0, f=F0,
                                          efficiency=True, name='doe')])
    p = sc.init_params()
    # design wavelength: eta = 1
    out, _, _ = sc.simulate(p, _heights([1.0], wavelength=LAM0), key)
    np.testing.assert_allclose(float(out.intensity[0]), 1.0, atol=1e-6)
    # alpha = lam0/lam = 1.2: eta = sinc^2(0.2)
    out2, _, _ = sc.simulate(p, _heights([1.0], wavelength=LAM0 / 1.2),
                             key)
    eta = (math.sin(0.2 * math.pi) / (0.2 * math.pi)) ** 2
    np.testing.assert_allclose(float(out2.intensity[0]), eta, rtol=1e-5)
    # alpha = 2: the blazed order is empty
    out3, _, _ = sc.simulate(p, _heights([1.0], wavelength=LAM0 / 2.0),
                             key)
    np.testing.assert_allclose(float(out3.intensity[0]), 0.0, atol=1e-6)


def test_doe_field_transport(key):
    """track_field through the bend: E stays perpendicular to d and
    |E|^2 = 1 (lossless without the efficiency flag)."""
    sc = SequentialScene([DiffractiveLens(radius=10.0, f=30.0,
                                          name='doe')])
    out, _, aux = sc.simulate(sc.init_params(), _heights([6.0]), key,
                              track_field=True, E0=[[0.6, 0.8, 0.0]])
    f = aux['field']
    np.testing.assert_allclose(float(aux['field_power'][0]), 1.0,
                               atol=1e-6)
    dot = (f.erx * out.dx + f.ery * out.dy + f.erz * out.dz)
    np.testing.assert_allclose(float(dot[0]), 0.0, atol=1e-6)


def test_doe_fused_parity(key):
    """The traced phase coefficients ride the ff row of the fused
    kernel's flat table: strict parity with the XLA driver."""
    sc = SequentialScene([
        DiffractiveLens(radius=10.0, coeffs=[-8.0, 0.02],
                        efficiency=True, name='doe'),
        SensorElement(radius=50.0, translation=[0, 0, 40.0], name='s')])
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(6.0),
                               translation=[0, 0, -5.0],
                               wavelength=0.55).sample(key, 777)
    out_x, sens_x, _ = sc.simulate(p, rays, key)
    out_f, sens_f, _ = sc.simulate_fused(p, rays, key, block_rows=4)
    np.testing.assert_allclose(np.asarray(out_f.dir),
                               np.asarray(out_x.dir), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_f.intensity),
                               np.asarray(out_x.intensity), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-5,
                               atol=1e-4)


def test_doe_phase_gradient(key):
    """Design the c1 coefficient by jax.grad: d(exit slope)/d(c1) =
    2 m lam_mm x0 exactly (paraxial regime)."""
    sc = SequentialScene([DiffractiveLens(radius=10.0, f=F0,
                                          phase_grad=True, name='doe')])
    rays = _heights([2.0], wavelength=LAM0)

    def slope(p):
        out, _, _ = sc.simulate(p, rays, key)
        return out.dx[0]

    g = np.asarray(jax.grad(slope)(sc.init_params())['doe']['phase'])
    np.testing.assert_allclose(g[0], 2.0 * LAM0 * 1e-3 * 2.0, rtol=1e-4)


def test_doe_guards(key):
    from raytracetorch_tpu import ghost_report
    with pytest.raises(ValueError, match='exactly one'):
        DiffractiveLens(radius=5.0)
    with pytest.raises(ValueError, match='exactly one'):
        DiffractiveLens(radius=5.0, f=10.0, coeffs=[1.0])
    with pytest.raises(ValueError):
        DiffractiveLens(radius=5.0, f=10.0, order=0)
    sc = SequentialScene([
        DiffractiveLens(radius=5.0, f=50.0, name='doe'),
        SingletLens(c1=0.02, c2=-0.02, d=10.0, t=2.0, ior_glass=1.5,
                    translation=[0, 0, 10.0], name='lens'),
        SensorElement(radius=30.0, translation=[0, 0, 60.0], name='s')])
    # round-4: ghost_report degrades gracefully — the DOE row is
    # EXCLUDED (warning + metadata) and the lens's refractive pairs
    # still rank (tests/test_ghosts.py covers the full contract)
    import warnings
    with warnings.catch_warnings(record=True) as wlist:
        warnings.simplefilter('always')
        rep = ghost_report(sc, sc.init_params(), aperture=2.0)
    assert any('subset' in str(w.message) for w in wlist)
    assert [e[1] for e in rep.excluded] == ['DOE']
    assert len(rep.pairs) >= 1


def test_doe_nonseq_fused_parity(key):
    """DOE rows in the fused NON-sequential kernel (same
    apply_physics_one in _nonseq_bounce_core): parity with the XLA
    bounce loop."""
    from raytracetorch_tpu import Scene
    sc = Scene([
        DiffractiveLens(radius=8.0, f=60.0, translation=[0, 0, 10.0],
                        name='doe'),
        SensorElement(radius=10.0, translation=[0, 0, 40.0], name='s'),
    ], n_bounces=3)
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -5.0],
                               wavelength=0.6).sample(key, 700)
    out_x, sens_x, _ = sc.simulate(p, rays, key)
    out_f, sens_f, _ = sc.simulate_fused(p, rays, key, block_rows=4)
    np.testing.assert_allclose(np.asarray(out_f.dir),
                               np.asarray(out_x.dir), atol=1e-6)
    np.testing.assert_allclose(np.asarray(sens_f.moments),
                               np.asarray(sens_x.moments), rtol=1e-4,
                               atol=1e-3)
