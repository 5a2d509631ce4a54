"""Physical reflectance/transmittance in the wave layer (round-4 VERDICT
asks #2-3 + the three round-4 advisor findings).

The wave trace (utils/beamprop.py) now applies the SAME amplitude
physics as the ray tracer's intensity path: Fresnel-physics lens faces
lose the coated stack's 1 - T, metal mirrors lose 1 - R (plus the
phase-on-reflection), plain-SNELL faces and ideal mirrors stay unit.
Each test cross-validates wave-traced sensor power against the ray
model on the same prescription — two independent implementations of the
same thin-film characteristic matrices meeting through two independent
transport models.

Also covered: the advisor findings — tilted GRIN rods get first-order
prism screens (walk-off anchor, jit == eager), JONES z-rotations are
exact (no 0.1 rad bound on rz), and JONES optic axes mirror behind an
odd fold count to match core/field.py's d-dependent basis.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CollimatedDisk, DoubletLens, LinearPolarizer,
                               Scene, SensorElement, SequentialScene,
                               SingletLens)
from raytracetorch_tpu.elements.grin import GrinRod
from raytracetorch_tpu.elements.mirror import ParabolicMirror
from raytracetorch_tpu.utils.beamprop import wave_trace, wave_trace_vector
from raytracetorch_tpu.utils.coatings import METALS

WL = 0.5876e-3      # trace units (mm); coatings see 0.5876 um (the same
                    # d-line default the ray model uses for unset rays)
NC = 1.38           # MgF2


def _gauss(n, dx, w0):
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    return jnp.exp(-r2 / w0 ** 2), jnp.zeros((n, n), jnp.float32)


def _power(re, im):
    return float(jnp.sum(re * re + im * im))


def _singlet_scene(coating=None, fresnel='weighted'):
    return SequentialScene([
        SingletLens(c1=0.02, c2=-0.02, d=6.0, t=1.0, ior_glass=1.5,
                    fresnel=fresnel, coating=coating, name='lens'),
        SensorElement(radius=5.0, translation=[0, 0, 30.0], name='s')])


def _ray_flux_seq(sc, key, n=4096, radius=0.8):
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(radius),
                               translation=[0, 0, -5.0]).sample(key, n)
    _, sensors, _ = sc.simulate(p, rays, key)
    return float(sensors.total_weight(0)[0]) / n


def _wave_flux(sc, **kw):
    p = sc.init_params()
    n, dx = 256, 8e-3
    re, im = _gauss(n, dx, 0.35)
    p0 = _power(re, im)
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=-1.0, **kw)
    return _power(r1, i1) / p0


def test_uncoated_singlet_flux_matches_ray(key):
    """(VERDICT done-criterion a) Bare weighted-Fresnel singlet: the
    wave trace loses T^2 = 0.96^2 across the two faces, matching the
    ray model's transmitted flux to a few 1e-3."""
    sc = _singlet_scene()
    f_ray = _ray_flux_seq(sc, key)
    f_wave = _wave_flux(sc)
    T = 1.0 - ((1.5 - 1.0) / (1.5 + 1.0)) ** 2       # 0.96 per face
    np.testing.assert_allclose(f_wave, T * T, atol=3e-3)
    np.testing.assert_allclose(f_wave, f_ray, atol=4e-3)


def test_snell_faces_keep_unit_flux():
    """Gate regression: under default SNELL physics the ray intensity
    path has no reflection loss — the wave trace must stay unit too."""
    f_wave = _wave_flux(_singlet_scene(fresnel=False))
    np.testing.assert_allclose(f_wave, 1.0, atol=2e-4)


def test_coated_singlet_flux_and_constant_phase(key):
    """QW-MgF2-coated faces transmit 1 - 0.0128 each (both models), and
    the coating enters the wave field as a pure COMPLEX CONSTANT per
    face: the coated field is everywhere the bare field times one
    amplitude+phase factor (the normal-incidence screen model)."""
    d_qw = 0.5876 / (4 * NC)
    sc_c = _singlet_scene(coating=[(NC, d_qw)])
    sc_b = _singlet_scene()
    f_ray = _ray_flux_seq(sc_c, key)
    f_wave = _wave_flux(sc_c)
    np.testing.assert_allclose(f_wave, (1 - 0.0128) ** 2, atol=3e-3)
    np.testing.assert_allclose(f_wave, f_ray, atol=4e-3)
    assert f_wave > _wave_flux(sc_b) + 0.04

    n, dx = 256, 8e-3
    re, im = _gauss(n, dx, 0.35)
    rc, ic, _ = wave_trace(sc_c, sc_c.init_params(), re, im, dx, WL,
                           z0=-1.0)
    rb, ib, _ = wave_trace(sc_b, sc_b.init_params(), re, im, dx, WL,
                           z0=-1.0)
    # complex ratio coated/bare at two probe pixels must agree
    c = n // 2
    ratios = []
    for (iy, ix) in ((c, c), (c + 20, c - 11)):
        den = float(rb[iy, ix] ** 2 + ib[iy, ix] ** 2)
        ratios.append(((float(rc[iy, ix] * rb[iy, ix]
                              + ic[iy, ix] * ib[iy, ix]) / den),
                       (float(ic[iy, ix] * rb[iy, ix]
                              - rc[iy, ix] * ib[iy, ix]) / den)))
    np.testing.assert_allclose(ratios[0], ratios[1], atol=1e-4)


def test_vcoat_doublet_flux_matches_ray(key):
    """(VERDICT done-criterion c) Two-layer V-coat on the doublet's
    outer faces (per-face dict; the cemented interface stays bare):
    wave power == ray transmitted flux, incl. the asymmetric-stack
    layer-order reversal on the exit face."""
    # quarter-quarter V-coat: (n1/n2)^2 = n_air/n_glass nulls R at design
    # (n2 = 1.38 sqrt(1.517) ~ 1.70); asymmetric, so the exit face
    # exercises the reversal
    stack = [(NC, 0.5876 / (4 * NC)), (1.70, 0.5876 / (4 * 1.70))]
    sc = SequentialScene([
        DoubletLens(c1=0.02, c2=-0.01, c3=-0.005, d=6.0, t1=1.0, t2=0.8,
                    ior_glass1=1.517, ior_glass2=1.648,
                    fresnel='weighted', coating={0: stack, 2: stack},
                    name='lens'),
        SensorElement(radius=5.0, translation=[0, 0, 30.0], name='s')])
    f_ray = _ray_flux_seq(sc, key)
    f_wave = _wave_flux(sc)
    np.testing.assert_allclose(f_wave, f_ray, atol=4e-3)
    # V-coated outer faces ~lossless; only the bare cemented interface
    # (R ~ 1.7e-3) and the residual V-coat mismatch remain
    assert f_wave > 0.97, f_wave


def test_protected_al_mirror_flux_matches_ray(key):
    """(VERDICT done-criterion b) Protected-aluminum fold mirror
    (half-wave SiO2 over Al): the wave trace reflects with |r|^2 = R of
    the coated metal stack, matching the ray model's flux and the bare
    complex-Fresnel R (the half-wave layer is absentee at design)."""
    n_m, k_m = METALS['AL']
    R_bare = ((n_m - 1) ** 2 + k_m ** 2) / ((n_m + 1) ** 2 + k_m ** 2)
    coat = [(1.46, 0.5876 / (2 * 1.46))]

    def scene():
        return Scene([
            ParabolicMirror(c1=-0.001, d=30.0, translation=[0, 0, 50.0],
                            metal='Al', coating=coat, name='m'),
            SensorElement(radius=20.0, translation=[0, 0, 0.5], name='s'),
        ], n_bounces=3)

    sc = scene()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, 1.0]).sample(key, 4000)
    _, sensors, _ = sc.simulate(sc.init_params(), rays, key)
    f_ray = float(sensors.total_weight(0)[0]) / 4000.0

    n, dx = 256, 0.06
    re, im = _gauss(n, dx, 2.0)
    p0 = _power(re, im)
    r1, i1, _ = wave_trace(sc, sc.init_params(), re, im, dx, WL, z0=1.0)
    f_wave = _power(r1, i1) / p0
    np.testing.assert_allclose(f_wave, R_bare, atol=3e-3)
    np.testing.assert_allclose(f_wave, f_ray, atol=4e-3)


def test_jones_behind_fold_matches_ray(key):
    """(Advisor finding 3) A polarizer behind ONE mirror fold: the ray
    model's backward basis e2 = d x e1 mirrors the effective axis
    angle, so 45-degree light through a pi/6 analyzer transmits
    cos^2(75 deg) — NOT cos^2(15 deg).  The wave trace now mirrors
    theta behind odd folds; both models must agree."""
    sc = SequentialScene([
        ParabolicMirror(c1=-1e-4, d=40.0, translation=[0, 0, 50.0],
                        name='m'),
        LinearPolarizer(radius=15.0, angle=math.pi / 6,
                        translation=[0, 0, 30.0], name='pol'),
        SensorElement(radius=20.0, translation=[0, 0, 0.5], name='s')])
    p = sc.init_params()
    e0 = [math.cos(math.pi / 4), math.sin(math.pi / 4), 0.0]

    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, 1.0]).sample(key, 2000)
    out, _, aux = sc.simulate(p, rays, key, track_field=True, E0=e0)
    alive = np.asarray(out.intensity) > 0
    f_ray = float(np.asarray(aux['field_power'])[alive].mean())
    expected = math.cos(math.pi / 4 + math.pi / 6) ** 2     # cos^2(75)
    np.testing.assert_allclose(f_ray, expected, atol=1e-5)

    n, dx = 256, 0.06
    re, im = _gauss(n, dx, 2.0)
    amp = 1.0 / math.sqrt(2.0)
    ex = (re * amp, im * amp)
    ey = (re * amp, im * amp)
    p0 = _power(re, im)
    exo, eyo, _ = wave_trace_vector(sc, p, ex, ey, dx, WL, z0=1.0)
    f_wave = (_power(*exo) + _power(*eyo)) / p0
    np.testing.assert_allclose(f_wave, expected, atol=3e-3)


def test_polarizer_z_rotation_exact(key):
    """(Advisor finding 2) A pure z-rotation of a JONES plate is exactly
    representable (it adds to the optic-axis angle) — no 0.1 rad bound:
    angle=0 + rotation=[0, 0, pi/3] transmits cos^2(pi/3) = 1/4 of
    x-polarized light, same as angle=pi/3."""
    sc = SequentialScene([
        LinearPolarizer(radius=10.0, angle=0.0,
                        rotation=[0.0, 0.0, math.pi / 3], name='pol'),
        SensorElement(radius=20.0, translation=[0, 0, 10.0], name='s')])
    p = sc.init_params()
    n, dx = 128, 0.06
    re, im = _gauss(n, dx, 1.5)
    exo, eyo, _ = wave_trace_vector(sc, p, (re, im),
                                    (jnp.zeros_like(re),) * 2, dx, WL,
                                    z0=-1.0)
    f_wave = (_power(*exo) + _power(*eyo)) / _power(re, im)
    np.testing.assert_allclose(f_wave, 0.25, atol=2e-3)


def test_tilted_grin_rod_walkoff():
    """(Advisor finding 1) Small rod tilts now apply first-order prism
    screens at the flat faces instead of raising (eager) / silently
    ignoring (jit).  Anchor: a HOMOGENEOUS rod (grin_A = 0) tilted by
    alpha walks the beam off laterally by L * alpha * (1 - 1/n0) with
    no net deviation — the tilted-parallel-slab formula.  Eager and
    jitted traces must agree exactly."""
    alpha, L, n0 = 0.02, 5.0, 1.5
    sc = SequentialScene([
        GrinRod(radius=3.0, thickness=L, n0=n0, grin_A=0.0,
                rotation=[0.0, alpha, 0.0], translation=[0, 0, 10.0],
                name='rod'),
        SensorElement(radius=5.0, translation=[0, 0, 12.6], name='s')])
    p = sc.init_params()
    n, dx = 256, 0.02
    re, im = _gauss(n, dx, 0.6)

    def trace(p):
        r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=7.0)
        return r1, i1

    r1, i1 = trace(p)
    inten = np.asarray(r1 * r1 + i1 * i1)
    ax = (np.arange(n) - n // 2) * dx
    cx = float((inten.sum(axis=0) * ax).sum() / inten.sum())
    walk = L * alpha * (1.0 - 1.0 / n0)        # 0.0333
    assert abs(abs(cx) - walk) < 0.15 * walk, (cx, walk)

    # jit == eager (the advisor's traced-vs-concrete divergence): same
    # screens either way, atol covers f32 fusion-order noise only
    r1j, i1j = jax.jit(trace)(p)
    np.testing.assert_allclose(np.asarray(r1j), np.asarray(r1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(i1j), np.asarray(i1), atol=2e-5)


def test_large_tilt_still_raises():
    """The paraxial bound survives: a 0.3 rad rod tilt raises."""
    sc = SequentialScene([
        GrinRod(radius=3.0, thickness=5.0, n0=1.5, grin_A=0.0,
                rotation=[0.0, 0.3, 0.0], translation=[0, 0, 10.0],
                name='rod'),
        SensorElement(radius=5.0, translation=[0, 0, 13.0], name='s')])
    p = sc.init_params()
    re = jnp.ones((64, 64), jnp.float32)
    with pytest.raises(NotImplementedError):
        wave_trace(sc, p, re, jnp.zeros_like(re), 0.05, WL, z0=7.0)
