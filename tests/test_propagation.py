"""Angular-spectrum / Fresnel propagation (utils/propagation.py).

Anchors are closed-form wave optics: Gaussian-beam diffraction
(w(z) = w0 sqrt(1 + (z/zR)^2)), Talbot self-imaging of an amplitude
grating (z_T = 2 p^2 / lambda), unitarity on the propagating band,
paraxial agreement between the exact and Fresnel propagators, and the
through-focus PSF stack's symmetry about best focus."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu.utils.propagation import (angular_spectrum,
                                                 fresnel_transfer,
                                                 grating_field,
                                                 through_focus_psf)

WL = 0.5e-3          # 500 nm in mm


def _gauss(n, dx, w0):
    ax = (jnp.arange(n) - n / 2.0) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    return jnp.exp(-r2 / w0 ** 2), jnp.zeros((n, n), jnp.float32)


def _second_moment_w(inten, dx):
    """1/e^2 radius of a Gaussian intensity via second moments:
    I ~ exp(-2 r^2 / w^2)  =>  <x^2> = w^2 / 4."""
    n = inten.shape[0]
    ax = (np.arange(n) - n / 2.0) * dx
    tot = float(np.sum(inten))
    mx2 = float(np.sum(inten * ax[None, :] ** 2)) / tot
    return 2.0 * np.sqrt(mx2)


def test_gaussian_beam_waist_growth():
    """Propagating a waist by z spreads it to w0 sqrt(1 + (z/zR)^2)."""
    n, dx, w0 = 256, 2e-3, 0.05          # 50 um waist, 2 um pitch
    zR = np.pi * w0 ** 2 / WL            # ~15.7 mm
    re, im = _gauss(n, dx, w0)
    for z_frac, tol in ((1.0, 0.01), (2.0, 0.01)):
        r2, i2 = jax.jit(angular_spectrum, static_argnums=())(
            re, im, dx, WL, z_frac * zR)
        w_meas = _second_moment_w(np.asarray(r2 * r2 + i2 * i2), dx)
        w_true = w0 * np.sqrt(1.0 + z_frac ** 2)
        assert abs(w_meas - w_true) / w_true < tol


def test_power_conservation_and_roundtrip():
    """The transfer function is unimodular on the propagating band:
    total power is conserved, and z then -z reconstructs the field."""
    n, dx, w0 = 128, 2e-3, 0.04
    re, im = _gauss(n, dx, w0)
    p0 = float(jnp.sum(re * re + im * im))
    r1, i1 = angular_spectrum(re, im, dx, WL, 7.0)
    assert abs(float(jnp.sum(r1 * r1 + i1 * i1)) - p0) / p0 < 5e-5
    r2, i2 = angular_spectrum(r1, i1, dx, WL, -7.0)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(re), atol=1e-4)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(im), atol=1e-4)


def test_plane_wave_invariant():
    """A uniform field is pure DC: propagation leaves it untouched
    (the carrier is removed by convention)."""
    n = 64
    re = jnp.ones((n, n), jnp.float32)
    im = jnp.zeros((n, n), jnp.float32)
    r1, i1 = angular_spectrum(re, im, 1e-2, WL, 123.4)
    # tolerance = two f32 DFT matmul roundtrips of an O(1) field
    np.testing.assert_allclose(np.asarray(r1), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), 0.0, atol=1e-4)


def test_fresnel_matches_angular_spectrum_paraxial():
    """For a wide beam (NA ~ lambda/(pi w0) ~ 3e-3) the paraxial TF
    agrees with the exact propagator."""
    n, dx, w0 = 128, 2e-3, 0.05
    re, im = _gauss(n, dx, w0)
    ra, ia = angular_spectrum(re, im, dx, WL, 10.0)
    rf, jf = fresnel_transfer(re, im, dx, WL, 10.0)
    # the physics difference is ~1e-8 here (beam spectrum dies at
    # f*lambda ~ 0.01); the 1e-3 floor is f32 roundoff on the O(1e3)
    # spectral intermediates of two independently-rounded DFT chains
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rf), atol=2e-3)
    np.testing.assert_allclose(np.asarray(ia), np.asarray(jf), atol=2e-3)


def test_talbot_self_imaging():
    """An amplitude grating re-images itself at z_T = 2 p^2 / lambda.

    Talbot rephasing is EXACT under the Fresnel propagator (all
    harmonics carry phase proportional to m^2); the exact
    angular-spectrum propagator legitimately dephases the high
    harmonics over z_T (the sqrt deviates from the parabola by ~6 rad
    at the Nyquist harmonic here), so the Fresnel form is the
    physically correct anchor."""
    n, period_px, dx = 256, 16, 1e-3
    p = period_px * dx                    # 16 um period
    zt = 2.0 * p ** 2 / WL                # ~1.024 mm
    re, im = grating_field(n, period_px)
    i0 = np.asarray(re * re)

    def corr(a, b):
        a = a - a.mean()
        b = b - b.mean()
        return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))

    rt, it = fresnel_transfer(re, im, dx, WL, zt)
    c_talbot = corr(np.asarray(rt * rt + it * it), i0)
    rq, iq = fresnel_transfer(re, im, dx, WL, 0.25 * zt)
    c_quarter = corr(np.asarray(rq * rq + iq * iq), i0)
    assert c_talbot > 0.98
    assert c_talbot > c_quarter + 0.1


def test_through_focus_psf_symmetry():
    """Unaberrated pupil: the through-focus stack is symmetric in
    defocus and peaks (on-axis) at focus."""
    n = 32
    ax = (jnp.arange(n) - (n - 1) / 2.0) / (n / 2.0)
    rho2 = ax[:, None] ** 2 + ax[None, :] ** 2
    amp = (rho2 <= 1.0).astype(jnp.float32)
    opd = jnp.zeros((n, n), jnp.float32)
    zs = jnp.array([-0.05, 0.0, 0.05])
    stack, dx = through_focus_psf(opd, amp, WL, 4.0, zs, pad=4)
    stack = np.asarray(stack)
    peak = stack[:, :, :].max(axis=(1, 2))
    assert peak[1] > peak[0] and peak[1] > peak[2]
    np.testing.assert_allclose(peak[0], peak[2], rtol=1e-3)
    np.testing.assert_allclose(stack[0], stack[2], atol=peak[1] * 1e-3)
    assert abs(dx - WL * 4.0 / 4) < 1e-9


def test_propagation_grads_match_finite_differences():
    """jax.grad flows through propagation and matches a central finite
    difference of the on-axis intensity in the propagation distance."""
    n, dx, w0 = 64, 2e-3, 0.03
    re, im = _gauss(n, dx, w0)

    def on_axis(dz):
        r1, i1 = angular_spectrum(re, im, dx, WL, dz)
        c = n // 2
        return r1[c, c] ** 2 + i1[c, c] ** 2

    dz0, h = 3.0, 1e-2
    g = float(jax.grad(on_axis)(dz0))
    fd = float((on_axis(dz0 + h) - on_axis(dz0 - h)) / (2 * h))
    assert np.isfinite(g)
    assert g < 0.0          # a free waist only ever spreads
    # rtol floor: the FD numerator is a 3e-3 difference of O(0.78) f32
    # evaluations, so its own noise is ~1e-2 relative
    np.testing.assert_allclose(g, fd, rtol=2e-2)


def test_fresnel_single_ft_focuses_to_abcd_waist():
    """Scaled single-FT Fresnel: a lens-phased Gaussian lands on the
    fine output pitch at its ABCD focal waist, power conserved — the
    propagator fast systems need (the TF propagators cannot hold a big
    pupil and a tiny Airy core on one pitch)."""
    from raytracetorch_tpu.utils.propagation import fresnel_single_ft
    n, dx, w0, f = 256, 0.04, 2.0, 100.0       # 10 mm window, f/25-ish
    ax = (jnp.arange(n) - (n - 1) / 2.0) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    re = jnp.exp(-r2 / w0 ** 2)
    ph = -jnp.pi * r2 / (WL * f)                # thin lens at the plane
    rr, ii = re * jnp.cos(ph), re * jnp.sin(ph)
    r2o, i2o, dxo = fresnel_single_ft(rr, ii, dx, WL, f)
    assert float(dxo) == pytest.approx(WL * f / (n * dx), rel=1e-6)
    I = np.asarray(r2o * r2o + i2o * i2o)
    w_meas = _second_moment_w(I, float(dxo))
    w_true = WL * f / (np.pi * w0)              # 7.96 um
    assert abs(w_meas - w_true) / w_true < 0.03
    # power conservation across the pitch change
    p_in = float(jnp.sum(re * re)) * dx * dx
    p_out = float(I.sum()) * float(dxo) ** 2
    assert abs(p_out - p_in) / p_in < 1e-3
    # zoomed output pitch (alpha < 1) keeps the same waist
    r3, i3, dx3 = fresnel_single_ft(rr, ii, dx, WL, f, dx_out=dxo / 2)
    w3 = _second_moment_w(np.asarray(r3 * r3 + i3 * i3), float(dxo) / 2)
    assert abs(w3 - w_true) / w_true < 0.03


def test_longitudinal_field_plane_wave_zero():
    """An x-polarized plane wave is purely transverse: Ez = 0."""
    from raytracetorch_tpu.utils.propagation import longitudinal_field
    n = 64
    ex = (jnp.ones((n, n), jnp.float32), jnp.zeros((n, n), jnp.float32))
    ey = (jnp.zeros((n, n), jnp.float32), jnp.zeros((n, n), jnp.float32))
    zr, zi = longitudinal_field(ex, ey, 1e-2, WL)
    np.testing.assert_allclose(np.asarray(zr), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zi), 0.0, atol=1e-5)


def test_radial_polarization_longitudinal_needle():
    """A focused radially-polarized beam grows an ON-AXIS longitudinal
    field while its transverse field vanishes on axis — the classic
    tight-focus needle (|Ez|/|Et| scales with NA)."""
    from raytracetorch_tpu.utils.propagation import (longitudinal_field,
                                                     vector_angular_spectrum)
    n, dx, w0, f = 256, 2e-3, 0.12, 1.2        # NA ~ w0/f = 0.1
    ax = (jnp.arange(n) - n // 2) * dx
    xg, yg = ax[None, :], ax[:, None]
    r = jnp.sqrt(xg * xg + yg * yg + 1e-20)
    g = (r / w0) * jnp.exp(-(r / w0) ** 2)     # radial donut amplitude
    ph = -jnp.pi * (r * r) / (WL * f)          # focusing phase
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    ex = (g * (xg / r) * cph, g * (xg / r) * sph)
    ey = (g * (yg / r) * cph, g * (yg / r) * sph)
    ex2, ey2 = vector_angular_spectrum(ex, ey, dx, WL, f)
    zr, zi = longitudinal_field(ex2, ey2, dx, WL)
    c = n // 2
    Iz0 = float(zr[c, c] ** 2 + zi[c, c] ** 2)
    It0 = float(ex2[0][c, c] ** 2 + ex2[1][c, c] ** 2
                + ey2[0][c, c] ** 2 + ey2[1][c, c] ** 2)
    assert Iz0 > 10.0 * It0                    # on-axis is LONGITUDINAL
    Iz = np.asarray(zr * zr + zi * zi)
    assert Iz.argmax() == c * n + c            # needle peaks on axis
    # and an x-polarized Gaussian of the same geometry has only a
    # small longitudinal fraction (~(NA/2)^2 of the peak)
    exg = (jnp.exp(-(r / w0) ** 2) * cph, jnp.exp(-(r / w0) ** 2) * sph)
    ey0 = (jnp.zeros_like(g), jnp.zeros_like(g))
    ex3, ey3 = vector_angular_spectrum(exg, ey0, dx, WL, f)
    zr3, zi3 = longitudinal_field(ex3, ey3, dx, WL)
    Ixp = float(jnp.max(ex3[0] ** 2 + ex3[1] ** 2))
    Izp = float(jnp.max(zr3 ** 2 + zi3 ** 2))
    assert Izp < 0.05 * Ixp


def test_matmul_precision_context_overrides_pinned_highest():
    """The wave stack pins precision='highest' (the TPU MXU's default
    single-pass bf16 destroys DFT chains) — but an explicit
    jax.default_matmul_precision context must win, giving users the
    standard speed/accuracy knob (psf.py::_mm; the config is part of
    the jit cache key, so switching contexts re-traces).  On CPU every
    precision is exact f32, so only agreement is asserted — the
    measured TPU tradeoff lives in BASELINE.md."""
    n, dx = 64, 0.02
    ax = (jnp.arange(n) - n // 2) * dx
    re = jnp.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2))
    im = jnp.zeros_like(re)
    f = jax.jit(lambda r, i: angular_spectrum(r, i, dx, WL, 3.0))
    r0, i0 = f(re, im)
    with jax.default_matmul_precision('BF16_BF16_F32_X3'):
        r3, i3 = f(re, im)
    np.testing.assert_allclose(np.asarray(r3), np.asarray(r0),
                               atol=5e-5)
    assert jax.config.jax_default_matmul_precision is None  # restored
