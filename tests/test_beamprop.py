"""Wave trace / split-step BPM (utils/beamprop.py).

Anchors: the ABCD Gaussian focal waist through an ideal thin lens, the
lensmaker focus of a thin-screen singlet, cross-validation of the wave
through-focus peak against the RAY tracer's best focus on the same
prescription, aperture energy accounting, and grad-vs-FD through the
whole propagation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               IdealThinLens, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.beamprop import wave_trace
from raytracetorch_tpu.utils.propagation import angular_spectrum
from raytracetorch_tpu.utils.wavefront import best_focus

WL = 0.5e-3


def _gauss(n, dx, w0):
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    return jnp.exp(-r2 / w0 ** 2), jnp.zeros((n, n), jnp.float32)


def _moment_w(inten, dx, crop=None):
    """1/e^2 radius via second moments.  ``crop`` windows the moment to
    the central 2*crop pixels: the r^2 weighting otherwise amplifies the
    ~1e-4-energy aperture-diffraction background at large radii into a
    20% waist overestimate (measured)."""
    inten = np.asarray(inten)
    n = inten.shape[0]
    ax = (np.arange(n) - n // 2) * dx
    if crop is not None:
        c = n // 2
        inten = inten[c - crop:c + crop, c - crop:c + crop]
        ax = ax[c - crop:c + crop]
    tot = float(np.sum(inten))
    return 2.0 * np.sqrt(float(np.sum(inten * ax[None, :] ** 2)) / tot)


def test_ideal_lens_focuses_to_abcd_waist():
    """A waist w0 AT an ideal lens f focuses to w_f = lam f / (pi w0)
    at the focal plane (ABCD Gaussian optics)."""
    n, dx, w0, f = 256, 4e-3, 0.1, 10.0
    sc = SequentialScene([
        IdealThinLens(focal=f, translation=[0, 0, 5.0], name='lens'),
        SensorElement(radius=2.0, translation=[0, 0, 5.0 + f], name='s')])
    p = sc.init_params()
    re, im = _gauss(n, dx, w0)
    r1, i1, z1 = wave_trace(sc, p, re, im, dx, WL, z0=5.0)
    assert float(z1) == 15.0
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
    w_true = WL * f / (np.pi * w0)
    assert abs(w_meas - w_true) / w_true < 0.05
    # power conserved through lens + propagation
    p0 = float(jnp.sum(re * re + im * im))
    p1 = float(jnp.sum(r1 * r1 + i1 * i1))
    assert abs(p1 - p0) / p0 < 1e-4


def test_singlet_wave_focus_matches_ray_best_focus():
    """The SAME benchmark singlet, two independent models: the ray
    tracer's best-focus z and the wave trace's on-axis-peak z agree.
    (Both see the identical spherical aberration — the wave model via
    the sag screens + in-glass propagation, the ray model exactly.)"""
    sc = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        SensorElement(radius=6.0, translation=[0, 0, 19.322], name='s')])
    p = sc.init_params()
    key = jax.random.PRNGKey(0)

    # ray best focus of the matching bundle
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -5.0]).sample(key, 50_000)
    out, _, _ = sc.simulate(p, rays, key)
    z_ray = float(best_focus(out)[2])

    # wave trace to the sensor, then scan on-axis intensity around it
    n, dx = 256, 0.025
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    re = (r2 <= 4.0).astype(jnp.float32)   # the same r=2 collimated disk
    im = jnp.zeros_like(re)
    r1, i1, z_s = wave_trace(sc, p, re, im, dx, WL, z0=-5.0)
    dzs = np.linspace(-0.5, 2.5, 61)
    c = n // 2
    peaks = []
    for dz in dzs:
        rr, ii = angular_spectrum(r1, i1, dx, WL, float(dz))
        peaks.append(float(rr[c, c] ** 2 + ii[c, c] ** 2))
    z_wave = float(z_s) + float(dzs[int(np.argmax(peaks))])
    # the two metrics are DIFFERENT focus definitions under spherical
    # aberration (min-RMS-spot vs max-axial-intensity; measured 20.78
    # vs 21.02 here) — they must agree within a fraction of the
    # marginal-to-paraxial focal spread (~1.3 mm for this beam)
    assert abs(z_wave - z_ray) < 0.4, (z_wave, z_ray)


def test_singlet_thin_screen_is_lensmaker():
    """With a NEARLY thin singlet and a small beam the wave focus is
    the lensmaker focal length to ~1%."""
    c, t, ng = 0.02, 0.2, 1.5
    f = 1.0 / ((ng - 1.0) * 2 * c)       # 50 mm (thin-lens limit)
    sc = SequentialScene([
        SingletLens(c1=c, c2=-c, d=4.0, t=t, ior_glass=ng, name='lens'),
        SensorElement(radius=2.0, translation=[0, 0, f], name='s')])
    p = sc.init_params()
    n, dx, w0 = 256, 8e-3, 0.35
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=-1.0)
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
    w_true = WL * f / (np.pi * w0)       # ~0.023 mm
    assert abs(w_meas - w_true) / w_true < 0.02


def test_aperture_masks_and_invert():
    n, dx = 128, 0.05
    re = jnp.ones((n, n), jnp.float32)
    im = jnp.zeros_like(re)
    sc = SequentialScene([
        CircularAperture(radius=1.0, translation=[0, 0, 1.0], name='a')])
    p = sc.init_params()
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=1.0)
    frac = float(jnp.sum(r1 * r1)) / float(jnp.sum(re * re))
    expect = np.pi * 1.0 / (n * dx) ** 2
    assert abs(frac - expect) / expect < 0.05
    sc2 = SequentialScene([
        CircularAperture(radius=1.0, invert=True, translation=[0, 0, 1.0],
                         name='a')])
    r2, _, _ = wave_trace(sc2, sc2.init_params(), re, im, dx, WL, z0=1.0)
    frac2 = float(jnp.sum(r2 * r2)) / float(jnp.sum(re * re))
    np.testing.assert_allclose(frac + frac2, 1.0, atol=1e-6)


def test_wave_trace_grads_match_fd():
    """d(on-axis intensity at the sensor)/d(curvature) through the
    full split-step chain matches a central finite difference."""
    n, dx, w0 = 128, 8e-3, 0.3
    re, im = _gauss(n, dx, w0)

    def on_axis(c1):
        sc = SequentialScene([
            SingletLens(c1=0.02, c2=-0.02, d=8.0, t=0.5, ior_glass=1.5,
                        c1_grad=True, name='lens'),
            SensorElement(radius=2.0, translation=[0, 0, 50.0], name='s')])
        p = sc.init_params()
        p['lens']['c1'] = c1
        r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=-1.0)
        c = n // 2
        return r1[c, c] ** 2 + i1[c, c] ** 2

    c0, h = jnp.float32(0.02), 1e-4
    g = float(jax.grad(on_axis)(c0))
    fd = float((on_axis(c0 + h) - on_axis(c0 - h)) / (2 * h))
    assert np.isfinite(g)
    np.testing.assert_allclose(g, fd, rtol=3e-2)


def test_wave_trace_unsupported_raises():
    """Off-axis mirrors have no axis-aligned thin screen — raise."""
    from raytracetorch_tpu import ParabolicMirrorOffAxis
    sc = SequentialScene([
        ParabolicMirrorOffAxis(c1=0.025, d=4.0, off_axis=10.0, name='m')])
    re = jnp.ones((32, 32), jnp.float32)
    with pytest.raises(NotImplementedError):
        wave_trace(sc, sc.init_params(), re, jnp.zeros_like(re),
                   0.1, WL, z0=-1.0)


def test_kinoform_wave_focus():
    """A DiffractiveLens f=30 focuses a Gaussian to the ABCD waist at
    the design wavelength — the 2 pi m phi_c screen is the wave model
    whose ray limit is doe_dir."""
    from raytracetorch_tpu import DiffractiveLens
    lam_um = 0.5876
    wl = lam_um * 1e-3
    f = 30.0
    sc = SequentialScene([
        DiffractiveLens(radius=3.0, f=f, design_wavelength=lam_um,
                        translation=[0, 0, 2.0], name='doe'),
        SensorElement(radius=2.0, translation=[0, 0, 2.0 + f], name='s')])
    p = sc.init_params()
    n, dx, w0 = 256, 8e-3, 0.3
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc, p, re, im, dx, wl, z0=0.0)
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
    w_true = wl * f / (np.pi * w0)
    assert abs(w_meas - w_true) / w_true < 0.05


def test_phase_plate_ramp_matches_ray_trace():
    """A linear-ramp PhaseGridPlate is a grating: the wave centroid at
    the sensor lands where the RAY model's momentum kick m lam grad(phi)
    puts it (two independent models, one prescription)."""
    from raytracetorch_tpu import PhaseGridPlate, Scene

    lam_um = 0.5876
    wl = lam_um * 1e-3
    G, L, hx = 20.0, 20.0, 1.0          # cycles/mm ramp, sensor distance
    W = 8
    xs = np.linspace(-hx, hx, W, dtype=np.float32)
    ramp = np.broadcast_to((G * xs)[None, :], (W, W))
    els = [PhaseGridPlate(half_x=hx, half_y=hx, shape=(W, W), init=ramp,
                          design_wavelength=lam_um,
                          translation=[0, 0, 1.0], name='pp'),
           SensorElement(radius=3.0, translation=[0, 0, 1.0 + L],
                         name='s')]

    # ray model
    sc_r = SequentialScene(els)
    key = jax.random.PRNGKey(1)
    rays = CollimatedDisk.make(radius=jnp.float32(0.3),
                               translation=[0, 0, 0.0]).sample(key, 20_000)
    out, _, _ = sc_r.simulate(sc_r.init_params(), rays, key)
    x_ray = float(jnp.sum(out.px * out.intensity)
                  / jnp.sum(out.intensity))

    # wave model
    n, dx, w0 = 256, 0.01, 0.3
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc_r, sc_r.init_params(), re, im, dx, wl,
                           z0=0.0)
    I = np.asarray(r1 * r1 + i1 * i1)
    ax = (np.arange(n) - n // 2) * dx
    x_wave = float((I * ax[None, :]).sum() / I.sum())

    x_theory = L * lam_um * 1e-3 * G    # small-angle m lam G
    assert abs(x_ray - x_theory) / x_theory < 0.02, (x_ray, x_theory)
    assert abs(x_wave - x_ray) / abs(x_ray) < 0.03, (x_wave, x_ray)


def test_phase_plate_pixel_grads_flow():
    """jax.grad of an output-field metric reaches every plate pixel."""
    from raytracetorch_tpu import PhaseGridPlate
    wl = 0.5876e-3
    sc = SequentialScene([
        PhaseGridPlate(half_x=1.0, half_y=1.0, shape=(8, 8),
                       translation=[0, 0, 1.0], name='pp'),
        SensorElement(radius=3.0, translation=[0, 0, 11.0], name='s')])
    p = sc.init_params()
    n, dx = 128, 0.02
    re, im = _gauss(n, dx, 0.4)

    def on_axis(grid):
        q = {**p, 'pp': {**p['pp'], 'grid': grid}}
        r1, i1, _ = wave_trace(sc, q, re, im, dx, wl, z0=0.0)
        c = n // 2
        return r1[c, c] ** 2 + i1[c, c] ** 2

    g = jax.grad(on_axis)(p['pp']['grid'])
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert (np.abs(g) > 0).mean() > 0.5   # most pixels see the beam


def test_cyl_lens_line_focus():
    """A cylindrical singlet focuses in y only: at f_y the y-moment
    collapses to the ABCD waist while x stays the input width."""
    from raytracetorch_tpu import CylSingletLens
    c, t, ng = 0.02, 0.2, 1.5
    fy = 1.0 / ((ng - 1.0) * 2 * c)
    sc = SequentialScene([
        CylSingletLens(c1=c, c2=-c, height=4.0, width=4.0, t=t,
                       ior_glass=ng, name='cyl'),
        SensorElement(radius=2.0, translation=[0, 0, fy], name='s')])
    p = sc.init_params()
    n, dx, w0 = 256, 8e-3, 0.35
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=-1.0)
    I = np.asarray(r1 * r1 + i1 * i1)
    ax = (np.arange(n) - n // 2) * dx
    c2_ = n // 2
    Iy = I[:, c2_ - 32:c2_ + 32].sum(axis=1)
    wy = 2 * np.sqrt((Iy[c2_ - 16:c2_ + 16]
                      * ax[c2_ - 16:c2_ + 16] ** 2).sum()
                     / Iy[c2_ - 16:c2_ + 16].sum())
    Ix = I.sum(axis=0)
    wx = 2 * np.sqrt((Ix * ax ** 2).sum() / Ix.sum())
    w_line = WL * fy / (np.pi * w0)
    assert abs(wy - w_line) / w_line < 0.1          # focused axis
    assert abs(wx - w0) / w0 < 0.05                 # unfocused axis


def test_zernike_defocus_term_is_a_lens():
    """A pure Noll-j=4 (defocus) Zernike sag on a flat plate acts as a
    lens of f = Rn^2 / (4 z4 (n-1)) — the repo's Zernikes are
    UNNORMALIZED (Z4 = 2 rho^2 - 1, rim value 1; geom/zernike.py), so
    no sqrt(3).  The wave trace's static monomial expansion matches."""
    from raytracetorch_tpu import ZernikeLens
    ng, rn, z4 = 1.5, 2.0, 0.01
    f = rn ** 2 / (4.0 * z4 * (ng - 1.0))                  # 200 mm
    sc = SequentialScene([
        ZernikeLens(c1=0.0, c2=0.0, d=4.0, t=0.2, ior_glass=ng,
                    z1=[(4, z4)], norm_radius=rn, name='zl'),
        SensorElement(radius=2.0, translation=[0, 0, f], name='s')])
    p = sc.init_params()
    n, dx, w0 = 256, 8e-3, 0.35
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=-1.0)
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=24)
    w_true = WL * f / (np.pi * w0)
    assert abs(w_meas - w_true) / w_true < 0.1


def test_mirror_fold_flat():
    """A flat mirror just folds the axis: the unfolded propagation of
    30 + 20 mm equals a straight 50 mm hop."""
    from raytracetorch_tpu import SphericalMirror
    n, dx, w0 = 128, 6e-3, 0.08
    re, im = _gauss(n, dx, w0)
    sc = SequentialScene([
        SphericalMirror(c1=0.0, d=0.0, translation=[0, 0, 30.0],
                        name='fold'),
        SensorElement(radius=2.0, translation=[0, 0, 10.0], name='s')])
    p = sc.init_params()
    r1, i1, z1 = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    assert float(z1) == 10.0
    r_ref, i_ref = angular_spectrum(re, im, dx, WL, 50.0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i_ref), atol=2e-5)


def test_spherical_mirror_focuses():
    """A concave mirror facing the beam (c < 0 in this encoding: the
    dish opens toward -z) focuses at f = R/2 = -1/(2c): ABCD waist at
    the folded-back sensor."""
    from raytracetorch_tpu import SphericalMirror
    c = -0.025                             # R = 40, f = 20
    f = -1.0 / (2.0 * c)
    n, dx, w0 = 256, 4e-3, 0.1
    re, im = _gauss(n, dx, w0)
    sc = SequentialScene([
        SphericalMirror(c1=c, d=10.0, translation=[0, 0, 20.0], name='m'),
        SensorElement(radius=2.0, translation=[0, 0, 20.0 - f], name='s')])
    p = sc.init_params()
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
    w_true = WL * f / (np.pi * w0)
    assert abs(w_meas - w_true) / w_true < 0.05


def test_two_mirror_fold_chain():
    """Flat fold + focusing mirror: two reflections restore +z travel
    and the second mirror's ABCD waist lands at its focal plane."""
    from raytracetorch_tpu import SphericalMirror
    c2 = 0.025                             # opens toward +z, beam from +z
    f2 = 1.0 / (2.0 * c2)                  # 20 mm
    n, dx, w0 = 256, 4e-3, 0.1
    re, im = _gauss(n, dx, w0)
    sc = SequentialScene([
        SphericalMirror(c1=0.0, d=0.0, translation=[0, 0, 30.0],
                        name='fold'),
        SphericalMirror(c1=c2, d=10.0, translation=[0, 0, -10.0],
                        name='m2'),
        SensorElement(radius=2.0, translation=[0, 0, -10.0 + f2],
                      name='s')])
    p = sc.init_params()
    r1, i1, z1 = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    assert float(z1) == 10.0
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
    w_true = WL * f2 / (np.pi * w0)
    assert abs(w_meas - w_true) / w_true < 0.05
    p0 = float(jnp.sum(re * re + im * im))
    p1 = float(jnp.sum(r1 * r1 + i1 * i1))
    assert abs(p1 - p0) / p0 < 1e-3        # d=10 clips only the far tail


def test_parabolic_mirror_wave_vs_ray_focus():
    """The paraboloid is stigmatic for collimated light: the wave
    through-focus peak sits AT the ray focus f = 1/(2|c|) (no SA to
    split the two focus definitions, unlike the singlet test)."""
    from raytracetorch_tpu import ParabolicMirror
    c = -0.025
    f = 20.0
    n, dx = 256, 0.02
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    re = (r2 <= 2.25).astype(jnp.float32)       # r = 1.5 disk
    im = jnp.zeros_like(re)
    sc = SequentialScene([
        ParabolicMirror(c1=c, d=8.0, translation=[0, 0, 20.0], name='m'),
        SensorElement(radius=2.0, translation=[0, 0, 0.0], name='s')])
    p = sc.init_params()
    r1, i1, _ = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    cpx = n // 2
    best, best_dz = -1.0, None
    for dz in np.linspace(-1.0, 1.0, 21):
        rr, ii = angular_spectrum(r1, i1, dx, WL, float(dz))
        v = float(rr[cpx, cpx] ** 2 + ii[cpx, cpx] ** 2)
        if v > best:
            best, best_dz = v, dz
    # effective +dz after the (single) fold is WORLD -dz; the stigmatic
    # focus is exactly at the sensor plane (z = 20 - f = 0)
    assert abs(best_dz) <= 0.11, best_dz


def test_wave_trace_chromatic_sellmeier():
    """wavelength_um= evaluates the lens's Sellmeier model: the wave
    focus follows f(lambda) = 1/((n(lambda)-1)(c1-c2)) across the F and
    C lines (N-BK7 thin singlet; ~0.75 mm of axial color here)."""
    from raytracetorch_tpu import glass
    from raytracetorch_tpu.utils.glass import SELLMEIER, sellmeier_index

    c, t = 0.02, 0.2
    gk = glass('N-BK7', model='sellmeier')
    coeffs = SELLMEIER['N-BK7']
    n, dx, w0 = 256, 8e-3, 0.35
    re, im = _gauss(n, dx, w0)
    for lam_um in (0.4861, 0.6563):          # F and C lines
        n_g = float(sellmeier_index(coeffs, lam_um))
        f = 1.0 / ((n_g - 1.0) * 2 * c)
        sc = SequentialScene([
            SingletLens(c1=c, c2=-c, d=4.0, t=t, name='lens', **gk),
            SensorElement(radius=2.0, translation=[0, 0, f], name='s')])
        p = sc.init_params()
        wl_mm = lam_um * 1e-3
        r1, i1, _ = wave_trace(sc, p, re, im, dx, wl_mm, z0=-1.0,
                               wavelength_um=lam_um)
        w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=16)
        w_true = wl_mm * f / (np.pi * w0)
        assert abs(w_meas - w_true) / w_true < 0.02, lam_um


def test_lens_behind_fold_traverses_back_to_front():
    """An ASYMMETRIC lens behind a fold mirror must be traversed in
    beam order (c2 face first): the folded scene equals the unfolded
    equivalent (the mirror-image lens on a straight axis)."""
    from raytracetorch_tpu import SphericalMirror
    n, dx, w0 = 128, 6e-3, 0.15
    re, im = _gauss(n, dx, w0)
    t = 0.2
    folded = SequentialScene([
        SphericalMirror(c1=0.0, d=0.0, translation=[0, 0, 30.0],
                        name='fold'),
        SingletLens(c1=0.04, c2=0.0, d=4.0, t=t, ior_glass=1.5,
                    name='lens', translation=[0, 0, 10.0]),
        SensorElement(radius=2.0, translation=[0, 0, -10.0], name='s')])
    straight = SequentialScene([
        SingletLens(c1=0.0, c2=-0.04, d=4.0, t=t, ior_glass=1.5,
                    name='lens', translation=[0, 0, 50.0]),
        SensorElement(radius=2.0, translation=[0, 0, 70.0], name='s')])
    r1, i1, _ = wave_trace(folded, folded.init_params(), re, im, dx, WL,
                           z0=0.0)
    r2, i2, _ = wave_trace(straight, straight.init_params(), re, im, dx,
                           WL, z0=0.0)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=2e-4)


def test_ideal_lens_diameter_masks():
    """IdealThinLens(diameter=) clips the wave exactly like the ray
    model's DISK bound."""
    n, dx = 128, 0.05
    re = jnp.ones((n, n), jnp.float32)
    im = jnp.zeros_like(re)
    sc = SequentialScene([
        IdealThinLens(focal=1e9, diameter=2.0, translation=[0, 0, 1.0],
                      name='l')])
    r1, _, _ = wave_trace(sc, sc.init_params(), re, im, dx, WL, z0=1.0)
    frac = float(jnp.sum(r1 * r1)) / float(jnp.sum(re * re))
    expect = np.pi * 1.0 / (n * dx) ** 2
    assert abs(frac - expect) / expect < 0.05


def test_large_tilt_raises():
    """A 45-degree 'fold flat' must NOT be silently screened as a tiny
    prism — concrete rotations beyond the small-angle regime raise."""
    from raytracetorch_tpu import SphericalMirror
    sc = SequentialScene([
        SphericalMirror(c1=0.0, d=0.0, rotation=[0.0, np.pi / 4, 0.0],
                        translation=[0, 0, 10.0], name='m')])
    re = jnp.ones((32, 32), jnp.float32)
    with pytest.raises(NotImplementedError):
        wave_trace(sc, sc.init_params(), re, jnp.zeros_like(re),
                   0.1, WL, z0=0.0)


# ---------------------------------------------------------------- GRIN


def _grin_mode_w(n0, grin_A):
    """Fundamental-mode 1/e^2 field radius of the parabolic rod:
    w_m^2 = lam / (pi n0 sqrt(A)) (ground state of the quadratic
    medium 2 i k n0 u_z = lap(u) - k^2 n0^2 A r^2 u)."""
    return float(np.sqrt(WL / (np.pi * n0 * np.sqrt(grin_A))))


def _centroid_x(inten, dx):
    inten = np.asarray(inten)
    n = inten.shape[1]
    ax = (np.arange(n) - n // 2) * dx
    return float(np.sum(inten * ax[None, :]) / np.sum(inten))


def test_grin_coherent_state():
    """An off-axis fundamental mode of the parabolic rod is a coherent
    state: through a HALF-pitch rod its centroid follows the ray
    x0 cos(sqrt(A) z) to -x0 while its width stays w_m, and the
    lossless rod conserves power."""
    from raytracetorch_tpu import GrinRod
    n0, A = 1.5, 1e-4
    w_m = _grin_mode_w(n0, A)               # 0.103 mm
    L = float(np.pi / np.sqrt(A))           # half pitch: 314.16 mm
    n, dx, x0 = 192, 0.01, 0.3
    sc = SequentialScene([
        GrinRod(radius=0.9, thickness=L, n0=n0, grin_A=A, n_steps=64,
                translation=[0, 0, L / 2], name='rod')])
    p = sc.init_params()
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = (ax[None, :] - x0) ** 2 + ax[:, None] ** 2
    re = jnp.exp(-r2 / w_m ** 2)
    im = jnp.zeros_like(re)
    r1, i1, z1 = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    assert abs(float(z1) - L) < 1e-6 * L
    inten = np.asarray(r1 * r1 + i1 * i1)
    assert abs(_centroid_x(inten, dx) - (-x0)) < 0.02 * x0
    # width invariant (coherent state) — crop around the new center
    c = n // 2 - int(round(x0 / dx))
    win = inten[n // 2 - 40:n // 2 + 40, c - 40:c + 40]
    axw = (np.arange(-40, 40)) * dx
    tot = float(np.sum(win))
    w_x = 2.0 * np.sqrt(float(np.sum(win * axw[None, :] ** 2)) / tot
                        - (float(np.sum(win * axw[None, :])) / tot) ** 2)
    assert abs(w_x - w_m) / w_m < 0.03
    p_in = float(jnp.sum(re * re + im * im))
    p_out = float(np.sum(inten))
    assert abs(p_out - p_in) / p_in < 1e-3


def test_grin_width_breathing():
    """A too-wide on-axis Gaussian breathes in the rod and returns to
    its launch width after exactly half a pitch (harmonic-oscillator
    periodicity of the Gaussian second moment)."""
    from raytracetorch_tpu import GrinRod
    n0, A = 1.5, 1e-4
    w_m = _grin_mode_w(n0, A)
    w0 = 2.0 * w_m
    L = float(np.pi / np.sqrt(A))
    n, dx = 192, 0.01
    sc = SequentialScene([
        GrinRod(radius=0.9, thickness=L, n0=n0, grin_A=A, n_steps=64,
                translation=[0, 0, L / 2], name='rod')])
    re, im = _gauss(n, dx, w0)
    r1, i1, _ = wave_trace(sc, sc.init_params(), re, im, dx, WL, z0=0.0)
    w_meas = _moment_w(np.asarray(r1 * r1 + i1 * i1), dx, crop=60)
    assert abs(w_meas - w0) / w0 < 0.03


def test_grin_grad_matches_fd():
    """jax.grad of the exit on-axis intensity w.r.t. the profile
    constant A flows through every split step and matches finite
    differences."""
    from raytracetorch_tpu import GrinRod
    n0, A = 1.5, 4e-4
    L = 0.5 * float(np.pi / np.sqrt(A))     # quarter pitch
    n, dx = 96, 0.015
    sc = SequentialScene([
        GrinRod(radius=0.6, thickness=L, n0=n0, grin_A=A, n_steps=16,
                grin_A_grad=True, translation=[0, 0, L / 2],
                name='rod')])
    p = sc.init_params()
    re, im = _gauss(n, dx, 0.25)

    def on_axis(a_val):
        q = jax.tree_util.tree_map(lambda v: v, p)
        q['rod'] = dict(q['rod'], grin_A=a_val)
        r1, i1, _ = wave_trace(sc, q, re, im, dx, WL, z0=0.0)
        return r1[n // 2, n // 2] ** 2 + i1[n // 2, n // 2] ** 2

    g = float(jax.grad(on_axis)(jnp.float32(A)))
    # eps sweep measured: 5e-6 balances f32 rounding (small eps) vs
    # truncation of the strongly curved near-focus functional (large)
    eps = 5e-6
    fd = (float(on_axis(jnp.float32(A + eps)))
          - float(on_axis(jnp.float32(A - eps)))) / (2 * eps)
    assert np.isfinite(g) and abs(fd) > 0
    assert abs(g - fd) / max(abs(fd), 1e-9) < 5e-2


def test_grin_behind_fold_raises():
    """The rod is one-directional: behind an odd fold count the wave
    trace refuses rather than silently traversing exit-first."""
    from raytracetorch_tpu import GrinRod, SphericalMirror
    sc = SequentialScene([
        SphericalMirror(c1=0.0, d=0.0, translation=[0, 0, 30.0],
                        name='fold'),
        GrinRod(radius=0.9, thickness=10.0, translation=[0, 0, 10.0],
                name='rod')])
    re = jnp.ones((32, 32), jnp.float32)
    with pytest.raises(NotImplementedError):
        wave_trace(sc, sc.init_params(), re, jnp.zeros_like(re),
                   0.05, WL, z0=0.0)


# ------------------------------------------------------- vector / Jones


def _stokes(ex, ey):
    """(S0, S1, S2, S3) integrated over the grid from (re, im) pairs."""
    xr, xi = np.asarray(ex[0]), np.asarray(ex[1])
    yr, yi = np.asarray(ey[0]), np.asarray(ey[1])
    s0 = np.sum(xr * xr + xi * xi + yr * yr + yi * yi)
    s1 = np.sum(xr * xr + xi * xi - yr * yr - yi * yi)
    s2 = 2.0 * np.sum(xr * yr + xi * yi)
    s3 = 2.0 * np.sum(xr * yi - xi * yr)     # Im(Ex* Ey)
    return s0, s1, s2, s3


def test_vector_matches_scalar_when_unmixed():
    """With Ey = 0 and no polarization elements, the vector trace IS
    two scalar traces: Ex equals wave_trace bitwise, Ey stays zero."""
    from raytracetorch_tpu.utils.beamprop import wave_trace_vector
    n, dx, w0 = 128, 6e-3, 0.15
    sc = SequentialScene([
        SingletLens(c1=0.04, c2=-0.01, d=4.0, t=0.5, ior_glass=1.5,
                    name='lens', translation=[0, 0, 10.0]),
        SensorElement(radius=2.0, translation=[0, 0, 30.0], name='s')])
    p = sc.init_params()
    re, im = _gauss(n, dx, w0)
    zer = jnp.zeros_like(re)
    r1, i1, z1 = wave_trace(sc, p, re, im, dx, WL, z0=0.0)
    ex, ey, z2 = wave_trace_vector(sc, p, (re, im), (zer, zer), dx, WL,
                                   z0=0.0)
    assert float(z1) == float(z2)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(ex[0]))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(ex[1]))
    assert float(jnp.max(jnp.abs(ey[0]))) == 0.0


def test_vector_malus_law():
    """x-polarized light through a polarizer at theta transmits
    cos^2(theta) of its power — and the wave answer matches the ray
    model's track_field law by construction."""
    from raytracetorch_tpu import LinearPolarizer
    from raytracetorch_tpu.utils.beamprop import wave_trace_vector
    n, dx, w0 = 128, 6e-3, 0.2
    th = np.deg2rad(30.0)
    sc = SequentialScene([
        LinearPolarizer(radius=3.0, angle=th, translation=[0, 0, 5.0],
                        name='pol')])
    p = sc.init_params()
    re, im = _gauss(n, dx, w0)
    zer = jnp.zeros_like(re)
    ex, ey, _ = wave_trace_vector(sc, p, (re, im), (zer, zer), dx, WL,
                                  z0=0.0)
    s0, s1, s2, s3 = _stokes(ex, ey)
    p_in = float(jnp.sum(re * re))
    assert abs(s0 / p_in - np.cos(th) ** 2) < 1e-3
    # the transmitted state is linear along the transmission axis
    assert abs(s2 / s0 - np.sin(2 * th)) < 1e-3
    assert abs(s1 / s0 - np.cos(2 * th)) < 1e-3


def test_vector_qwp_makes_circular():
    """A quarter-wave plate at 45 deg to linear x input produces
    circular light: |S3/S0| = 1."""
    from raytracetorch_tpu import QuarterWaveplate
    from raytracetorch_tpu.utils.beamprop import wave_trace_vector
    n, dx, w0 = 128, 6e-3, 0.2
    sc = SequentialScene([
        QuarterWaveplate(radius=3.0, angle=np.pi / 4,
                         translation=[0, 0, 5.0], name='qwp')])
    p = sc.init_params()
    re, im = _gauss(n, dx, w0)
    zer = jnp.zeros_like(re)
    ex, ey, _ = wave_trace_vector(sc, p, (re, im), (zer, zer), dx, WL,
                                  z0=0.0)
    s0, s1, s2, s3 = _stokes(ex, ey)
    assert abs(abs(s3) / s0 - 1.0) < 1e-3
    assert abs(s1 / s0) < 1e-3 and abs(s2 / s0) < 1e-3


def test_vector_hwp_between_crossed_polarizers():
    """Crossed polarizers extinguish; inserting a half-wave plate at
    45 deg rotates the polarization 90 deg and restores transmission."""
    from raytracetorch_tpu import HalfWaveplate, LinearPolarizer
    from raytracetorch_tpu.utils.beamprop import wave_trace_vector
    n, dx, w0 = 128, 6e-3, 0.2
    re, im = _gauss(n, dx, w0)
    zer = jnp.zeros_like(re)
    p_in = float(jnp.sum(re * re))

    crossed = SequentialScene([
        LinearPolarizer(radius=3.0, angle=0.0, translation=[0, 0, 2.0],
                        name='p1'),
        LinearPolarizer(radius=3.0, angle=np.pi / 2,
                        translation=[0, 0, 6.0], name='p2')])
    ex, ey, _ = wave_trace_vector(crossed, crossed.init_params(),
                                  (re, im), (zer, zer), dx, WL, z0=0.0)
    assert _stokes(ex, ey)[0] / p_in < 1e-8

    restored = SequentialScene([
        LinearPolarizer(radius=3.0, angle=0.0, translation=[0, 0, 2.0],
                        name='p1'),
        HalfWaveplate(radius=3.0, angle=np.pi / 4,
                      translation=[0, 0, 4.0], name='hwp'),
        LinearPolarizer(radius=3.0, angle=np.pi / 2,
                        translation=[0, 0, 6.0], name='p2')])
    ex, ey, _ = wave_trace_vector(restored, restored.init_params(),
                                  (re, im), (zer, zer), dx, WL, z0=0.0)
    assert abs(_stokes(ex, ey)[0] / p_in - 1.0) < 1e-3


def test_vector_analyzer_angle_grad():
    """d(power)/d(analyzer angle) through the vector wave trace matches
    Malus's law -P0 sin(2 theta)."""
    from raytracetorch_tpu import LinearPolarizer
    from raytracetorch_tpu.utils.beamprop import wave_trace_vector
    n, dx, w0 = 96, 8e-3, 0.2
    th = np.float32(np.deg2rad(35.0))
    sc = SequentialScene([
        LinearPolarizer(radius=3.0, angle=float(th), angle_grad=True,
                        translation=[0, 0, 5.0], name='pol')])
    p = sc.init_params()
    re, im = _gauss(n, dx, w0)
    zer = jnp.zeros_like(re)
    p_in = float(jnp.sum(re * re))

    def power(a):
        q = dict(p, pol=dict(p['pol'], angle=a))
        ex, ey, _ = wave_trace_vector(sc, q, (re, im), (zer, zer), dx,
                                      WL, z0=0.0)
        return (jnp.sum(ex[0] ** 2 + ex[1] ** 2)
                + jnp.sum(ey[0] ** 2 + ey[1] ** 2))

    g = float(jax.grad(power)(jnp.float32(th)))
    expect = -p_in * np.sin(2 * th)
    assert abs(g - expect) / abs(expect) < 1e-3


def test_scalar_trace_on_polarizer_raises():
    """The scalar wave has no polarization state — pointing users at
    wave_trace_vector beats silently ignoring the element."""
    from raytracetorch_tpu import LinearPolarizer
    sc = SequentialScene([
        LinearPolarizer(radius=3.0, translation=[0, 0, 5.0], name='p1')])
    re = jnp.ones((32, 32), jnp.float32)
    with pytest.raises(NotImplementedError):
        wave_trace(sc, sc.init_params(), re, jnp.zeros_like(re), 0.1,
                   WL, z0=0.0)


def test_cyl_mirror_wave_line_focus(key):
    """Axis-aligned CylindricalMirror (round-5: the mirror family's
    last axis-aligned member in the wave trace): f = R/2 = 600 folds a
    Gaussian into a LINE focus — y collapses to the diffraction width
    ~lam f / (pi w0) while x keeps the launch intensity width w0/2, and
    an ideal (metal=None) cylinder keeps unit flux."""
    from raytracetorch_tpu import Scene
    from raytracetorch_tpu.elements.mirror import CylindricalMirror
    sc = Scene([
        CylindricalMirror(c1=-1 / 1200, d=24.0,
                          translation=[0, 0, 50.0], name='cm'),
        SensorElement(radius=20.0, translation=[0, 0, -550.0],
                      name='s')], n_bounces=6)
    p = sc.init_params()
    n, dx = 256, 0.06
    ax = (jnp.arange(n) - n // 2) * dx
    re = jnp.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / 1.5 ** 2)
    r1, i1, _ = wave_trace(sc, p, re, jnp.zeros_like(re), dx, WL,
                           z0=1.0)
    I = np.asarray(r1) ** 2 + np.asarray(i1) ** 2
    axn = np.asarray(ax)
    np.testing.assert_allclose(I.sum() / float(jnp.sum(re * re)), 1.0,
                               atol=2e-4)          # ideal mirror: R = 1
    # energy-in-band beats raw moments here: grid-edge aliasing leaves
    # a 1e-4-energy far-field background whose r^2 weight inflates
    # second moments (the documented crop-window trap)
    frac_y = I[np.abs(axn) < 0.15, :].sum() / I.sum()
    frac_x = I[:, np.abs(axn) < 0.15].sum() / I.sum()
    assert frac_y > 0.98, frac_y    # line focus: y fully inside the band
    assert frac_x < 0.25, frac_x    # x stays at the launch width


def test_mangin_wave_matches_ray_focus_and_flux(key):
    """ManginMirror in the wave trace (round-5): the unfolded
    refract / in-glass hop / silvered-back reflect / refract pass.
    The wave field focuses AT the ray model's best focus (width ~ the
    diffraction scale, not the launch width) and the wave flux equals
    the ray flux = R_Al evaluated with the GLASS as ambient (both
    models, 4 decimals)."""
    from raytracetorch_tpu import Scene
    from raytracetorch_tpu.elements.mirror import ManginMirror

    def scene(z_sensor):
        return Scene([
            ManginMirror(c1=-1 / 750, c2=-1 / 600, d=24.0, t=4.0,
                         ior_glass=1.5, metal='Al',
                         translation=[0, 0, 60.0], name='m'),
            SensorElement(radius=20.0, translation=[0, 0, z_sensor],
                          name='s')], n_bounces=6)

    sc = scene(0.5)
    p = sc.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, 1.0]).sample(key, 8000)
    out, sens, _ = sc.simulate(p, rays, key)
    z_f = float(best_focus(out)[2])
    f_ray = float(sens.total_weight(0)[0]) / 8000.0
    assert -230.0 < z_f < -195.0    # the glass path shifts the focus

    sc2 = scene(z_f)
    p2 = sc2.init_params()
    n, dx = 512, 0.02
    ax = (jnp.arange(n) - n // 2) * dx
    re = jnp.exp(-(ax[:, None] ** 2 + ax[None, :] ** 2) / 2.0 ** 2)
    r1, i1, _ = wave_trace(sc2, p2, re, jnp.zeros_like(re), dx, WL,
                           z0=1.0)
    I = np.asarray(r1) ** 2 + np.asarray(i1) ** 2
    f_wave = I.sum() / float(jnp.sum(re * re))
    np.testing.assert_allclose(f_wave, f_ray, atol=2e-3)
    # energy-in-bucket (see the cyl test's moment-inflation note): the
    # launch beam (intensity width 1.0) has ~0.9% of its power in
    # r < 0.15; the focused field has ~all of it
    rr = np.sqrt(np.asarray(ax)[:, None] ** 2
                 + np.asarray(ax)[None, :] ** 2)
    frac = I[rr < 0.15].sum() / I.sum()
    assert frac > 0.98, frac


def test_cassegrain_wave_end_to_end():
    """Two-mirror classical Cassegrain (the example-29 prescription
    scaled to the wave grid's sampling regime) wave-traced end to end:
    the double unfold brings the field back through the primary's plane
    to the design image surface.  Anchors that do not depend on the
    (huge, f/80) depth of focus: plate scale — a field tilt theta lands
    its image centroid at EFL*theta, cross-validated against the RAY
    tracer's sensor centroid on the same prescription — flux
    conservation through both ideal reflections, and energy-in-bucket
    compactness at the design plane (2 Airy radii).  A second pass with
    metal='Al' on both mirrors checks the wave amplitude model against
    the ray model's polarization-averaged R_Al^2 flux.
    """
    from raytracetorch_tpu import ConicMirror, Rays

    F1, SEP, MAG = 40.0, 30.0, 4.0
    A = F1 - SEP                           # secondary -> prime focus
    B = MAG * A                            # secondary -> image
    C2 = (1.0 / B - 1.0 / A) / 2.0         # mirror equation, R2 < 0
    K2 = -((MAG + 1.0) / (MAG - 1.0)) ** 2  # stigmatic hyperboloid
    ZP, ZS = 40.0, 10.0
    ZIMG = ZS + B                          # 50.0
    EFL = MAG * F1                         # 160.0
    TH = 2e-3                              # field angle, rad

    def scene(metal=None):
        return SequentialScene([
            ConicMirror(c1=-1.0 / (2.0 * F1), k=-1.0, d=6.0, metal=metal,
                        translation=[0, 0, ZP], name='primary'),
            ConicMirror(c1=C2, k=K2, d=3.0, metal=metal,
                        translation=[0, 0, ZS], name='secondary'),
            SensorElement(radius=2.0, translation=[0, 0, ZIMG],
                          name='img')])

    # -- ray reference: tilted collimated disk -> sensor centroid/flux
    def ray_centroid_flux(metal):
        sc = scene(metal)
        p = sc.init_params()
        rng = np.random.default_rng(3)
        r = np.sqrt(rng.uniform(0.04, 1.0, 4000))
        az = rng.uniform(0.0, 2 * np.pi, 4000)
        pos = np.stack([r * np.cos(az), r * np.sin(az),
                        np.zeros_like(r)], -1)
        d = np.tile([np.sin(TH), 0.0, np.cos(TH)], (4000, 1))
        rays = Rays.create(pos, d, wavelength=WL * 1e3)  # mm -> um
        _, sens, _ = sc.simulate(p, rays, jax.random.PRNGKey(0))
        cx, cy = np.asarray(sens.centroid(0))[0]
        return float(cx), float(sens.total_weight(0)[0]) / 4000.0

    cx_ray, flux_ray = ray_centroid_flux(None)
    assert abs(abs(cx_ray) - EFL * TH) / (EFL * TH) < 0.02  # plate scale

    # -- wave trace: same prescription, tilted plane wave on a disk
    n, dx = 512, 0.008
    ax = (jnp.arange(n) - n // 2) * dx
    r2 = ax[:, None] ** 2 + ax[None, :] ** 2
    disk = ((r2 <= 1.0) & (r2 >= 0.04)).astype(jnp.float32)
    ph = 2.0 * jnp.pi * TH * ax[None, :] / WL      # tilt about y -> x ramp
    re0, im0 = disk * jnp.cos(ph), disk * jnp.sin(ph)
    p0 = float(jnp.sum(re0 * re0 + im0 * im0))

    sc = scene(None)
    r1, i1, z1 = wave_trace(sc, sc.init_params(), re0, im0, dx, WL, z0=0.0)
    assert float(z1) == ZIMG
    I = np.asarray(r1) ** 2 + np.asarray(i1) ** 2
    assert abs(I.sum() / p0 - 1.0) < 2e-3          # ideal mirrors: R = 1

    axn = np.asarray(ax)
    cx_wave = float((I * axn[None, :]).sum() / I.sum())
    cy_wave = float((I * axn[:, None]).sum() / I.sum())
    assert abs(cx_wave - cx_ray) < 0.02            # same image point
    assert abs(cy_wave) < 0.01

    # compactness at the DESIGN plane: 2 Airy radii around the centroid
    # (f/80 working beam -> r_airy = 1.22 lam EFL / (2 r_pupil) = 0.049)
    rr = np.sqrt((axn[None, :] - cx_wave) ** 2 + (axn[:, None]) ** 2)
    ee = I[rr < 0.098].sum() / I.sum()
    assert ee > 0.7, ee

    # -- aluminium mirrors: wave |r|^2 per bounce == ray R_Al^2 flux
    _, flux_ray_al = ray_centroid_flux('Al')
    sc_al = scene('Al')
    r2_, i2_, _ = wave_trace(sc_al, sc_al.init_params(), re0, im0, dx,
                             WL, z0=0.0)
    flux_wave = float(jnp.sum(r2_ * r2_ + i2_ * i2_)) / p0
    np.testing.assert_allclose(flux_wave, flux_ray_al, atol=2e-3)


def test_wave_trace_vmaps_over_wavelength():
    """The whole chromatic sweep is ONE jitted program: wave_trace's
    wavelength (propagation scale) and wavelength_um (dispersion line)
    both stay symbolic, so jax.vmap over the pair must reproduce the
    per-line calls exactly — the polychromatic wave PSF without a host
    loop (and the structure a TPU batches best: the DFT matmuls gain a
    leading batch dim)."""
    from raytracetorch_tpu import glass

    gk = glass('N-BK7', model='sellmeier')
    c, t = 0.02, 0.2
    sc = SequentialScene([
        SingletLens(c1=c, c2=-c, d=4.0, t=t, name='lens', **gk),
        SensorElement(radius=2.0, translation=[0, 0, 37.0], name='s')])
    p = sc.init_params()
    n, dx, w0 = 128, 8e-3, 0.35
    re, im = _gauss(n, dx, w0)

    lams_um = jnp.asarray([0.4861, 0.5876, 0.6563])

    def one(lam_um):
        r, i, _ = wave_trace(sc, p, re, im, dx, lam_um * 1e-3,
                             z0=-1.0, wavelength_um=lam_um)
        return r, i

    rs, is_ = jax.jit(jax.vmap(one))(lams_um)
    assert rs.shape == (3, n, n)
    # vmap batches the DFT matmuls -> different f32 accumulation order
    # than the unbatched lowering; 1e-4 on O(1) fields is that floor
    # (the round-4 note: f32 DFT chains disagree at ~1e-3 of O(1e3)
    # spectral intermediates between lowerings)
    for k in range(3):
        r1, i1 = one(float(lams_um[k]))
        np.testing.assert_allclose(np.asarray(rs[k]), np.asarray(r1),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(is_[k]), np.asarray(i1),
                                   atol=1e-4)
    # the three lines genuinely differ (axial color): field mismatch
    # between F and C far exceeds the vmap tolerance
    assert float(jnp.max(jnp.abs(rs[0] - rs[2]))) > 1e-2
