"""Diffraction PSF / Strehl / MTF (utils/psf.py): validated against the
closed-form Airy pattern, the Marechal approximation, and an end-to-end
trace of a parabolic mirror (whose OPLs are exactly equal by the directrix
property, so its PSF must be diffraction-limited)."""

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import ParabolicMirror, Rays, SequentialScene
from raytracetorch_tpu.utils.psf import (diffraction_mtf, diffraction_psf,
                                         pupil_from_trace, strehl_ratio)

WL = 0.5e-3                 # 500 nm in mm


def _disk_pupil(n=64):
    u = (jnp.arange(n) + 0.5) / n * 2.0 - 1.0
    xx, yy = jnp.meshgrid(u, u)
    amp = ((xx ** 2 + yy ** 2) <= 1.0).astype(jnp.float32)
    return jnp.zeros((n, n)), amp


def test_airy_first_zero_and_peak():
    """Unaberrated circular pupil: PSF peaks on-axis and has its first
    radial zero at 1.22 lambda F# (the Airy radius)."""
    opd, amp = _disk_pupil(64)
    f_number = 4.0
    psf, dx = diffraction_psf(opd, amp, WL, f_number, pad=8)
    psf = np.asarray(psf)
    N = psf.shape[0]
    c = N // 2
    assert np.unravel_index(psf.argmax(), psf.shape) == (c, c)
    # radial cut along +x: first minimum in pixels vs 1.22 lambda F# / dx
    cut = psf[c, c:c + 40]
    mins = np.where((cut[1:-1] < cut[:-2]) & (cut[1:-1] <= cut[2:]))[0] + 1
    first_zero_px = float(mins[0])
    airy_px = 1.22 * WL * f_number / float(dx)
    np.testing.assert_allclose(first_zero_px, airy_px, rtol=0.12)
    # and the first dark ring is genuinely dark
    assert cut[int(round(first_zero_px))] < 2e-2 * cut[0]


def test_strehl_matches_marechal():
    """Small-aberration Strehl ~ exp(-(2 pi sigma/lambda)^2)."""
    n = 64
    u = (jnp.arange(n) + 0.5) / n * 2.0 - 1.0
    xx, yy = jnp.meshgrid(u, u)
    rho2 = xx ** 2 + yy ** 2
    amp = (rho2 <= 1.0).astype(jnp.float32)
    # balanced defocus: W = a (rho^2 - 1/2); rms over the disk = a / sqrt(12)
    for waves_rms in (0.02, 0.05, 0.08):
        a = waves_rms * np.sqrt(12.0) * WL
        opd = a * (rho2 - 0.5) * amp
        s = float(strehl_ratio(opd, amp, WL))
        expect = float(np.exp(-(2 * np.pi * waves_rms) ** 2))
        np.testing.assert_allclose(s, expect, atol=0.01)


def test_mtf_cutoff():
    """Diffraction MTF: unity at DC, ~zero beyond 1/(lambda F#)."""
    opd, amp = _disk_pupil(64)
    f_number = 4.0
    freqs, mtf_x, mtf_y = diffraction_mtf(opd, amp, WL, f_number, pad=4)
    freqs, mtf_x = np.asarray(freqs), np.asarray(mtf_x)
    assert abs(mtf_x[0] - 1.0) < 1e-5
    cutoff = 1.0 / (WL * f_number)
    beyond = mtf_x[freqs > 1.05 * cutoff]
    assert beyond.size and np.all(beyond < 0.01)
    # monotone-ish decline: halfway to cutoff the MTF is mid-range
    mid = mtf_x[np.argmin(np.abs(freqs - 0.5 * cutoff))]
    assert 0.2 < mid < 0.6


def test_parabola_psf_is_diffraction_limited(key):
    """End-to-end: trace a collimated bundle off a parabolic mirror
    (track_opl), bin the pupil, and confirm a diffraction-limited PSF
    (Strehl ~ 1 despite the f32 OPL floor of ~lambda/70 over 30 mm)."""
    scene = SequentialScene([ParabolicMirror(c1=0.025, d=10.0, name='m')])
    p = scene.init_params()
    n_side = 61
    u = np.linspace(-4.0, 4.0, n_side)
    xx, yy = np.meshgrid(u, u)
    keep = xx ** 2 + yy ** 2 <= 16.0
    x, y = xx[keep], yy[keep]
    pos = np.stack([x, y, np.full_like(x, 10.0)], -1)
    d = np.broadcast_to(np.array([0.0, 0.0, -1.0]), pos.shape)
    launch = Rays.create(pos, d)
    out, _, aux = scene.simulate(p, launch, key, track_opl=True)

    focus = jnp.asarray([0.0, 0.0, 20.0])
    opd, amp = pupil_from_trace(launch, out, aux['opl'], pupil_radius=4.0,
                                n=32, point=focus)
    s = float(strehl_ratio(opd, amp, WL))
    assert s > 0.97

    # the PSF's Airy core radius matches 1.22 lambda F# for f/2.5
    f_number = 20.0 / 8.0
    psf, dx = diffraction_psf(opd, amp, WL, f_number, pad=8)
    psf = np.asarray(psf)
    c = psf.shape[0] // 2
    cut = psf[c, c:c + 40]
    mins = np.where((cut[1:-1] < cut[:-2]) & (cut[1:-1] <= cut[2:]))[0] + 1
    airy_px = 1.22 * WL * f_number / float(dx)
    np.testing.assert_allclose(float(mins[0]), airy_px, rtol=0.2)


def test_polychromatic_psf_common_grid():
    """White-light PSF: single-wavelength case equals diffraction_psf,
    and the common-grid frequency scaling puts each component's Airy
    zero at 1.22 lambda F# on the SAME dx (so the red ring sits wider
    than the blue by lambda_r/lambda_b)."""
    from raytracetorch_tpu.utils.psf import polychromatic_psf

    opd, amp = _disk_pupil(48)
    fn = 4.0
    # degenerate single wavelength == monochromatic
    p1, dx1 = polychromatic_psf(opd, amp, [WL], [1.0], fn, pad=8)
    p0, dx0 = diffraction_psf(opd, amp, WL, fn, pad=8)
    np.testing.assert_allclose(float(dx1), float(dx0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-8)

    # three lines, equal weight: unit energy, centered peak, and the
    # polychromatic first minimum is washed out vs monochromatic
    wls = [0.45e-3, 0.55e-3, 0.65e-3]
    pp, dxp = polychromatic_psf(opd, amp, wls, [1, 1, 1], fn, pad=8)
    pp = np.asarray(pp)
    np.testing.assert_allclose(pp.sum(), 1.0, rtol=1e-5)
    c = pp.shape[0] // 2
    assert np.unravel_index(pp.argmax(), pp.shape) == (c, c)
    cut_mono = np.asarray(p0)[c, c:c + 40] / float(np.asarray(p0).max())
    cut_poly = pp[c, c:c + 40] / pp.max()
    airy_px = int(round(1.22 * WL * fn / float(dx0)))
    assert cut_poly[airy_px] > 3 * cut_mono[airy_px]   # zero filled in
