"""Atmospheric turbulence screens (utils/turbulence.py).

Anchors: the ensemble structure function follows the published
Kolmogorov law 6.88 (r/r0)^(5/3) in the inertial range; the
long-exposure OTF through the screens equals the diffraction OTF times
exp(-D_phi(lambda f)/2) — the exact Gaussian-phase result, checked
against the SAME ensemble's measured structure function, so no outer-
scale convention can fake it; and the seeing-limited PSF is an order
of magnitude wider than the diffraction core at D/r0 = 32."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu.utils.turbulence import (kolmogorov_screens,
                                                long_exposure_psf)

WL = 0.5e-3


def _structure_fn(scr, sep_px):
    d = scr[:, :, sep_px:] - scr[:, :, :-sep_px]
    return float((d ** 2).mean())


def test_structure_function_inertial_range():
    """D(r) = 6.88 (r/r0)^(5/3) for r well inside the outer scale
    (finite-grid + von Karman effects pull it low beyond r ~ L0/20;
    the module docstring documents the caveat)."""
    n, dx, r0, L0 = 256, 0.05, 0.5, 3.2
    scr = np.asarray(kolmogorov_screens(jax.random.PRNGKey(0), n, dx,
                                        r0, L0=L0, n_screens=40))
    assert scr.shape == (40, n, n)
    for sep in (1, 2):                       # r/L0 <= 0.03
        r = sep * dx
        ratio = _structure_fn(scr, sep) / (6.88 * (r / r0) ** (5.0 / 3.0))
        assert 0.85 < ratio < 1.25, (sep, ratio)
    # r0 scaling: quadrupling r0 cuts D by 4^(5/3)
    scr2 = np.asarray(kolmogorov_screens(jax.random.PRNGKey(0), n, dx,
                                         4 * r0, L0=L0, n_screens=40))
    np.testing.assert_allclose(
        _structure_fn(scr, 2) / _structure_fn(scr2, 2),
        4.0 ** (5.0 / 3.0), rtol=0.05)


def test_long_exposure_otf_is_diffraction_times_atmosphere():
    """The exact Gaussian-phase result: long-exposure OTF =
    diffraction OTF x exp(-D_phi(lambda f)/2), with D_phi MEASURED
    from the same screen ensemble (OTF bin j maps to pupil separation
    j*dx, since the PSF pixel is lambda/(pad n dx))."""
    n, dx, pad = 128, 0.025, 2
    r0, L0 = 0.4, 1.6
    ax = (jnp.arange(n) - n // 2) * dx
    amp = ((ax[:, None] ** 2 + ax[None, :] ** 2)
           <= 1.2 ** 2).astype(jnp.float32)

    key = jax.random.PRNGKey(3)
    psf, _ = long_exposure_psf(key, amp, dx, WL, r0, n_screens=64,
                               L0=L0, pad=pad)
    psf0, _ = long_exposure_psf(key, amp, dx, WL, 1e9, n_screens=1,
                                L0=L0, pad=pad)          # no turbulence
    otf = np.abs(np.fft.fft2(np.fft.ifftshift(np.asarray(psf))))
    otf0 = np.abs(np.fft.fft2(np.fft.ifftshift(np.asarray(psf0))))

    scr = np.asarray(kolmogorov_screens(key, n, dx, r0, L0=L0,
                                        n_screens=64))
    for j in (1, 2, 3):
        # the PSF spans N dtheta = lambda/dx of angle, so OTF bin j
        # sits at angular frequency j dx / lambda <-> pupil separation
        # r = j * dx = j screen pixels, independent of pad
        D = _structure_fn(scr, j)
        t_model = np.exp(-0.5 * D)
        t_meas = otf[0, j] / otf0[0, j]
        assert abs(t_meas - t_model) < 0.12, (j, t_meas, t_model)


def test_seeing_limited_psf_width():
    """D/r0 = 32: the long-exposure FWHM lands within the physical
    seeing band (finite L0 narrows the pure-Kolmogorov 0.98 lam/r0 —
    Tokovinin 2002 — so assert the band, and that it dwarfs the
    diffraction core)."""
    n, dx = 256, 0.02
    ax = (jnp.arange(n) - n // 2) * dx
    amp = ((ax[:, None] ** 2 + ax[None, :] ** 2)
           <= 1.6 ** 2).astype(jnp.float32)
    r0 = 0.1
    psf, dth = long_exposure_psf(jax.random.PRNGKey(1), amp, dx, WL,
                                 r0, n_screens=40, L0=2.0)
    p = np.asarray(psf)
    row = p[p.shape[0] // 2]
    fwhm = float((row > 0.5 * row.max()).sum()) * float(dth)
    seeing = 0.98 * WL / r0
    diffraction = 1.03 * WL / 3.2
    assert 0.4 * seeing < fwhm < 1.1 * seeing, (fwhm, seeing)
    assert fwhm > 10.0 * diffraction
