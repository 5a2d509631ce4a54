"""Geometric MTF from sensor irradiance grids.

The modulation transfer function estimated as the normalized magnitude of
the Fourier transform of the geometric point-spread function (the sensor's
irradiance image of a point/collimated source).  Valid where geometric
blur dominates diffraction — the regime a ray tracer models.
"""

from __future__ import annotations

import jax.numpy as jnp


def _dft_mag(marginal, k, denom):
    """|DFT| of a 1-D marginal at frequencies j/(denom * pitch) for
    j < k, as a real cos/sin matmul (complex64 is unsupported on some
    TPU runtimes — the axon tunnel rejects any complex array; see
    utils/psf.py).  ``denom`` sets the frequency grid independently of
    the marginal's length so x and y share one axis."""
    n = marginal.shape[0]
    ang = (-2.0 * jnp.pi / denom) * jnp.arange(k)[:, None] * \
        jnp.arange(n)[None, :]
    re = jnp.matmul(jnp.cos(ang), marginal, precision='highest')
    im = jnp.matmul(jnp.sin(ang), marginal, precision='highest')
    return jnp.sqrt(re * re + im * im + 1e-30)


def geometric_mtf(psf, pixel_pitch):
    """MTF along x and y from a [H, W] PSF image.

    Returns (freqs_cyc_per_unit [K], mtf_x [K], mtf_y [K]) with K = W//2;
    both curves are sampled on the SAME frequency grid k/(W*pitch) (the
    y-marginal's DFT is evaluated at those frequencies explicitly, so a
    non-square PSF does not stretch the y curve); frequencies in cycles
    per length unit of ``pixel_pitch``.
    """
    psf = jnp.maximum(psf, 0.0)
    total = jnp.maximum(jnp.sum(psf), 1e-12)
    h, w = psf.shape
    k = w // 2
    # the OTF's x/y axis cuts are the DFTs of the PSF's marginals
    mtf_x = _dft_mag(jnp.sum(psf / total, axis=0), k, w)
    mtf_y = _dft_mag(jnp.sum(psf / total, axis=1), k, w)
    freqs = jnp.arange(k) / (w * pixel_pitch)
    return freqs, mtf_x, mtf_y


def mtf50(freqs, mtf):
    """Frequency where the MTF first drops below 0.5 (linear interp)."""
    below = mtf < 0.5
    idx = jnp.argmax(below)
    idx = jnp.clip(idx, 1, mtf.shape[0] - 1)
    f0, f1 = freqs[idx - 1], freqs[idx]
    m0, m1 = mtf[idx - 1], mtf[idx]
    t = (0.5 - m0) / jnp.where(jnp.abs(m1 - m0) < 1e-12, 1e-12, m1 - m0)
    return f0 + t * (f1 - f0)
