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


def slanted_edge_mtf(image, pixel_pitch, angle_deg, oversample=4,
                     span_frac=0.35):
    """Measured MTF from an image of a SLANTED EDGE through the image
    center (the ISO-12233 e-SFR method, complex-free).

    Every pixel's signed distance to the edge line (direction
    ``(sin a, cos a)`` from vertical, ``a = angle_deg``) projects the 2-D
    image onto an ``oversample``-times-finer edge-spread function — the
    slant phase-diversifies the pixel grid, which is what beats the
    native Nyquist.  The ESF is bin-averaged, differentiated to the line
    -spread function, Hamming-windowed and DFT'd by real cos/sin matmuls
    (no complex dtype — the axon tunnel constraint, as in
    :func:`geometric_mtf`).

    Args: ``image [H, W]`` containing one dark->bright edge;
    ``pixel_pitch`` in length units; ``angle_deg`` the KNOWN slant
    (synthetic targets; typical 2-8 deg); ``span_frac`` the analyzed
    half-width as a fraction of min(H, W) (keeps 'same'-padding
    convolution artifacts at the frame edge out of the ESF).

    Returns ``(freqs, mtf)`` with the MTF normalized at DC and ``freqs``
    in cycles per length unit up to the original pixel Nyquist.
    Cross-check: on an edge blurred by a traced PSF this reproduces
    utils/psf.py::diffraction_mtf of the same pupil maps
    (tests/test_imaging_field.py)."""
    img = jnp.asarray(image, jnp.float32)
    H, W = img.shape
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    yy = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xx = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    # signed pixel distance to the edge line through the center
    s = xx[None, :] * jnp.cos(a) - yy[:, None] * jnp.sin(a)
    smax = span_frac * min(H, W)
    nb = int(2 * smax * oversample)
    idx = jnp.clip(((s + smax) * oversample).astype(jnp.int32), 0, nb - 1)
    keep = ((s > -smax) & (s < smax)).astype(jnp.float32)
    num = jnp.zeros((nb,), jnp.float32).at[idx.ravel()].add(
        (img * keep).ravel())
    den = jnp.zeros((nb,), jnp.float32).at[idx.ravel()].add(keep.ravel())
    # fill the (rare) empty bins with the running neighborhood mean so
    # the derivative doesn't spike: blend each bin toward a 3-bin sum
    esf = num / jnp.maximum(den, 1e-12)
    has = den > 0
    esf = jnp.where(has, esf, 0.5 * (jnp.roll(esf, 1) + jnp.roll(esf, -1)))
    lsf = esf[1:] - esf[:-1]
    n = lsf.shape[0]
    win = 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * jnp.arange(n) / (n - 1))
    lsf = lsf * win
    # frequency grid: j / (nb * sub-pitch) up to the ORIGINAL Nyquist
    sub = pixel_pitch / oversample
    k = max(int(n / (2 * oversample)), 8)
    mag = _dft_mag(lsf, k, n)
    mtf = mag / jnp.maximum(mag[0], 1e-12)
    freqs = jnp.arange(k) / (n * sub)
    return freqs, mtf
