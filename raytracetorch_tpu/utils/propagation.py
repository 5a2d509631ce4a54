"""Scalar free-space wave propagation: angular spectrum + Fresnel TF.

Plane-to-plane propagation of sampled complex fields — the physical-
optics layer between the traced exit pupil (utils/psf.py builds the
focal-plane field from ray OPDs) and anywhere else on the axis:
through-focus PSF stacks, Talbot self-imaging, near-field diffraction
of apertures.  The torch reference has no wave-optics propagation at
all (rays only — reference README and elements/sensor.py:67-176 spot
statistics); this extends the beyond-reference Fourier layer started
in utils/psf.py.

TPU-first design notes
----------------------
* Complex fields travel as ``(re, im)`` float pairs end-to-end — the
  axon TPU tunnel rejects ANY complex array (CLAUDE.md), and split
  storage also keeps every op on the fast real VPU/MXU paths.
* Transforms are separable DFT MATMULS on the MXU, not FFTs: at the
  field sizes optical analysis uses (<= 1024 per axis) two [N, N] x
  [N, N] matmul pairs per axis run at systolic-array speed, keep
  shapes static, and are exactly reverse-differentiable (the DFT
  matrix is its own linearization) — ``jax.grad`` flows through a
  propagation the same as through any matmul chain.
* The transfer function is built on the WRAPPED (fftfreq-ordered)
  frequency grid so no fftshift data movement is ever performed.
* Every sqrt is double-where'd per the repo numerical rules: the
  evanescent boundary (q == 0 exactly) would otherwise inject
  0 * inf NaNs into gradients.

Conventions: lengths in the trace's units (mm); ``wavelength`` in the
SAME units; ``dx`` is the sample pitch of the field grid.  The global
carrier phase exp(i 2 pi n dz / wavelength) is OMITTED from both
propagators (it is intensity-invisible and at mm/um scale ratios it
wraps millions of times — keeping it would only add float noise);
``angular_spectrum`` therefore returns the field in the co-moving
frame, i.e. kz - k carrier removed.
"""

from __future__ import annotations

import jax.numpy as jnp

from .psf import _mm, dft2_field

__all__ = ['angular_spectrum', 'fresnel_transfer', 'fresnel_single_ft',
           'through_focus_psf', 'grating_field', 'vector_angular_spectrum',
           'longitudinal_field']


def _dft_mats_std(n, dtype=jnp.float32):
    """(cos, sin) of the standard DFT matrix exp(-2 pi i k x / n) —
    non-centered, so the conjugate frequency axis is fftfreq-ordered
    (DC at index 0, negative frequencies in the top half) and the
    transfer function needs no shifts."""
    k = jnp.arange(n, dtype=dtype)
    ang = (-2.0 * jnp.pi / n) * k[:, None] * k[None, :]
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _dft2(re, im, Ch, Sh, Cw, Sw, inverse=False):
    """Separable 2-D DFT of (re + i im) via eight real matmuls.  The
    inverse flips the sign convention (conjugate matrices) and applies
    the 1/(H W) normalization."""
    if inverse:
        Sh, Sw = -Sh, -Sw
    r1 = _mm(Ch, re) + _mm(Sh, im)        # rows:    E @ U
    i1 = _mm(Ch, im) - _mm(Sh, re)
    fr = _mm(r1, Cw.T) + _mm(i1, Sw.T)    # columns: (...) @ E^T
    fi = _mm(i1, Cw.T) - _mm(r1, Sw.T)
    if inverse:
        s = 1.0 / (re.shape[0] * re.shape[1])
        return fr * s, fi * s
    return fr, fi


def _fftfreq(n, dx, dtype=jnp.float32):
    """fftfreq-ordered spatial frequencies [cycles / length unit]."""
    k = jnp.arange(n)
    k = jnp.where(k > n // 2 - (1 - n % 2), k - n, k)  # wrap top half
    return (k / (n * dx)).astype(dtype)


def _apply_transfer(re, im, Hre, Him):
    """IDFT( DFT(U) * H ) with H given on the wrapped frequency grid."""
    H, W = re.shape
    Ch, Sh = _dft_mats_std(H, re.dtype)
    Cw, Sw = (Ch, Sh) if W == H else _dft_mats_std(W, re.dtype)
    fr, fi = _dft2(re, im, Ch, Sh, Cw, Sw)
    gr = fr * Hre - fi * Him
    gi = fr * Him + fi * Hre
    return _dft2(gr, gi, Ch, Sh, Cw, Sw, inverse=True)


def angular_spectrum(re, im, dx, wavelength, dz, n_medium=1.0):
    """Exact (non-paraxial) free-space propagation by ``dz``.

    Decomposes the field into plane waves and advances each by its true
    axial phase ``2 pi dz sqrt((n/lambda)^2 - fx^2 - fy^2)`` (carrier
    removed — see module docstring); frequencies beyond the propagating
    circle decay as real exponentials.  Evanescent components are
    attenuated with ``|dz|`` for BOTH signs of ``dz`` — exact inverse
    propagation would amplify them unboundedly (the classic ill-posed
    inverse-diffraction instability), so a round trip reconstructs the
    propagating band only.

    Args: ``(re, im)`` the [H, W] field as a float pair, ``dx`` its
    sample pitch, ``dz`` the propagation distance (either sign).
    Returns the propagated ``(re, im)``.  Power in the propagating band
    is conserved exactly (the transfer function is unimodular there).
    """
    H, W = re.shape
    fy = _fftfreq(H, dx, re.dtype)[:, None]
    fx = _fftfreq(W, dx, re.dtype)[None, :]
    q = (n_medium / wavelength) ** 2 - fx * fx - fy * fy
    prop = q > 0.0
    kz = jnp.sqrt(jnp.where(prop, q, 1.0) + 1e-24)
    kappa = jnp.sqrt(jnp.where(prop, 1.0, -q) + 1e-24)
    # carrier-removed axial phase 2 pi dz (kz - n/lambda), computed in
    # the cancellation-stable form -(fx^2+fy^2)/(kz + n/lambda): the
    # direct f32 subtraction loses ~4 digits at low spatial frequency
    # (kz ~ n/lambda ~ 2000 cyc/mm at visible-in-mm scales, so its f32
    # rounding of ~1e-4 rivals the whole difference at fx ~ 1 cyc/mm —
    # ~lambda/100 of spurious low-order wavefront per 100 mm hop)
    phase = (2.0 * jnp.pi * dz) * jnp.where(
        prop, -(fx * fx + fy * fy) / (kz + n_medium / wavelength), 0.0)
    decay = jnp.where(prop, 1.0,
                      jnp.exp(-2.0 * jnp.pi * jnp.abs(dz) * kappa))
    Hre = jnp.cos(phase) * decay
    Him = jnp.sin(phase) * decay
    return _apply_transfer(re, im, Hre, Him)


def fresnel_transfer(re, im, dx, wavelength, dz):
    """Paraxial (Fresnel) transfer-function propagation by ``dz``:
    ``H = exp(-i pi lambda dz (fx^2 + fy^2))`` (carrier removed).
    Valid when the field's angular content stays well inside the
    propagating circle; agrees with :func:`angular_spectrum` to
    O((lambda f)^4 dz) there and is a touch cheaper (no sqrt image).
    """
    H, W = re.shape
    fy = _fftfreq(H, dx, re.dtype)[:, None]
    fx = _fftfreq(W, dx, re.dtype)[None, :]
    phase = (-jnp.pi * wavelength * dz) * (fx * fx + fy * fy)
    return _apply_transfer(re, im, jnp.cos(phase), jnp.sin(phase))


def fresnel_single_ft(re, im, dx, wavelength, dz, dx_out=None):
    """Single-FT (scaled) Fresnel propagation: chirp - DFT - chirp.

    The transfer-function propagators keep the sample pitch, which
    makes a fast telescope unrepresentable (a 60 mm pupil needs the
    window, its 3 um Airy core needs the pitch — 20k+ samples).  The
    single-FT Fresnel integral instead LANDS on a new pitch: the
    natural ``dx_out = lambda |dz| / (N dx)``, or any finer/coarser
    ``dx_out`` you pass (the DFT frequency axis is rescaled by
    ``alpha = N dx dx_out / (lambda dz)`` — the same trick
    polychromatic_psf uses).  Ideal for the pupil -> focal-plane hop of
    fast systems; the quadratic input chirp must be sampled:
    ``dx^2 N >~ lambda |dz|`` (caller's responsibility — dz may be
    traced, so this cannot be asserted here).

    Returns ``(re2, im2, dx_out)``.  The 1/(i lambda dz) carrier is
    dropped (global phase); the 1/(lambda dz) AMPLITUDE is kept, so
    power is conserved: sum|U2|^2 dx_out^2 = sum|U1|^2 dx^2 when the
    chirped field is band-contained.
    """
    H, W = re.shape
    assert H == W, 'fresnel_single_ft needs a square grid'
    n = H
    lam_dz = wavelength * dz
    if dx_out is None:
        dx_out = wavelength * jnp.abs(dz) / (n * dx)
    # input chirp exp(+i pi r^2 / (lam dz))
    xi = (jnp.arange(n, dtype=re.dtype) - (n - 1) / 2.0) * dx
    r2 = xi[None, :] ** 2 + xi[:, None] ** 2
    ph1 = (jnp.pi / lam_dz) * r2
    c1, s1 = jnp.cos(ph1), jnp.sin(ph1)
    gr = re * c1 - im * s1
    gi = re * s1 + im * c1
    alpha = n * dx * dx_out / lam_dz
    fr, fi = dft2_field(gr, gi, n, alpha=alpha)
    # output chirp exp(+i pi u^2 / (lam dz)) + amplitude dx^2/(lam |dz|)
    uo = (jnp.arange(n, dtype=re.dtype) - n // 2) * dx_out
    ph2 = (jnp.pi / lam_dz) * (uo[None, :] ** 2 + uo[:, None] ** 2)
    a = dx * dx / (wavelength * jnp.abs(dz))
    c2, s2 = a * jnp.cos(ph2), a * jnp.sin(ph2)
    return fr * c2 - fi * s2, fr * s2 + fi * c2, dx_out


def through_focus_psf(opd, amp, wavelength, f_number, zs, pad=4):
    """Through-focus PSF stack from a traced pupil: the focal-plane
    complex field (utils/psf.py::dft2_field on the pupil function) is
    angular-spectrum propagated to each defocus in ``zs``.

    Unlike the pupil-defocus-term shortcut (adding W020 r^2 to the
    OPD), this is true axial propagation of the focused field — it
    keeps the full non-paraxial defocus behavior and any pupil
    apodization exactly.

    Args: ``opd``/``amp`` [n, n] pupil maps (pupil_from_trace),
    ``f_number`` the working f-number, ``zs`` [K] defocus distances
    (same units as wavelength; either sign).  Returns ``(stack, dx)``:
    ``stack`` [K, N, N] intensity with N = pad * n, each plane
    normalized so the in-focus plane has unit total energy, and ``dx``
    the image pitch ``lambda F# / pad``.
    """
    import jax

    n = opd.shape[0]
    phase = 2.0 * jnp.pi * opd / wavelength
    fre, fim = dft2_field(amp * jnp.cos(phase), amp * jnp.sin(phase),
                          pad * n)
    norm = jnp.maximum(jnp.sum(fre * fre + fim * fim), 1e-24)
    dx = wavelength * f_number / pad

    def plane(dz):
        r, i = angular_spectrum(fre, fim, dx, wavelength, dz)
        return (r * r + i * i) / norm

    return jax.vmap(plane)(jnp.asarray(zs)), dx


def vector_angular_spectrum(ex, ey, dx, wavelength, dz, n_medium=1.0):
    """Vector free-space propagation of the transverse field.

    Each Cartesian component of E satisfies the scalar Helmholtz
    equation, so the transverse pair propagates with the SCALAR
    angular-spectrum transfer — the vector content is that the pair
    determines Ez through transversality (:func:`longitudinal_field`).
    ``ex``/``ey`` are (re, im) tuples; returns the propagated tuples.
    """
    return (angular_spectrum(ex[0], ex[1], dx, wavelength, dz, n_medium),
            angular_spectrum(ey[0], ey[1], dx, wavelength, dz, n_medium))


def longitudinal_field(ex, ey, dx, wavelength, n_medium=1.0):
    """Ez of a forward-propagating field from its transverse pair.

    Maxwell's div E = 0 fixes the longitudinal component per plane
    wave: ``Ez = -(fx Ex + fy Ey) / fz`` with ``fz = sqrt((n/lam)^2 -
    fx^2 - fy^2)`` — the physics behind the tight-focus "longitudinal
    needle" of radially polarized beams (|Ez|/|Et| ~ NA).  Evanescent
    components are dropped.  ``ex``/``ey`` are (re, im) tuples; returns
    the (re, im) of Ez on the same grid.
    """
    exr, exi = ex
    eyr, eyi = ey
    H, W = exr.shape
    Ch, Sh = _dft_mats_std(H, exr.dtype)
    Cw, Sw = (Ch, Sh) if W == H else _dft_mats_std(W, exr.dtype)
    fy = _fftfreq(H, dx, exr.dtype)[:, None]
    fx = _fftfreq(W, dx, exr.dtype)[None, :]
    q = (n_medium / wavelength) ** 2 - fx * fx - fy * fy
    prop = q > 0.0
    fz = jnp.sqrt(jnp.where(prop, q, 1.0) + 1e-24)
    gx = jnp.where(prop, -fx / fz, 0.0)
    gy = jnp.where(prop, -fy / fz, 0.0)
    fxr, fxi = _dft2(exr, exi, Ch, Sh, Cw, Sw)
    fyr, fyi = _dft2(eyr, eyi, Ch, Sh, Cw, Sw)
    zr = gx * fxr + gy * fyr
    zi = gx * fxi + gy * fyi
    return _dft2(zr, zi, Ch, Sh, Cw, Sw, inverse=True)


def grating_field(n, period_px, duty=0.5, dtype=jnp.float32):
    """Binary amplitude grating test field [n, n] as a (re, im) pair —
    the canonical Talbot-carpet input (self-images at z_T = 2 p^2 /
    lambda).  ``period_px`` in samples; bars run along y."""
    x = jnp.arange(n)
    bar = ((x % period_px) < duty * period_px).astype(dtype)
    re = jnp.broadcast_to(bar[None, :], (n, n))
    return re, jnp.zeros_like(re)
