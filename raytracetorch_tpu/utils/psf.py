"""Diffraction PSF / MTF from traced optical path lengths (FFT method).

Physical-optics complement to the geometric MTF (utils/mtf.py): the traced
per-ray OPD (``track_opl=True``, utils/wavefront.py) is binned onto a pupil
grid, the complex pupil function ``A exp(i 2 pi W / lambda)`` is zero-padded
and Fourier-transformed, and ``|FFT|^2`` gives the diffraction point-spread
function — the standard "FFT PSF" of lens-design codes, valid for modest
numerical apertures where the Fraunhofer/Fourier-optics approximation holds.
The reference has no physical-optics layer (geometric spot diagrams only,
elements/sensor.py:67-176); this goes beyond it, like utils/wavefront.py.

TPU note: the transforms are computed as real cos/sin DFT matmuls on the
MXU rather than ``jnp.fft`` — complex64 is unsupported on some TPU
runtimes (the axon tunnel rejects any complex array), and at pupil-grid
sizes (N <= 1024) two [N, n] x [n, n] matmul pairs beat an FFT's memory
shuffles on the systolic array anyway.  Everything is jit- and grad-safe
except the pupil binning's scatter indices (stop-gradient like any
histogram).

Units: lengths in the trace's units (mm by convention); pass wavelength in
the SAME units (e.g. 0.5876e-3 for the helium d line in mm).
"""

from __future__ import annotations

import jax.numpy as jnp

from .wavefront import best_focus, opl_to_point


def _dft_mats(n_in, n_out, dtype=jnp.float32, alpha=1.0):
    """Real/imag parts of the centered DFT matrix E[u, x] =
    exp(-2 pi i alpha (u - n_out//2) x / n_out), shape [n_out, n_in] — the
    output index u is already 'fftshifted' (DC lands at n_out//2).
    ``alpha`` rescales the frequency grid: with alpha = lambda_ref/lambda
    every wavelength's PSF lands on the SAME physical image grid
    (pitch lambda_ref F# n/N), which is what lets polychromatic_psf sum
    incoherently without resampling."""
    u = jnp.arange(n_out) - n_out // 2
    x = jnp.arange(n_in)
    ang = (-2.0 * jnp.pi * alpha / n_out) * u[:, None] * x[None, :]
    return jnp.cos(ang).astype(dtype), jnp.sin(ang).astype(dtype)


def _mm(a, b):
    """Wave-stack matmul.  Pinned to precision='highest' because the TPU
    MXU's default single-pass bf16 destroys DFT chains (CLAUDE.md) — but
    an EXPLICIT ``jax.default_matmul_precision(...)`` context wins: the
    ambient config is part of the jit cache key, so e.g.
    ``with jax.default_matmul_precision('BF16_BF16_F32_X3'):`` trades
    ~2x MXU passes for ~2^-16 per-op rounding across the whole wave
    stack (measured tradeoff in BASELINE.md)."""
    import jax
    pinned = jax.config.jax_default_matmul_precision is None
    return jnp.matmul(a, b, precision='highest' if pinned else None)


def dft2_intensity(re, im, n_out, alpha=1.0):
    """|centered 2-D DFT|^2 of the complex field (re + i im) [n, n], zero-
    padded to n_out, via four real MXU matmuls per axis (no complex dtype)."""
    n = re.shape[0]
    C, S = _dft_mats(n, n_out, re.dtype, alpha)
    r1 = _mm(C, re) + _mm(S, im)          # rows transformed: E @ P
    i1 = _mm(C, im) - _mm(S, re)
    fr = _mm(r1, C.T) + _mm(i1, S.T)      # columns: (...) @ E^T
    fi = _mm(i1, C.T) - _mm(r1, S.T)
    return fr * fr + fi * fi


def pupil_from_trace(launch_rays, out_rays, opl, pupil_radius, n=64,
                     point=None, n_medium=1.0, weights=None):
    """Bin per-ray OPD + intensity onto an [n, n] pupil grid.

    ``launch_rays`` give each ray's pupil coordinate (its launch x/y for a
    collimated bundle filling the entrance pupil); ``out_rays``/``opl`` are
    the sequential-trace outputs with ``track_opl=True``.  The OPD is
    referenced to the intensity-weighted mean OPL at closest approach to
    ``point`` (default: the bundle's best focus).

    Returns ``(opd [n, n], amp [n, n])`` — amp is the per-cell weight sum
    normalized to peak 1 (the apodization); empty cells carry amp 0.
    """
    if point is None:
        point = best_focus(out_rays)
    total = opl_to_point(out_rays, opl, point, n_medium)
    w = out_rays.intensity if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    opd_ray = total - jnp.sum(total * w) / wsum

    u = launch_rays.px / pupil_radius
    v = launch_rays.py / pupil_radius
    ix = jnp.clip(((u + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(((v + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    den = jnp.zeros((n, n), w.dtype).at[iy, ix].add(w)
    num = jnp.zeros((n, n), w.dtype).at[iy, ix].add(w * opd_ray)
    opd = num / jnp.maximum(den, 1e-12)
    amp = den / jnp.maximum(jnp.max(den), 1e-12)
    return opd, amp


def diffraction_psf(opd, amp, wavelength, f_number, pad=4):
    """PSF intensity from a pupil-grid OPD map (Fraunhofer FFT).

    ``opd``/``amp`` are [n, n] pupil maps whose n cells span the full pupil
    diameter; ``f_number`` is the working f-number (focal distance over
    pupil diameter); ``pad`` zero-pads the FFT for image-plane resolution.

    Returns ``(psf [N, N], dx)`` with N = pad * n, PSF normalized to unit
    total energy, and dx the image-plane pixel pitch ``lambda * F# * n/N``
    (the Airy first zero lands at 1.22 lambda F# = 1.22 * pad pixels).
    """
    n = opd.shape[0]
    phase = 2.0 * jnp.pi * opd / wavelength
    psf = dft2_intensity(amp * jnp.cos(phase), amp * jnp.sin(phase),
                         pad * n)
    psf = psf / jnp.maximum(jnp.sum(psf), 1e-24)
    dx = wavelength * f_number * n / (pad * n)
    return psf, dx


def strehl_ratio(opd, amp, wavelength):
    """Peak of the aberrated PSF over the unaberrated peak (same pupil).

    Equals ``|sum A e^{i phi}|^2 / (sum A)^2`` — no FFT needed; for small
    aberrations approaches the Marechal estimate exp(-(2 pi sigma)^2).
    """
    phase = 2.0 * jnp.pi * opd / wavelength
    num = (jnp.sum(amp * jnp.cos(phase)) ** 2
           + jnp.sum(amp * jnp.sin(phase)) ** 2)
    den = jnp.maximum(jnp.sum(amp) ** 2, 1e-24)
    return num / den


def diffraction_mtf(opd, amp, wavelength, f_number, pad=4):
    """Diffraction MTF along x/y: normalized |FFT| of the PSF.

    Returns ``(freqs, mtf_x, mtf_y)`` in cycles per length unit; the
    incoherent cutoff is ``1 / (lambda * F#)``.
    """
    from .mtf import geometric_mtf
    psf, dx = diffraction_psf(opd, amp, wavelength, f_number, pad=pad)
    return geometric_mtf(psf, dx)


def polychromatic_psf(opds, amp, wavelengths, weights, f_number, pad=4):
    """Incoherent white-light PSF: the weighted sum of monochromatic PSFs
    on ONE physical image grid (each wavelength's DFT frequency axis is
    scaled by lambda_ref/lambda, so no resampling is needed).

    ``opds`` is one [n, n] OPD map shared by all wavelengths, or a list
    with one map per wavelength (chromatic aberration from per-wavelength
    traces).  ``wavelengths`` must be static Python floats (they scale
    the DFT matrices); ``weights`` may be traced — the function is jit-
    and grad-safe w.r.t. opds/amp/weights.

    Returns ``(psf [N, N], dx)`` normalized to unit energy.  The common
    pixel pitch dx (= alpha * lam * F# * n/N for every line) is
    referenced to the SHORTEST wavelength so each line's frequency scale
    alpha = lam_ref/lam <= 1 — an alpha > 1 would sample the pupil DTFT
    past its period and alias that line's PSF back into the frame edges.
    """
    wavelengths = [float(w) for w in wavelengths]
    if isinstance(opds, (list, tuple)) and len(opds) != len(wavelengths):
        raise ValueError("opds list length must match wavelengths")
    weights = jnp.asarray(weights, jnp.float32)
    weights = weights / jnp.maximum(jnp.sum(weights), 1e-12)
    lam_ref = min(wavelengths)
    if not isinstance(opds, (list, tuple)):
        opds = [opds] * len(wavelengths)
    n = opds[0].shape[0]
    total = None
    for opd, lam, w in zip(opds, wavelengths, list(weights)):
        phase = 2.0 * jnp.pi * opd / lam
        p = dft2_intensity(amp * jnp.cos(phase), amp * jnp.sin(phase),
                           pad * n, alpha=lam_ref / lam)
        p = w * p / jnp.maximum(jnp.sum(p), 1e-24)
        total = p if total is None else total + p
    dx = lam_ref * f_number * n / (pad * n)
    return total, dx


def vector_pupil_from_trace(launch_rays, out_rays, opl, field,
                            pupil_radius, n=64, point=None, n_medium=1.0):
    """Bin the transported E-field onto the pupil grid (the vector
    analog of :func:`pupil_from_trace`; beyond the reference — no
    polarization tooling exists there).

    ``field`` is the trace's FieldState (``track_field=True`` together
    with ``track_opl=True``).  Each output ray's field is projected
    onto the parallel-transported exit transverse basis (x_hat off d,
    like ``utils.polarization.jones_pupil``), intensity-weight-summed
    per pupil cell, and normalized so a unit x-polarized neutral system
    reproduces ``pupil_from_trace``'s amp exactly.

    Returns ``(opd [n, n], comps)`` with comps =
    ((Ex_re, Ex_im), (Ey_re, Ey_im)) cell maps.
    """
    from ..geom import vec3 as v3
    from .wavefront import best_focus, opl_to_point

    if point is None:
        point = best_focus(out_rays)
    total = opl_to_point(out_rays, opl, point, n_medium)
    w = out_rays.intensity
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    opd_ray = total - jnp.sum(total * w) / wsum

    d = out_rays.dir_c
    bx = (1.0 - d[0] * d[0], -d[0] * d[1], -d[0] * d[2])
    nrm = 1.0 / jnp.sqrt(jnp.maximum(v3.dot(bx, bx), 1e-24))
    bx = tuple(c * nrm for c in bx)
    by = (d[1] * bx[2] - d[2] * bx[1],
          d[2] * bx[0] - d[0] * bx[2],
          d[0] * bx[1] - d[1] * bx[0])
    Er, Ei = field.r_c, field.i_c
    comps_ray = (v3.dot(Er, bx), v3.dot(Ei, bx),
                 v3.dot(Er, by), v3.dot(Ei, by))

    u = launch_rays.px / pupil_radius
    v = launch_rays.py / pupil_radius
    ix = jnp.clip(((u + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    iy = jnp.clip(((v + 1.0) * 0.5 * n).astype(jnp.int32), 0, n - 1)
    den = jnp.zeros((n, n), w.dtype).at[iy, ix].add(w)
    num = jnp.zeros((n, n), w.dtype).at[iy, ix].add(w * opd_ray)
    opd = num / jnp.maximum(den, 1e-12)

    maps = [jnp.zeros((n, n), w.dtype).at[iy, ix].add(w * c)
            for c in comps_ray]
    # normalize by the RAY-DENSITY peak (pupil_from_trace's amp
    # convention), NOT the field peak: polarization losses live in |E|
    # and must survive into the PSF energy (a per-config field-peak
    # normalization would silently undo every analyzer)
    peak = jnp.maximum(jnp.max(den), 1e-12)
    maps = [m / peak for m in maps]
    return opd, ((maps[0], maps[1]), (maps[2], maps[3]))


def vector_psf(opd, comps, wavelength, f_number, pad=4):
    """Polarization-resolved Fraunhofer PSF: the incoherent sum of the
    two transverse field components' coherent diffraction integrals,

        PSF = |F{Ex e^{i phi}}|^2 + |F{Ey e^{i phi}}|^2.

    UNNORMALIZED — the total is proportional to the transmitted
    polarized energy, so pupil-filter configurations compare directly
    (a 45-degree analyzer halves it, crossed analyzers null it;
    tests/test_vector_psf.py).  Same (psf, dx) contract as
    :func:`diffraction_psf` otherwise.
    """
    n = opd.shape[0]
    phase = 2.0 * jnp.pi * opd / wavelength
    cph, sph = jnp.cos(phase), jnp.sin(phase)
    total = 0.0
    for (er, ei) in comps:
        total = total + dft2_intensity(er * cph - ei * sph,
                                       er * sph + ei * cph, pad * n)
    dx = wavelength * f_number * n / (pad * n)
    return total, dx


def dft2_field(re, im, n_out, alpha=1.0):
    """Centered 2-D DFT of the complex field (re + i im) as an
    (re, im) pair — the amplitude-level sibling of
    :func:`dft2_intensity` (complex-free for the TPU runtime).

    BOTH axes are centered (input x about n_in/2, output u about
    n_out/2): intensity doesn't care about the shift-theorem phase
    ramp, but amplitude-level overlaps (fiber coupling) would be
    destroyed by it."""
    n_in = re.shape[0]
    u = jnp.arange(n_out) - n_out // 2
    x = jnp.arange(n_in) - (n_in - 1) / 2.0
    ang = (-2.0 * jnp.pi * alpha / n_out) * u[:, None] * x[None, :]
    C = jnp.cos(ang).astype(re.dtype)
    S = jnp.sin(ang).astype(re.dtype)
    r1 = _mm(C, re) + _mm(S, im)
    i1 = _mm(C, im) - _mm(S, re)
    fr = _mm(r1, C.T) + _mm(i1, S.T)
    fi = _mm(i1, C.T) - _mm(r1, S.T)
    return fr, fi


def encircled_energy(psf, dx, radii):
    """Fraction of total PSF energy inside each radius (the standard
    image-quality metric; the reference has no physical-optics layer).

    ``psf`` [N, N] centered at N//2 with pixel pitch ``dx`` (both as
    returned by :func:`diffraction_psf`); ``radii`` is a 1-D array in
    the same units.  Returns EE(radii).  For an unaberrated circular
    pupil this reproduces the Airy closed form
    1 - J0^2(v) - J1^2(v), v = pi r / (lambda F#)
    (tests/test_psf_metrics.py).
    """
    n = psf.shape[0]
    c = n // 2
    ax = (jnp.arange(n) - c) * dx
    r2 = ax[None, :] ** 2 + ax[:, None] ** 2
    radii = jnp.atleast_1d(jnp.asarray(radii, psf.dtype))
    inside = r2[None] <= radii[:, None, None] ** 2
    tot = jnp.maximum(jnp.sum(psf), 1e-24)
    return jnp.sum(jnp.where(inside, psf[None], 0.0), axis=(1, 2)) / tot


def fiber_coupling(opd, amp, wavelength, f_number, mode_radius, pad=8,
                   offset=(0.0, 0.0)):
    """Coupling efficiency into a single-mode fiber: the normalized
    overlap integral |<E_focal | E_mode>|^2 between the focal-plane
    field (amplitude-level Fraunhofer transform of the pupil) and a
    Gaussian mode of 1/e^2 INTENSITY radius ``mode_radius`` centered at
    ``offset`` in the image plane.

    For an unaberrated circular pupil the optimum sits at
    mode_radius = 0.714 lambda F# with eta = 81.45% — the textbook
    Airy-to-Gaussian limit (back-propagated mode a/w_p = 1.121 at the
    pupil) — and aberrations/defocus reduce it
    (tests/test_psf_metrics.py).  Differentiable in everything, so
    jax.grad can design FOR coupling.
    """
    n = opd.shape[0]
    n_out = pad * n
    phase = 2.0 * jnp.pi * opd / wavelength
    fr, fi = dft2_field(amp * jnp.cos(phase), amp * jnp.sin(phase), n_out)
    dx = wavelength * f_number * n / n_out
    c = n_out // 2
    ax = (jnp.arange(n_out) - c) * dx
    gx = jnp.exp(-((ax - offset[0]) / mode_radius) ** 2)
    gy = jnp.exp(-((ax - offset[1]) / mode_radius) ** 2)
    mode = gy[:, None] * gx[None, :]          # amplitude profile
    num = (jnp.sum(fr * mode) ** 2 + jnp.sum(fi * mode) ** 2)
    den = (jnp.sum(fr * fr + fi * fi) * jnp.sum(mode * mode))
    return num / jnp.maximum(den, 1e-24)
