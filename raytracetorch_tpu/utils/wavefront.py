"""Wavefront analysis from accumulated optical path lengths.

Uses the ``track_opl=True`` output of a sequential trace (``aux['opl']``):
the OPL of each ray from its launch plane to its final position, with the
per-ray medium updated through every refraction (including dispersion and
TIR).  For an aberration-free system imaging a collimated bundle to a
point F, Fermat's principle makes ``opl_i + n * d_i(F)`` identical across
the pupil, where ``d_i(F)`` is the remaining distance from the ray's final
position to its closest approach to F.  The spread of that quantity is the
wavefront error.
"""

from __future__ import annotations

import jax.numpy as jnp


def best_focus(rays):
    """Least-squares point of closest approach of a ray bundle (the 'point
    of least confusion' the reference estimates via SVD in
    tests/test_ideal.py:14-52), in closed form.

    Minimizes sum_i |(F - p_i) - ((F - p_i).d_i) d_i|^2 over F.
    """
    p = rays.pos
    d = rays.dir
    eye = jnp.eye(3)
    proj = eye[None] - d[:, :, None] * d[:, None, :]       # [N, 3, 3]
    A = jnp.sum(proj, axis=0)
    b = jnp.sum(jnp.einsum('nij,nj->ni', proj, p), axis=0)
    return jnp.linalg.solve(A, b)


def opl_to_point(rays, opl, point, n_medium=1.0):
    """Total OPL of each ray continued to its closest approach to ``point``.
    Constant across rays for perfect imaging at ``point``."""
    px = rays.pos - point[None, :]
    t_close = -jnp.sum(px * rays.dir, axis=1)
    return opl + n_medium * t_close


def wavefront_rms(rays, opl, point=None, weights=None, n_medium=1.0,
                  refocus=False):
    """Intensity-weighted RMS optical-path-difference about ``point``
    (default: the bundle's best focus), in the trace's length units.
    Divide by the wavelength for waves.

    ``refocus=True`` re-solves the reference point itself for minimum OPD
    variance: moving the reference by dF changes each ray's
    ``opl_to_point`` by exactly ``n (d_i . dF)`` (closest approach is
    linear in F), so projecting out the span of [1, dx, dy, dz] removes
    piston AND the tilt/defocus a better reference sphere would absorb —
    the RMS wavefront error a designer reports.  The transverse-ray
    ``best_focus`` default can differ from the OPD optimum by several
    waves of tilt on asymmetric systems (examples/20_zernike_corrector).
    """
    if point is None:
        point = best_focus(rays)
    total = opl_to_point(rays, opl, point, n_medium)
    w = rays.intensity if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(total * w) / wsum
    tc = total - mean
    if refocus:
        # weighted LS of (centered) total onto centered/normalized
        # (dx, dy, dz) via 3x3 normal equations of planar [N] reductions
        # (an [N, 4] design matrix would waste 124/128 TPU lanes, and the
        # raw [1, dz] pair is near-collinear in f32 — dz ~ 1)
        def cnorm(a):
            ac = a - jnp.sum(w * a) / wsum
            return ac / jnp.sqrt(jnp.sum(w * ac * ac) + 1e-20)
        cols = (cnorm(rays.dx), cnorm(rays.dy), cnorm(rays.dz))
        G = jnp.stack([jnp.stack([jnp.sum(w * a * b) for b in cols])
                       for a in cols])
        b = jnp.stack([jnp.sum(w * a * tc) for a in cols])
        k = jnp.linalg.solve(G + 1e-6 * jnp.eye(3), b)
        tc = tc - (k[0] * cols[0] + k[1] * cols[1] + k[2] * cols[2])
    var = jnp.sum(w * tc ** 2) / wsum
    return jnp.sqrt(jnp.maximum(var, 0.0))


# ---------------------------------------------------------------------------
# Zernike decomposition
# ---------------------------------------------------------------------------

# (n, m) indices of the first 15 Noll-ordered Zernike terms.  Kept as a
# literal table: it is the regression anchor for the general
# geom/zernike.py::noll_nm rule (tests/test_zernike_lens.py), which
# zernike_basis uses so fits can run to arbitrary order.
_NOLL_NM = [(0, 0), (1, 1), (1, -1), (2, 0), (2, -2), (2, 2), (3, -1),
            (3, 1), (3, -3), (3, 3), (4, 0), (4, 2), (4, -2), (4, 4),
            (4, -4)]

ZERNIKE_NAMES = ['piston', 'tilt x', 'tilt y', 'defocus', 'astig 45',
                 'astig 0', 'coma y', 'coma x', 'trefoil y', 'trefoil x',
                 'spherical', 'astig2 0', 'astig2 45', 'quadrafoil 0',
                 'quadrafoil 45', 'coma2 x', 'coma2 y', 'trefoil2 x',
                 'trefoil2 y', 'pentafoil x', 'pentafoil y', 'spherical2']


def zernike_name(j):
    """Human name of Noll term ``j`` (1-based); 'z<j>' beyond the table."""
    return ZERNIKE_NAMES[j - 1] if j <= len(ZERNIKE_NAMES) else f'z{j}'


def _zernike_radial(n, m, rho):
    m = abs(m)
    out = jnp.zeros_like(rho)
    for s in range((n - m) // 2 + 1):
        import math
        c = ((-1) ** s * math.factorial(n - s)
             / (math.factorial(s) * math.factorial((n + m) // 2 - s)
                * math.factorial((n - m) // 2 - s)))
        out = out + c * rho ** (n - 2 * s)
    return out


def zernike_basis(x, y, radius, n_terms=15):
    """[N, n_terms] Zernike values (Noll order, unit normalization omitted —
    coefficients are in the same length units as the OPD) over the pupil
    coordinates (x, y) normalized by ``radius``."""
    from ..geom.zernike import noll_nm
    rho = jnp.sqrt(x * x + y * y) / radius
    theta = jnp.arctan2(y, x)
    cols = []
    for n, m in (noll_nm(j) for j in range(1, n_terms + 1)):
        r = _zernike_radial(n, m, rho)
        if m == 0:
            cols.append(r)
        elif m > 0:
            cols.append(r * jnp.cos(m * theta))
        else:
            cols.append(r * jnp.sin(-m * theta))
    return jnp.stack(cols, axis=-1)


def zernike_fit(pupil_xy, opd, radius, weights=None, n_terms=15):
    """Weighted least-squares Zernike coefficients of an OPD map sampled at
    pupil coordinates ``pupil_xy [N, 2]``.

    Returns coefficients [n_terms] (same units as ``opd``); see
    ZERNIKE_NAMES for the Noll ordering.  The classic aberration report:
    defocus = index 3, primary spherical = index 10.
    """
    Z = zernike_basis(pupil_xy[:, 0], pupil_xy[:, 1], radius, n_terms)
    w = jnp.ones(opd.shape) if weights is None else weights
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    coef, *_ = jnp.linalg.lstsq(Z * sw, (opd * sw[:, 0])[:, None])
    return coef[:, 0]


def interferogram(opd, amp, wavelength, tilt_fringes=0.0, axis='x',
                  reference_amp=1.0):
    """Two-beam interferogram of a pupil OPD map (Fizeau/Twyman-Green
    style; beyond the reference — no interferometry tooling exists
    there).

    ``opd``/``amp`` are [n, n] pupil maps (``utils.psf.pupil_from_trace``
    output) in the same length units as ``wavelength``;
    ``tilt_fringes`` adds a linear reference tilt of that many fringes
    across the pupil along ``axis`` ('x'|'y') — the standard way to
    turn contour fringes into parallel ones whose BENDING shows the
    aberration.  Intensity:

        I = A_r^2 + A_t^2 + 2 A_r A_t cos(2 pi (OPD + tilt)/lambda)

    normalized so a perfect null (flat OPD, no tilt, matched
    amplitudes) peaks at 1.  One dark->dark fringe spacing = one
    wavelength of OPD — count fringes to read the aberration in waves
    (regression: a pure-defocus OPD of k waves peak-to-valley shows k
    circular fringes; tests/test_interferogram.py).
    """
    n = opd.shape[0]
    u = (jnp.arange(n, dtype=opd.dtype) + 0.5) / n      # 0..1 across
    tilt = tilt_fringes * wavelength * (u[None, :] if axis == 'x'
                                        else u[:, None])
    phase = 2.0 * jnp.pi * (opd + tilt) / wavelength
    a_r = jnp.asarray(reference_amp, opd.dtype)
    inten = a_r * a_r + amp * amp + 2.0 * a_r * amp * jnp.cos(phase)
    return inten / ((a_r + 1.0) ** 2)
