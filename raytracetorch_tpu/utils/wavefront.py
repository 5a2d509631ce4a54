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


def wavefront_rms(rays, opl, point=None, weights=None, n_medium=1.0):
    """Intensity-weighted RMS optical-path-difference about ``point``
    (default: the bundle's best focus), in the trace's length units.
    Divide by the wavelength for waves."""
    if point is None:
        point = best_focus(rays)
    total = opl_to_point(rays, opl, point, n_medium)
    w = rays.intensity if weights is None else weights
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(total * w) / wsum
    var = jnp.sum(w * (total - mean) ** 2) / wsum
    return jnp.sqrt(jnp.maximum(var, 0.0))


# ---------------------------------------------------------------------------
# Zernike decomposition
# ---------------------------------------------------------------------------

# (n, m) indices of the first 15 Noll-ordered Zernike terms
_NOLL_NM = [(0, 0), (1, 1), (1, -1), (2, 0), (2, -2), (2, 2), (3, -1),
            (3, 1), (3, -3), (3, 3), (4, 0), (4, 2), (4, -2), (4, 4),
            (4, -4)]

ZERNIKE_NAMES = ['piston', 'tilt x', 'tilt y', 'defocus', 'astig 45',
                 'astig 0', 'coma y', 'coma x', 'trefoil y', 'trefoil x',
                 'spherical', 'astig2 0', 'astig2 45', 'quadrafoil 0',
                 'quadrafoil 45']


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
    rho = jnp.sqrt(x * x + y * y) / radius
    theta = jnp.arctan2(y, x)
    cols = []
    for n, m in _NOLL_NM[:n_terms]:
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
