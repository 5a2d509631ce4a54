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
