"""Best-focus solves: closed-form axial focus from a traced ray batch.

After a trace, every surviving ray is a straight line ``x(z) = x0 + z ux``
— so the intensity-weighted transverse spot variance about the moving
centroid is a QUADRATIC in the focal plane position z, and the best
focus is a one-shot closed form rather than a 1-D search:

    z* = - sum w (cx·cux + cy·cuy) / sum w (cux² + cuy²)

with centered positions/slopes c• = • - <•>_w.  This is the "image-plane
solve" of classical lens design (the reference has no solves; its users
place sensors by hand, reference ``elements/sensor.py``), done the TPU
way: pure jnp reductions over the planar ray components, differentiable
w.r.t. anything upstream — `jax.grad` through ``best_focus`` lets a
design loop hold the sensor at the CURRENT best focus while bending
(focus-shift-free aberration optimization).

``refocus`` applies the solve to a scene's params by translating the
(axis-aligned) sensor element to z*.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe(x, eps=1e-30):
    return jnp.where(jnp.abs(x) < eps, eps, x)


def best_focus_plane(out, weights=None):
    """Closed-form best-focus plane of traced rays.

    Parameters
    ----------
    out : final Rays of a simulate call (dead rays auto-excluded via
        their zero intensity unless ``weights`` overrides).
    weights : optional [N] weights replacing ``out.intensity``.

    Returns ``(z_star, rms_at_z_star)`` — the axial position minimizing
    the weighted transverse RMS about the centroid, and that RMS.
    """
    w = out.intensity if weights is None else jnp.asarray(weights)
    W = _safe(jnp.sum(w))
    ux, uy = out.dx / _safe(out.dz), out.dy / _safe(out.dz)
    x0 = out.px - out.pz * ux          # positions extrapolated to z = 0
    y0 = out.py - out.pz * uy
    mean = lambda a: jnp.sum(w * a) / W
    cx, cy = x0 - mean(x0), y0 - mean(y0)
    cux, cuy = ux - mean(ux), uy - mean(uy)
    num = jnp.sum(w * (cx * cux + cy * cuy))
    den = _safe(jnp.sum(w * (cux * cux + cuy * cuy)))
    z_star = -num / den
    var = jnp.sum(w * ((cx + z_star * cux) ** 2
                       + (cy + z_star * cuy) ** 2)) / W
    return z_star, jnp.sqrt(var + 1e-24)


def through_focus_rms(out, zs, weights=None):
    """Weighted spot RMS at each plane of ``zs`` ([Z]) — the through-focus
    curve whose minimum :func:`best_focus_plane` returns in closed form."""
    w = out.intensity if weights is None else jnp.asarray(weights)
    W = _safe(jnp.sum(w))
    ux, uy = out.dx / _safe(out.dz), out.dy / _safe(out.dz)
    x0 = out.px - out.pz * ux
    y0 = out.py - out.pz * uy
    zs = jnp.asarray(zs)[:, None]
    x = x0[None, :] + zs * ux[None, :]
    y = y0[None, :] + zs * uy[None, :]
    xb = jnp.sum(w * x, -1, keepdims=True) / W
    yb = jnp.sum(w * y, -1, keepdims=True) / W
    var = jnp.sum(w * ((x - xb) ** 2 + (y - yb) ** 2), -1) / W
    return jnp.sqrt(var + 1e-24)


def refocus(scene, params, rays, key, sensor=None):
    """Move the scene's sensor element to the best-focus plane.

    Traces ``rays``, solves :func:`best_focus_plane`, and returns
    ``(new_params, z_star, rms)`` with the sensor's z-translation set to
    z* (axis-aligned sensors; the x/y translation and rotation are kept).
    ``sensor`` names the element; defaults to the first sensor.
    """
    if sensor is None:
        for el in scene.elements:
            if el.is_sensor:
                sensor = el.name
                break
    if sensor is None:
        raise ValueError("scene has no sensor element")
    out, _, _ = scene.simulate(params, rays, key)
    z_star, rms = best_focus_plane(out)
    new = dict(params)
    sp = dict(new[sensor])
    tr = jnp.asarray(sp['trans'])
    sp['trans'] = tr.at[2].set(z_star.astype(tr.dtype))
    new[sensor] = sp
    return new, z_star, rms
