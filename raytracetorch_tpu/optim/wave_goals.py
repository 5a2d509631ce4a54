"""Wave-domain optimization goals: differentiable merits of the
physical-optics trace (utils/beamprop.py::wave_trace).

The optim/goals.py contract extended to wave metrics (round-4 VERDICT
ask #4): each goal is a pure function returning a differentiable scalar,
so ``jax.grad`` flows end-to-end through the split-step propagation (DFT
matmuls + phase/amplitude screens are plain JAX) into lens curvatures,
poses, phase-plate pixel maps — anything in the params pytree.  The
torch reference has no wave model at all, so these are beyond-reference
(its closest analog is the ray-proxy spot goals, reference
optim/goals.py:99-187).

CURVATURE WARNING (measured, round 4/5): single-pixel functionals of a
near-focus field oscillate on the wavelength scale — finite-difference
checks of :func:`wave_peak_loss`-style merits need tiny steps (eps
~5e-6 on GRIN profile constants; see tests/test_grin.py notes) and
optimizers need small learning rates near convergence.  The encircled-
energy merits integrate over a bucket and are far better conditioned —
prefer them as design losses (tests/test_wave_goals.py sweeps eps and
documents the agreement window).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['wave_encircled_energy', 'wave_encircled_loss', 'wave_peak_loss']


def _radius_grid(shape, dx, center):
    H, W = shape
    y = (jnp.arange(H, dtype=jnp.float32) - H // 2) * dx - center[1]
    x = (jnp.arange(W, dtype=jnp.float32) - W // 2) * dx - center[0]
    return jnp.sqrt(y[:, None] ** 2 + x[None, :] ** 2 + 1e-24)


def wave_encircled_energy(re, im, dx, radius, center=(0.0, 0.0), soft=2.0,
                     total=None, annulus=None):
    """Fraction of the field's power inside the disk of ``radius`` about
    ``center`` (grid units of ``dx``; grid center = pixel [H//2, W//2],
    the propagation-stack convention).

    ``soft`` smooths the bucket edge with a logistic ramp of width
    ``soft * dx`` — the default keeps gradients alive when the spot
    crosses the rim (a hard mask's gradient is zero a.e.; pass 0 for an
    exact binary bucket when only the VALUE matters).  ``total``
    overrides the normalization (e.g. the LAUNCHED power, so absorbed
    light counts against the merit; default: the field's own power).
    ``annulus=(r_in, r_out)`` replaces the disk with a ring bucket
    (ring-former / axicon design); ``radius`` is ignored then.
    """
    I = re * re + im * im
    r = _radius_grid(I.shape, dx, center)

    def bucket(r_edge, sign=1.0):
        if soft and soft > 0.0:
            return 1.0 / (1.0 + jnp.exp(jnp.clip(
                sign * (r - r_edge) / (soft * dx), -30.0, 30.0)))
        return (sign * (r - r_edge) <= 0).astype(I.dtype)

    if annulus is not None:
        r_in, r_out = annulus
        m = bucket(r_out, 1.0) * bucket(r_in, -1.0)
    else:
        m = bucket(radius, 1.0)
    tot = jnp.sum(I) if total is None else total
    return jnp.sum(I * m) / jnp.maximum(tot, 1e-24)


def wave_encircled_loss(scene, params, re0, im0, dx, wavelength, z0,
                        radius, center=(0.0, 0.0), soft=2.0,
                        annulus=None, **wave_kw):
    """``1 - wave_encircled_energy`` of the wave-traced field at the sensor
    plane, normalized by the LAUNCHED power — so Fresnel/coating/metal
    absorption (the round-5 amplitude screens) and aperture clipping
    all count against the design, exactly like the ray tracer's
    intensity-weighted flux goals.

    Args mirror :func:`~raytracetorch_tpu.utils.beamprop.wave_trace`
    (``re0``/``im0`` the launch field, ``**wave_kw`` forwarded, e.g.
    ``wavelength_um`` for dispersive glass); ``radius``/``center``/
    ``soft``/``annulus`` as in :func:`wave_encircled_energy`.  Differentiable
    w.r.t. ``params``; minimize with optim/fit.py.
    """
    from ..utils.beamprop import wave_trace
    re1, im1, _ = wave_trace(scene, params, re0, im0, dx, wavelength,
                             z0, **wave_kw)
    total = jnp.sum(re0 * re0 + im0 * im0)
    return 1.0 - wave_encircled_energy(re1, im1, dx, radius, center=center,
                                  soft=soft, total=total,
                                  annulus=annulus)


def wave_peak_loss(scene, params, re0, im0, dx, wavelength, z0,
                   peak_ref=None, **wave_kw):
    """Negative on-axis intensity of the wave-traced sensor field,
    normalized by ``peak_ref`` when given — pass the diffraction-limited
    peak of an ideal system with the same aperture and the value is
    ``-Strehl`` (by definition); without it the raw peak is a Strehl-
    PROPORTIONAL merit for a fixed launch field.

    Sharper but far worse conditioned than the encircled losses (see
    module docstring) — use for final polish, not cold starts.
    """
    from ..utils.beamprop import wave_trace
    re1, im1, _ = wave_trace(scene, params, re0, im0, dx, wavelength,
                             z0, **wave_kw)
    H, W = re1.shape
    peak = re1[H // 2, W // 2] ** 2 + im1[H // 2, W // 2] ** 2
    if peak_ref is not None:
        peak = peak / jnp.maximum(peak_ref, 1e-24)
    return -peak
