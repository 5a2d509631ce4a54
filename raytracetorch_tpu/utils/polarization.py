"""Polarization analysis layer over the E-field transport in the core trace.

The transport physics lives in ``core/field.py`` and is integrated into the
main drivers (``trace_sequential`` / ``trace_nonsequential`` accept
``track_field=True``), so sequential, non-sequential, render and sensor
paths all see polarization.  This module keeps the original standalone
driver API as a thin wrapper plus Jones/Stokes analysis helpers.

A capability beyond the reference (whose Fresnel functor is intensity-only
and stochastic, phys/std.py:148).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.field import (FieldState, fresnel_amplitudes,   # noqa: F401
                          sp_basis, transport_field)
from ..geom import vec3 as v3

# backward-compatible private aliases (pre-integration module layout)
_basis = sp_basis
_fresnel_amplitudes = fresnel_amplitudes


def polarized_sequential_trace(scene, params, rays, key, E0):
    """Sequential trace carrying a complex field vector per ray.

    ``E0``: [N, 3] complex-compatible initial field (real array means linear
    polarization), must be perpendicular to the launch directions; it is
    projected and normalized internally so |E|^2 starts at 1.

    Returns ``(rays_out, power [N], E_out (real, imag) component tuples)``.
    |E|^2 = polarization-resolved transmitted power fraction (TIR folds into
    reflection: transmitted power 0 at that surface; rays still follow the
    geometric TIR/refraction path of the intensity trace).
    """
    out, _, aux = scene.simulate(params, rays, key, track_field=True, E0=E0)
    field = aux['field']
    return out, aux['field_power'], (field.r_c, field.i_c)


def stokes_parameters(field: FieldState, d=None):
    """Stokes vector (S0, S1, S2, S3) per ray from the transported field.

    The s/p-analyzer basis is built in the plane transverse to ``d`` (the
    ray directions as a component tuple; defaults cannot be inferred from
    the field alone, so pass ``rays.dir_c``).  S0 = |E|^2 total power;
    S3 > 0 means right-hand circular."""
    assert d is not None, "pass the ray directions (rays.dir_c)"
    # transverse basis (h, v): h = normalize(z_hat x d) (or x_hat at poles)
    hx = -d[1]
    hy = d[0]
    h2 = hx * hx + hy * hy
    pole = h2 < 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(pole, 1.0, h2))
    h = (jnp.where(pole, 1.0, hx * inv), jnp.where(pole, 0.0, hy * inv),
         jnp.zeros_like(hx))
    v = (d[1] * h[2] - d[2] * h[1],
         d[2] * h[0] - d[0] * h[2],
         d[0] * h[1] - d[1] * h[0])
    Er, Ei = field.r_c, field.i_c
    ah_r, ah_i = v3.dot(Er, h), v3.dot(Ei, h)
    av_r, av_i = v3.dot(Er, v), v3.dot(Ei, v)
    s0 = ah_r ** 2 + ah_i ** 2 + av_r ** 2 + av_i ** 2
    s1 = ah_r ** 2 + ah_i ** 2 - av_r ** 2 - av_i ** 2
    s2 = 2.0 * (ah_r * av_r + ah_i * av_i)
    s3 = 2.0 * (ah_r * av_i - ah_i * av_r)
    return s0, s1, s2, s3


def degree_of_polarization(s0, s1, s2, s3):
    """DoP of an (ensemble-averaged) Stokes vector — 1 for pure states."""
    return jnp.sqrt(s1 * s1 + s2 * s2 + s3 * s3) / jnp.maximum(s0, 1e-24)
