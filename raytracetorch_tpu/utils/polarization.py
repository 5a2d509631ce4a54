"""Polarization ray tracing: complex 3-vector field transport with Fresnel
amplitude coefficients.

A capability beyond the reference (whose Fresnel functor is intensity-only
and stochastic, phys/std.py:148): each ray carries a complex electric-field
vector E perpendicular to its direction; every refraction decomposes E into
s/p components, applies the flux-normalized Fresnel transmission amplitudes
(complex under TIR), and rebuilds E around the outgoing direction.  |E|^2 is
then the physically transmitted power fraction, polarization-resolved —
Brewster-angle zero p-reflection and s/p splitting fall out exactly.

Implemented as a standalone sequential tracer over the same compiled
SurfaceTable + static metadata as the main drivers, carrying (d, E) in
planar component form.  Mirrors apply the perfect-conductor reflection;
apertures/transmits carry E through; blocks zero it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import PhysKind
from ..core.intersect import intersect, normal_world
from ..core.static_dispatch import apply_physics_one
from ..geom import vec3 as v3


def _cdot(ar, ai, br, bi):
    """Complex dot of component-planar complex vectors (a* . b not needed —
    these are (complex E) . (real basis) contractions)."""
    return v3.dot(ar, br), v3.dot(ai, bi)


def _basis(d, n):
    """s/p basis of an interaction: s = normalize(d x n) (any stable
    perpendicular at normal incidence), p_in = s x d (so (s, p, d) is
    right-handed)."""
    sx = d[1] * n[2] - d[2] * n[1]
    sy = d[2] * n[0] - d[0] * n[2]
    sz = d[0] * n[1] - d[1] * n[0]
    s2 = sx * sx + sy * sy + sz * sz
    degen = s2 < 1e-12
    inv = 1.0 / jnp.sqrt(jnp.where(degen, 1.0, s2))
    # normal incidence: any unit vector perpendicular to d works and s/p
    # coefficients coincide; build one from the smallest d component
    ax = jnp.where(jnp.abs(d[0]) < 0.9, 1.0, 0.0)
    ay = 1.0 - ax
    fx = ay * d[2] - 0.0
    fy = 0.0 - ax * d[2]
    fz = ax * d[1] - ay * d[0]
    f2 = jnp.sqrt(fx * fx + fy * fy + fz * fz + 1e-24)
    s = (jnp.where(degen, fx / f2, sx * inv),
         jnp.where(degen, fy / f2, sy * inv),
         jnp.where(degen, fz / f2, sz * inv))
    p = (s[1] * d[2] - s[2] * d[1],
         s[2] * d[0] - s[0] * d[2],
         s[0] * d[1] - s[1] * d[0])
    return s, p


def _fresnel_amplitudes(n1, n2, cos_i, sin2_t):
    """Flux-normalized complex transmission and reflection amplitudes.

    Under TIR (sin2_t > 1) cos_t is imaginary: t = 0 and |r| = 1 with the
    TIR phase shift.  Returns (ts, tp) real flux-normalized transmission
    magnitudes and (rs_r, rs_i, rp_r, rp_i) complex reflections.
    """
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2_t, 0.0)))
    kappa = jnp.sqrt(jnp.where(tir, jnp.maximum(sin2_t - 1.0, 0.0), 0.0))

    # propagating case: real coefficients
    ts = 2 * n1 * cos_i / (n1 * cos_i + n2 * cos_t + 1e-12)
    tp = 2 * n1 * cos_i / (n2 * cos_i + n1 * cos_t + 1e-12)
    flux = jnp.sqrt(jnp.maximum(n2 * cos_t, 0.0)
                    / jnp.maximum(n1 * cos_i, 1e-12))
    ts_flux = jnp.where(tir, 0.0, ts * flux)
    tp_flux = jnp.where(tir, 0.0, tp * flux)

    rs_r = (n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t + 1e-12)
    rp_r = (n2 * cos_i - n1 * cos_t) / (n2 * cos_i + n1 * cos_t + 1e-12)
    # TIR: rs = (n1 cos_i - i n2 kappa)/(n1 cos_i + i n2 kappa), |rs| = 1
    def _tir_r(a, b):
        den = a * a + b * b + 1e-24
        return (a * a - b * b) / den, -2.0 * a * b / den
    rs_tr, rs_ti = _tir_r(n1 * cos_i, n2 * kappa)
    rp_tr, rp_ti = _tir_r(n2 * cos_i, n1 * kappa)
    rs = (jnp.where(tir, rs_tr, rs_r), jnp.where(tir, rs_ti, 0.0))
    rp = (jnp.where(tir, rp_tr, rp_r), jnp.where(tir, rp_ti, 0.0))
    return ts_flux, tp_flux, rs, rp, tir


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
    table = scene.build_table(params)
    meta = scene.static_meta()
    keys = jax.random.split(key, max(table.n_surfaces, 1))

    d = rays.dir_c
    Er = v3.from_array(jnp.asarray(E0, jnp.float32))
    # project out any component along d and normalize power
    proj = v3.dot(Er, d)
    Er = tuple(e - proj * dd for e, dd in zip(Er, d))
    norm = jnp.sqrt(jnp.maximum(v3.norm2(Er), 1e-24))
    Er = v3.scale(Er, 1.0 / norm)
    Ei = (jnp.zeros_like(Er[0]),) * 3

    pr = rays
    for k in range(table.n_surfaces):
        row = table.row(k)
        m = meta[k]
        res = intersect(row, pr.pos_c, pr.dir_c, static_meta=m)
        active = res['valid'] & (pr.intensity > 0)
        n_w = normal_world(row, res['hit_s'], m)
        d_in = pr.dir_c

        u = jnp.zeros_like(pr.intensity)
        new_dir, imod = apply_physics_one(m, row, res['hit_s'], d_in, n_w, u)

        if m.ph in (PhysKind.SNELL, PhysKind.FRESNEL):
            dot = v3.dot(d_in, n_w)
            from_in = dot < 0
            n1 = jnp.where(from_in, row.ph[..., 0], row.ph[..., 1])
            n2 = jnp.where(from_in, row.ph[..., 1], row.ph[..., 0])
            cos_i = jnp.abs(dot)
            sin2_t = (n1 / n2) ** 2 * (1.0 - cos_i ** 2)
            ts, tp, rs, rp, tir = _fresnel_amplitudes(n1, n2, cos_i, sin2_t)

            s_hat, p_in = _basis(d_in, n_w)
            _, p_out = _basis(new_dir, n_w)   # same s, new p

            Es_r, Es_i = v3.dot(Er, s_hat), v3.dot(Ei, s_hat)
            Ep_r, Ep_i = v3.dot(Er, p_in), v3.dot(Ei, p_in)

            # transmitted branch amplitudes; TIR -> reflected amplitudes
            as_r = jnp.where(tir, rs[0] * Es_r - rs[1] * Es_i, ts * Es_r)
            as_i = jnp.where(tir, rs[0] * Es_i + rs[1] * Es_r, ts * Es_i)
            ap_r = jnp.where(tir, rp[0] * Ep_r - rp[1] * Ep_i, tp * Ep_r)
            ap_i = jnp.where(tir, rp[0] * Ep_i + rp[1] * Ep_r, tp * Ep_i)

            Er_new = v3.add(v3.scale(s_hat, as_r), v3.scale(p_out, ap_r))
            Ei_new = v3.add(v3.scale(s_hat, as_i), v3.scale(p_out, ap_i))
        elif m.ph == PhysKind.REFLECT:
            # perfect mirror: reflect the field like the direction
            Er_new = v3.fma(Er, -2.0 * v3.dot(Er, n_w), n_w)
            Ei_new = v3.fma(Ei, -2.0 * v3.dot(Ei, n_w), n_w)
        elif m.ph == PhysKind.BLOCK:
            Er_new = (jnp.zeros_like(Er[0]),) * 3
            Ei_new = Er_new
        else:
            scale = imod if m.ph == PhysKind.APERTURE else 1.0
            Er_new = v3.scale(Er, scale)
            Ei_new = v3.scale(Ei, scale)

        Er = v3.where(active, Er_new, Er)
        Ei = v3.where(active, Ei_new, Ei)
        new_pos = v3.fma(pr.pos_c, res['t'], pr.dir_c)
        pr = pr.masked_update(active, new_pos, new_dir, imod)

    power = v3.norm2(Er) + v3.norm2(Ei)
    return pr, power, (Er, Ei)
