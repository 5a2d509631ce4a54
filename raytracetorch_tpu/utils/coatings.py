"""Differentiable thin-film multilayer coatings (characteristic-matrix
method).

Beyond-reference capability: the reference's Fresnel physics models bare
interfaces only (phys/std.py:148); real optics carry AR/HR dielectric
stacks.  This module computes s/p reflectance and transmittance of an
arbitrary dielectric multilayer as a pure jax function of the layer
thicknesses and indices — so `jax.grad` designs coatings (see
examples/10_coating_design.py) just like it designs lens curvatures.

Physics: the standard 2x2 characteristic matrix per layer
``M_l = [[cos delta, i sin delta / eta], [i eta sin delta, cos delta]]``
with phase thickness ``delta = 2 pi n d cos(theta) / lambda`` and tilted
admittance ``eta_s = n cos(theta)``, ``eta_p = n / cos(theta)`` (Macleod,
"Thin-Film Optical Filters", ch. 2).  Stack matrix B/C gives the
amplitude r = (eta0 B - C) / (eta0 B + C).

Implementation note: all complex arithmetic is carried as explicit
(re, im) pairs — complex64 is unsupported on some TPU runtimes (the axon
tunnel rejects any complex array; same constraint as utils/psf.py).
Dielectric (real-index) stacks only; cos(theta) in each layer follows
from Snell's law and is real below TIR.

Units: wavelength and thicknesses in the same unit (conventionally um
here, matching dispersion's wavelength_um).
"""

from __future__ import annotations

import jax.numpy as jnp


def _cos_layers(n_in, n_layers, cos_i):
    """cos(theta) in each layer + exit medium via Snell (real branch;
    clamped at TIR so gradients stay finite)."""
    sin_i2 = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    # n_in sin_i = n_l sin_l
    return [jnp.sqrt(jnp.maximum(
        1.0 - (n_in / nl) ** 2 * sin_i2, 1e-12)) for nl in n_layers]


# -- complex helpers as (re, im) pairs (see module note: no complex dtypes) --

def _c_mul(a, b):
    return a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0]


def _c_div(a, b):
    den = jnp.maximum(b[0] * b[0] + b[1] * b[1], 1e-24)
    return ((a[0] * b[0] + a[1] * b[1]) / den,
            (a[1] * b[0] - a[0] * b[1]) / den)


def _c_sqrt(a):
    """Principal square root of (re, im).  The +1e-24 inside each sqrt
    keeps gradients finite when an operand sits exactly at 0 (e.g. the
    imaginary part of cos_t at normal incidence) — the 0*inf NaN hazard
    of sqrt-at-zero under reverse-mode (see CLAUDE.md numerical rules)."""
    r = jnp.sqrt(jnp.maximum(a[0] * a[0] + a[1] * a[1], 1e-30))
    re = jnp.sqrt(jnp.maximum(0.5 * (r + a[0]), 0.0) + 1e-24)
    im_mag = jnp.sqrt(jnp.maximum(0.5 * (r - a[0]), 0.0) + 1e-24)
    sign = jnp.where(a[1] < 0, -1.0, 1.0)
    return re, sign * im_mag


def _metal_eta(n_in, n_metal, k_metal, cos_i, pol):
    """Tilted admittance of an ABSORBING substrate n_c = n - ik (Macleod
    ch. 2 convention): complex Snell gives cos_t = sqrt(1 - (n_in sin_i /
    n_c)^2); eta_s = n_c cos_t, eta_p = n_c / cos_t.  Returned as an
    (re, im) pair."""
    sin_i2 = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    nc = (n_metal, -k_metal)
    ratio2 = _c_div((n_in * n_in * sin_i2, jnp.zeros_like(cos_i)),
                    _c_mul(nc, nc))
    cos_t = _c_sqrt((1.0 - ratio2[0], -ratio2[1]))
    if pol == 's':
        return _c_mul(nc, cos_t)
    return _c_div(nc, cos_t)


def _stack_bc(n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol,
              k_out=None):
    """Characteristic-matrix accumulation: returns (eta0, eta_sub,
    (B_re, B_im), (C_re, C_im)).  ``k_out`` (extinction coefficient)
    makes the SUBSTRATE absorbing — n_c = n_out - i k_out — which is the
    metal-mirror case (enhanced/protected aluminum etc.); eta_sub is then
    complex and the returned eta_sub is its real part (only meaningful
    for the dielectric transmittance formula, which does not apply)."""
    n_all = list(n_stack)
    cos_l = _cos_layers(n_in, n_all + [jnp.maximum(n_out, 1e-6)], cos_i)
    cos_layers, cos_t = cos_l[:-1], cos_l[-1]

    def eta(n, c):
        return n * c if pol == 's' else n / jnp.maximum(c, 1e-6)

    eta0 = eta(n_in, cos_i)
    if k_out is not None:
        eta_sub_c = _metal_eta(n_in, n_out, k_out, cos_i, pol)
    else:
        eta_sub_c = (eta(n_out, cos_t), jnp.zeros_like(cos_t))
    eta_sub = eta_sub_c[0]

    # stack vector (B, C) = prod(M_l) @ (1, eta_sub), complex as (re, im)
    one = jnp.ones_like(cos_i + wavelength)
    B_re, B_im = one, jnp.zeros_like(one)
    C_re, C_im = eta_sub_c[0] * one, eta_sub_c[1] * one
    for nl, dl, cl in zip(reversed(n_all), reversed(list(d_stack)),
                          reversed(cos_layers)):
        delta = 2.0 * jnp.pi * nl * dl * cl / wavelength
        cd, sd = jnp.cos(delta), jnp.sin(delta)
        el = eta(nl, cl)
        # [[cd, i sd/el], [i el sd, cd]] @ (B, C)
        nB_re = cd * B_re - (sd / el) * C_im
        nB_im = cd * B_im + (sd / el) * C_re
        nC_re = cd * C_re - el * sd * B_im
        nC_im = cd * C_im + el * sd * B_re
        B_re, B_im, C_re, C_im = nB_re, nB_im, nC_re, nC_im
    return eta0, eta_sub, (B_re, B_im), (C_re, C_im)


def coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol='s'):
    """Intensity reflectance/transmittance of a dielectric multilayer.

    Args:
      n_stack: sequence of layer indices (first layer adjacent to the
        incidence medium), may be empty for a bare interface.
      d_stack: matching physical thicknesses.
      n_in, n_out: incidence / substrate indices.
      cos_i: cosine of the angle of incidence (array ok).
      wavelength: same units as d_stack.
      pol: 's' or 'p'.

    Returns ``(R, T)`` intensity coefficients (broadcast over inputs).
    """
    eta0, eta_sub, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol)
    num_re, num_im = eta0 * B_re - C_re, eta0 * B_im - C_im
    den_re, den_im = eta0 * B_re + C_re, eta0 * B_im + C_im
    den2 = jnp.maximum(den_re * den_re + den_im * den_im, 1e-24)
    R = (num_re * num_re + num_im * num_im) / den2
    # T = 4 eta0 Re(eta_sub) / |eta0 B + C|^2 (dielectric, real etas)
    T = 4.0 * eta0 * eta_sub / den2
    return R, T


def coating_amplitudes(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='s'):
    """COMPLEX amplitude coefficients of the stack as (re, im) pairs:
    ``(t_flux, r)`` with ``r = (eta0 B - C)/(eta0 B + C)`` and the
    flux-normalized transmission ``t_flux = 2 sqrt(eta0 eta_sub) /
    (eta0 B + C)`` (so |t_flux|^2 = T, matching the flux convention of
    core/field.py::fresnel_amplitudes).  Empty stacks reduce to the bare
    Fresnel amplitudes; used by the polarization transport for coated
    surfaces (core/field.py)."""
    eta0, eta_sub, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol)
    den_re, den_im = eta0 * B_re + C_re, eta0 * B_im + C_im
    den2 = jnp.maximum(den_re * den_re + den_im * den_im, 1e-24)
    num_re, num_im = eta0 * B_re - C_re, eta0 * B_im - C_im
    # complex division (a + ib)/(c + id)
    r_re = (num_re * den_re + num_im * den_im) / den2
    r_im = (num_im * den_re - num_re * den_im) / den2
    if pol == 'p':
        # admittance-form r_p = (eta0 - eta_sub)/(eta0 + eta_sub) carries
        # the opposite sign to the Fresnel-field convention used by
        # core/field.py (rp = (n2 cos_i - n1 cos_t)/(...)); flip so both
        # conventions agree (the bare-interface limit is the contract)
        r_re, r_im = -r_re, -r_im
    amp = 2.0 * jnp.sqrt(jnp.maximum(eta0 * eta_sub, 0.0))
    t_re = amp * den_re / den2
    t_im = -amp * den_im / den2
    return (t_re, t_im), (r_re, r_im)


# Fixed complex indices (n, k) near the d line (550-590 nm), standard
# handbook values (Rakic / Johnson-Christy); good across the visible to a
# few percent in R — the same fixed-index approximation the dielectric
# catalog's d-line entries make.
METALS = {
    'AL': (1.015, 6.63),
    'AG': (0.144, 3.60),
    'AU': (0.277, 2.92),
    'CU': (0.606, 2.58),
}


def metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                      wavelength, pol='s'):
    """Intensity reflectance of a dielectric multilayer on an ABSORBING
    (metal) substrate n_c = n_metal - i k_metal.  Empty stacks give the
    bare-metal Fresnel reflectance; quarter-wave low/high pairs raise it
    (enhanced aluminum), a half-wave overcoat leaves it ~unchanged
    (protected aluminum)."""
    eta0, _, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_metal, cos_i, wavelength, pol,
        k_out=k_metal)
    num = (eta0 * B_re - C_re, eta0 * B_im - C_im)
    den = (eta0 * B_re + C_re, eta0 * B_im + C_im)
    den2 = jnp.maximum(den[0] * den[0] + den[1] * den[1], 1e-24)
    return (num[0] * num[0] + num[1] * num[1]) / den2


def metal_reflection_amplitudes(n_stack, d_stack, n_in, n_metal, k_metal,
                                cos_i, wavelength, pol='s'):
    """Complex reflection amplitude r = (eta0 B - C)/(eta0 B + C) of a
    (possibly coated) metal mirror as an (re, im) pair, in the same field
    convention as coating_amplitudes (p flipped to match
    core/field.py::fresnel_amplitudes)."""
    eta0, _, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_metal, cos_i, wavelength, pol,
        k_out=k_metal)
    num = (eta0 * B_re - C_re, eta0 * B_im - C_im)
    den = (eta0 * B_re + C_re, eta0 * B_im + C_im)
    r = _c_div(num, den)
    if pol == 'p':
        r = (-r[0], -r[1])
    return r


def unpolarized_metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal,
                                  cos_i, wavelength):
    Rs = metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                           wavelength, pol='s')
    Rp = metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                           wavelength, pol='p')
    return 0.5 * (Rs + Rp)


def unpolarized_reflectance(n_stack, d_stack, n_in, n_out, cos_i,
                            wavelength):
    """Mean of s and p reflectance (matches the bare-interface Fresnel
    convention of core/physics.py::fresnel_reflectance when the stack is
    empty)."""
    Rs, _ = coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='s')
    Rp, _ = coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='p')
    return 0.5 * (Rs + Rp)
