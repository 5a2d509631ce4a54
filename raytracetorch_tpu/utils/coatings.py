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


def _c_trig(delta):
    """(cos, sin) of a complex phase (re, im) pair: cos(a+ib) = cos a
    cosh b - i sin a sinh b; sin(a+ib) = sin a cosh b + i cos a sinh b.

    cosh/sinh are spelled as exp sums — Mosaic has no cosh/sinh
    primitive, and this function runs INSIDE the fused Pallas kernels
    whenever a surface carries an absorbing coating (apply_physics_one
    -> coated_rt_sp -> _stack_bc_absorbing).  Film phase thicknesses
    keep |b| = 2 pi k d / lambda small (k d << lambda), far from exp
    overflow."""
    a, b = delta
    ca, sa = jnp.cos(a), jnp.sin(a)
    eb, enb = jnp.exp(b), jnp.exp(-b)
    chb, shb = 0.5 * (eb + enb), 0.5 * (eb - enb)
    return (ca * chb, -sa * shb), (sa * chb, ca * shb)


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


def _layer_is_absorbing(k_stack):
    """Static test: does any layer carry a nonzero extinction coefficient?
    Layer indices (n AND k) are static scene structure (plain floats —
    only thicknesses are trainable), so this is a compile-time branch."""
    return k_stack is not None and any(float(k) != 0.0 for k in k_stack)


def _stack_bc(n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol,
              k_out=None, k_stack=None):
    """Characteristic-matrix accumulation: returns (eta0, eta_sub,
    (B_re, B_im), (C_re, C_im)).  ``k_out`` (extinction coefficient)
    makes the SUBSTRATE absorbing — n_c = n_out - i k_out — which is the
    metal-mirror case (enhanced/protected aluminum etc.); eta_sub is then
    complex and the returned eta_sub is its real part (only meaningful
    for the dielectric transmittance formula, which does not apply).
    ``k_stack`` (per-LAYER extinction, zeros for dielectrics) switches to
    the full-complex matrix path — absorbing FILMS (thin-metal
    beamsplitters, inconel neutral density): layer index n_l - i k_l,
    complex Snell cosine, complex phase thickness (cos/sin via
    cosh/sinh, _c_trig).  The absorbing path costs ~4x the real one and
    is taken only when a layer k is statically nonzero."""
    n_all = list(n_stack)
    if _layer_is_absorbing(k_stack):
        return _stack_bc_absorbing(n_all, list(k_stack), list(d_stack),
                                   n_in, n_out, cos_i, wavelength, pol,
                                   k_out=k_out)
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


def _stack_bc_absorbing(n_all, k_all, d_all, n_in, n_out, cos_i,
                        wavelength, pol, k_out=None):
    """Full-complex characteristic matrices (absorbing layers).  Same
    return contract as _stack_bc; eta_sub is Re(eta_substrate)."""
    sin_i2 = jnp.maximum(1.0 - cos_i * cos_i, 0.0)
    kin2 = n_in * n_in * sin_i2          # (n_in sin_i)^2, Snell invariant

    def c_cos(nc):
        ratio2 = _c_div((kin2, jnp.zeros_like(cos_i)), _c_mul(nc, nc))
        return _c_sqrt((1.0 - ratio2[0], -ratio2[1]))

    def c_eta(nc, cl):
        return _c_mul(nc, cl) if pol == 's' else _c_div(nc, cl)

    eta0 = n_in * cos_i if pol == 's' else n_in / jnp.maximum(cos_i, 1e-6)
    nc_sub = (n_out, -(k_out if k_out is not None else 0.0 * n_out))
    cos_sub = c_cos(nc_sub)
    eta_sub_c = c_eta(nc_sub, cos_sub)

    one = jnp.ones_like(cos_i + wavelength)
    B = (one, jnp.zeros_like(one))
    C = (eta_sub_c[0] * one, eta_sub_c[1] * one)
    for nl, kl, dl in zip(reversed(n_all), reversed(k_all),
                          reversed(d_all)):
        nc = (nl * one, -kl * one)
        cl = c_cos(nc)
        el = c_eta(nc, cl)
        phase = 2.0 * jnp.pi * dl / wavelength
        delta = _c_mul(nc, cl)
        delta = (phase * delta[0], phase * delta[1])
        cd, sd = _c_trig(delta)
        i_sd = (-sd[1], sd[0])           # i sin(delta)
        # [[cos d, i sin d / eta], [i eta sin d, cos d]] @ (B, C)
        nB = tuple(a + b for a, b in zip(_c_mul(cd, B),
                                         _c_mul(_c_div(i_sd, el), C)))
        nC = tuple(a + b for a, b in zip(_c_mul(_c_mul(i_sd, el), B),
                                         _c_mul(cd, C)))
        B, C = nB, nC
    return eta0, eta_sub_c[0], B, C


def coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol='s',
               k_stack=None):
    """Intensity reflectance/transmittance of a dielectric multilayer.

    Args:
      n_stack: sequence of layer indices (first layer adjacent to the
        incidence medium), may be empty for a bare interface.
      d_stack: matching physical thicknesses.
      n_in, n_out: incidence / substrate indices.
      cos_i: cosine of the angle of incidence (array ok).
      wavelength: same units as d_stack.
      pol: 's' or 'p'.

      k_stack: optional per-layer extinction coefficients (absorbing
        films — thin metals, inconel ND); R + T < 1 then, the deficit
        being the film absorptance A = 1 - R - T.

    Returns ``(R, T)`` intensity coefficients (broadcast over inputs).
    """
    eta0, eta_sub, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol,
        k_stack=k_stack)
    num_re, num_im = eta0 * B_re - C_re, eta0 * B_im - C_im
    den_re, den_im = eta0 * B_re + C_re, eta0 * B_im + C_im
    den2 = jnp.maximum(den_re * den_re + den_im * den_im, 1e-24)
    R = (num_re * num_re + num_im * num_im) / den2
    # T = 4 eta0 Re(eta_sub) / |eta0 B + C|^2 (dielectric, real etas)
    T = 4.0 * eta0 * eta_sub / den2
    return R, T


def coating_amplitudes(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='s', k_stack=None):
    """COMPLEX amplitude coefficients of the stack as (re, im) pairs:
    ``(t_flux, r)`` with ``r = (eta0 B - C)/(eta0 B + C)`` and the
    flux-normalized transmission ``t_flux = 2 sqrt(eta0 eta_sub) /
    (eta0 B + C)`` (so |t_flux|^2 = T, matching the flux convention of
    core/field.py::fresnel_amplitudes).  Empty stacks reduce to the bare
    Fresnel amplitudes; used by the polarization transport for coated
    surfaces (core/field.py).  With ``k_stack`` (absorbing films)
    |r|^2 + |t|^2 < 1 — the film absorbs the rest."""
    eta0, eta_sub, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_out, cos_i, wavelength, pol,
        k_stack=k_stack)
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


# Tabulated complex index DISPERSION for the same metals: (n, k) at the
# six METAL_GRID_UM wavelengths, piecewise-linearly interpolated by
# metal_nk_at (clamped at the grid ends).  Approximate handbook values
# (Palik for Al, Johnson & Christy for the noble metals), good to a few
# percent in n/k — metallic R is insensitive to that level (bare-Al R
# moves ~0.1% between the fixed d-line entry above and this table's
# interpolation at 0.5876 um).  The 0.80 um knot captures aluminium's
# interband absorption dip — the one visible-band feature a smooth fit
# misses.  Mirror elements opt in with metal_dispersion=True
# (elements/mirror.py); the knots are STATIC scene structure, carried on
# StaticRowMeta, so both the XLA and fused Pallas paths specialize on
# them at compile time with zero extra table traffic.
METAL_GRID_UM = (0.40, 0.50, 0.60, 0.70, 0.80, 1.00)
METAL_NK = {
    'AL': ((0.49, 0.77, 1.20, 1.83, 2.80, 1.35),
           (4.86, 6.08, 7.26, 8.31, 8.45, 9.58)),
    'AG': ((0.05, 0.05, 0.06, 0.14, 0.14, 0.21),
           (2.07, 2.87, 3.75, 4.52, 5.29, 6.76)),
    'AU': ((1.47, 0.97, 0.25, 0.16, 0.17, 0.26),
           (1.95, 1.87, 2.99, 3.80, 4.86, 6.82)),
    'CU': ((1.18, 1.12, 0.45, 0.21, 0.26, 0.33),
           (2.21, 2.60, 3.30, 4.10, 5.26, 6.70)),
}


def parse_coating_entries(entries):
    """Normalize user coating entries to static-index lists (ns, ks, ds).

    Accepted per-layer forms (outermost / incidence-side first):

    - ``(n, d_um)`` — dielectric layer (k = 0);
    - ``(n, k, d_um)`` — ABSORBING layer with extinction coefficient k
      (thin-metal beamsplitters, inconel neutral-density films);
    - ``('Ag', d_um)`` — named metal film at the fixed d-line (n, k)
      from METALS.

    Layer indices (n and k) are static scene structure; thicknesses ds
    are the trainable 'coat_d' initializer.  Returns plain float lists."""
    ns, ks, ds = [], [], []
    for e in entries:
        e = tuple(e)
        if len(e) == 2:
            a, dd = e
            if isinstance(a, str):
                n, k = METALS[a.upper()]
            else:
                n, k = float(a), 0.0
        elif len(e) == 3:
            n, k, dd = e
        else:
            raise ValueError(
                f"coating entry {e!r}: expected (n, d), (n, k, d) or "
                "('Ag', d)")
        ns.append(float(n))
        ks.append(float(k))
        ds.append(float(dd))
    return ns, ks, ds


def metal_nk_at(n_tab, k_tab, wavelength_um):
    """Piecewise-linear (n, k) of a metal at ``wavelength_um`` from static
    knot values on METAL_GRID_UM, clamped outside [0.40, 1.00] um.

    ``n_tab``/``k_tab`` are plain float tuples (compile-time constants):
    the interpolation unrolls to five masked merges over scalar
    coefficients — no gathers, no table reads, Mosaic-safe (float
    where-operands only; see CLAUDE.md)."""
    g = METAL_GRID_UM
    lam = jnp.clip(wavelength_um, g[0], g[-1])
    n = jnp.zeros_like(lam) + n_tab[0]
    k = jnp.zeros_like(lam) + k_tab[0]
    for i in range(len(g) - 1):
        t = (lam - g[i]) / (g[i + 1] - g[i])
        # last segment with lam >= g[i] wins (lam clamped, so exactly the
        # containing segment overwrites)
        n = jnp.where(lam >= g[i], n_tab[i] + t * (n_tab[i + 1] - n_tab[i]),
                      n)
        k = jnp.where(lam >= g[i], k_tab[i] + t * (k_tab[i + 1] - k_tab[i]),
                      k)
    return n, k


def metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                      wavelength, pol='s', k_stack=None):
    """Intensity reflectance of a dielectric multilayer on an ABSORBING
    (metal) substrate n_c = n_metal - i k_metal.  Empty stacks give the
    bare-metal Fresnel reflectance; quarter-wave low/high pairs raise it
    (enhanced aluminum), a half-wave overcoat leaves it ~unchanged
    (protected aluminum).  ``k_stack`` makes the LAYERS absorbing too."""
    eta0, _, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_metal, cos_i, wavelength, pol,
        k_out=k_metal, k_stack=k_stack)
    num = (eta0 * B_re - C_re, eta0 * B_im - C_im)
    den = (eta0 * B_re + C_re, eta0 * B_im + C_im)
    den2 = jnp.maximum(den[0] * den[0] + den[1] * den[1], 1e-24)
    return (num[0] * num[0] + num[1] * num[1]) / den2


def metal_reflection_amplitudes(n_stack, d_stack, n_in, n_metal, k_metal,
                                cos_i, wavelength, pol='s', k_stack=None):
    """Complex reflection amplitude r = (eta0 B - C)/(eta0 B + C) of a
    (possibly coated) metal mirror as an (re, im) pair, in the same field
    convention as coating_amplitudes (p flipped to match
    core/field.py::fresnel_amplitudes)."""
    eta0, _, (B_re, B_im), (C_re, C_im) = _stack_bc(
        n_stack, d_stack, n_in, n_metal, cos_i, wavelength, pol,
        k_out=k_metal, k_stack=k_stack)
    num = (eta0 * B_re - C_re, eta0 * B_im - C_im)
    den = (eta0 * B_re + C_re, eta0 * B_im + C_im)
    r = _c_div(num, den)
    if pol == 'p':
        r = (-r[0], -r[1])
    return r


def unpolarized_metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal,
                                  cos_i, wavelength, k_stack=None):
    Rs = metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                           wavelength, pol='s', k_stack=k_stack)
    Rp = metal_reflectance(n_stack, d_stack, n_in, n_metal, k_metal, cos_i,
                           wavelength, pol='p', k_stack=k_stack)
    return 0.5 * (Rs + Rp)


def unpolarized_reflectance(n_stack, d_stack, n_in, n_out, cos_i,
                            wavelength, k_stack=None):
    """Mean of s and p reflectance (matches the bare-interface Fresnel
    convention of core/physics.py::fresnel_reflectance when the stack is
    empty)."""
    Rs, _ = coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='s', k_stack=k_stack)
    Rp, _ = coating_rt(n_stack, d_stack, n_in, n_out, cos_i, wavelength,
                       pol='p', k_stack=k_stack)
    return 0.5 * (Rs + Rp)
