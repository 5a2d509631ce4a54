"""Surface interaction physics, evaluated densely and selected by tag.

TPU-native re-design of the reference's ``SurfaceFunction`` functor hierarchy
(``phys/std.py``, ``phys/filter.py``): instead of Python dispatch to one
nn.Module per surface, every interaction model is computed in fused
elementwise ops on *component-planar* vectors (see geom/vec3.py for the
layout rationale) and the per-surface ``ph_kind`` tag selects the result
(the statically-specialized sequential path evaluates only one model — see
core/static_dispatch.py).  Physics parameter layout (``ph [..., 6]``):

    ph[0] = ior_in    (medium on the side the geometric normal points toward)
    ph[1] = ior_out   (medium on the far side)
    ph[2] = Cx   ph[3] = Cy   ph[4] = Dx   ph[5] = Dy   (Linear / ABCD optics)

IOR-assignment convention matches the reference's element constructors
(``elements/lens.py:41-57``).  NOTE on Snell (see PARITY.md §1): the
reference's ``RefractSnell`` selects the IOR ratio inverted w.r.t. its own
paraxial analytics (``phys/std.py:132``), which makes traced rays diverge
through a converging lens.  We implement physical Snell: n1 = medium of
incidence, mu = n1/n2, so traced focal lengths agree with the thick-lens
formulas in ``elements/lens.py:60-92`` and with ``getParaxial``.

All vectors here (``d``, ``n``, ``hit_local``, outputs) are component tuples
``(x, y, z)`` of equal-shaped arrays.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PhysKind
from ..geom import vec3 as v3
from ..geom.bounds import sb_check


def reflect_dir(d, n):
    """Specular reflection R = I - 2 (I.N) N (phys/std.py:97-108)."""
    return v3.fma(d, -2.0 * v3.dot(d, n), n)


def _tangent_frame(a):
    """Orthonormal (t1, t2) spanning the plane transverse to unit vector
    ``a`` (component tuples, branchless — pole handled by a where)."""
    # t1 = normalize(a x z_hat) unless a ~ +-z, then a x x_hat
    t1x, t1y, t1z = a[1], -a[0], jnp.zeros_like(a[0])
    pole = t1x * t1x + t1y * t1y < 1e-12
    t1x = jnp.where(pole, jnp.zeros_like(t1x), t1x)
    t1y = jnp.where(pole, a[2], t1y)
    t1z = jnp.where(pole, -a[1], t1z)
    inv = 1.0 / jnp.sqrt(t1x * t1x + t1y * t1y + t1z * t1z + 1e-24)
    t1 = (t1x * inv, t1y * inv, t1z * inv)
    t2 = (a[1] * t1[2] - a[2] * t1[1],
          a[2] * t1[0] - a[0] * t1[2],
          a[0] * t1[1] - a[1] * t1[0])
    return t1, t2


def scatter_dir(model, d, n, sigma, u1, u2):
    """Stochastic scattered direction (beyond the reference — its physics
    functors are all specular, phys/std.py).

    ``model`` is STATIC ('lambert' | 'gauss_r' | 'gauss_t'); ``sigma``
    (radians) is traced — the Gaussian lobes are built by reparameterized
    sampling (dir = f(u1, u2, sigma)), so d(dir)/d(sigma) flows and lobe
    widths are designable by jax.grad.  ``u1``/``u2`` are independent
    per-ray uniforms; the draw itself is non-differentiable by
    construction, like the Fresnel MC branch.

    - 'lambert': cosine-weighted hemisphere about the incoming-facing
      normal (ideal matte baffle / wall).
    - 'gauss_r': specular reflection + transverse Gaussian perturbation
      of width ``sigma`` (rough mirror, Phong-like lobe).
    - 'gauss_t': straight-through + transverse Gaussian perturbation
      (thin ground-glass diffuser; medium unchanged).
    """
    if model == 'lambert':
        # normal oriented against the incoming ray
        sgn = -jnp.sign(v3.dot(d, n) + 1e-30)
        nf = v3.scale(n, sgn)
        t1, t2 = _tangent_frame(nf)
        z = jnp.sqrt(u1 + 1e-12)
        r = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
        phi = (2.0 * jnp.pi) * u2
        cphi, sphi = jnp.cos(phi), jnp.sin(phi)
        return tuple(r * cphi * a + r * sphi * b + z * c
                     for a, b, c in zip(t1, t2, nf))
    # Gaussian lobes: Box-Muller pair in the transverse plane of the
    # base direction, reparameterized by sigma
    base = reflect_dir(d, n) if model == 'gauss_r' else d
    rad = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(1.0 - u1, 1e-12)))
    ang = (2.0 * jnp.pi) * u2
    g1 = rad * jnp.cos(ang)
    g2 = rad * jnp.sin(ang)
    t1, t2 = _tangent_frame(base)
    vx, vy, vz = (c + sigma * (g1 * a + g2 * b)
                  for a, b, c in zip(t1, t2, base))
    inv = 1.0 / jnp.sqrt(vx * vx + vy * vy + vz * vz + 1e-24)
    return (vx * inv, vy * inv, vz * inv)


def refract_components(d, n, ior_in, ior_out):
    """Shared Snell/Fresnel geometry.

    Returns (dot, cos_i, n1, n2, mu, tir, cos_t, eff_sign) where the
    effective normal (flipped against the incident ray) is ``eff_sign * n``.
    ``from_in`` means the ray arrives from the ``ior_in`` (normal) side.
    """
    dot = v3.dot(d, n)
    from_in = dot < 0
    eff_sign = jnp.where(from_in, 1.0, -1.0)
    cos_i = jnp.abs(dot)
    n1 = jnp.where(from_in, ior_in, ior_out)
    n2 = jnp.where(from_in, ior_out, ior_in)
    mu = n1 / jnp.where(jnp.abs(n2) < 1e-12, 1e-12, n2)
    sin2_t = mu * mu * (1.0 - cos_i * cos_i)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(1.0 - sin2_t, 0.0)))
    cos_t = jnp.where(tir, 0.0, cos_t)
    return dot, cos_i, n1, n2, mu, tir, cos_t, eff_sign


def snell_dir(d, n, ior_in, ior_out):
    """Vector Snell with TIR -> reflection (phys/std.py:111-145, mu
    corrected)."""
    dot, cos_i, _, _, mu, tir, cos_t, eff_sign = refract_components(
        d, n, ior_in, ior_out)
    coef = (mu * cos_i - cos_t) * eff_sign
    v_refract = v3.fma(v3.scale(d, mu), coef, n)
    v_reflect = v3.fma(d, -2.0 * dot, n)
    return v3.where(tir, v_reflect, v_refract)


def fresnel_rs_rp(cos_i, cos_t, n1, n2):
    """Per-polarization Fresnel intensity reflectances (Rs, Rp)."""
    rs = ((n1 * cos_i - n2 * cos_t) / (n1 * cos_i + n2 * cos_t + 1e-8)) ** 2
    rp = ((n1 * cos_t - n2 * cos_i) / (n1 * cos_t + n2 * cos_i + 1e-8)) ** 2
    return rs, rp


def fresnel_reflectance(cos_i, cos_t, n1, n2):
    """Unpolarized Fresnel R = (Rs + Rp) / 2 (phys/std.py:165-175)."""
    rs, rp = fresnel_rs_rp(cos_i, cos_t, n1, n2)
    return 0.5 * (rs + rp)


def fresnel_dir(d, n, ior_in, ior_out, u, R_override=None):
    """Monte-Carlo Fresnel: stochastically reflect with probability R else
    refract (phys/std.py:148-219).  ``u`` is a per-ray uniform draw — the
    *choice* is non-differentiable by construction.  ``R_override``
    replaces the bare-interface reflectance (thin-film coated surfaces,
    core/static_dispatch.py::coated_reflectance)."""
    dot, cos_i, n1, n2, mu, tir, cos_t, eff_sign = refract_components(
        d, n, ior_in, ior_out)
    R = (fresnel_reflectance(cos_i, cos_t, n1, n2)
         if R_override is None else R_override)
    R = jnp.where(tir, 1.0, R)
    reflect_mask = u < R
    v_reflect = v3.fma(d, -2.0 * dot, n)
    coef = (mu * cos_i - cos_t) * eff_sign
    v_refract = v3.fma(v3.scale(d, mu), coef, n)
    return v3.where(reflect_mask, v_reflect, v_refract)


def grating_dir(d, n, Rw, period_um, order, reflective, wavelength_um):
    """Linear diffraction grating (beyond the reference): grooves along the
    surface-local y axis, grating vector along local x with period
    ``period_um``.  Vector grating equation: the tangential direction
    component picks up m * lambda / period; the normal component restores
    unit length (sign kept for transmission gratings, flipped for
    reflection).  Orders that would be evanescent return ``ok=False``
    (the trace zeroes those rays' intensity).  Ideal efficiency (1.0) into
    the configured order.  Unset wavelengths (0) diffract at the d line.

    Returns (new_dir tuple, ok mask)."""
    dl = v3.rot(d, Rw)
    wl = jnp.where(wavelength_um > 0, wavelength_um, 0.5876)
    shift = order * wl / jnp.maximum(period_um, 1e-12)
    tx = dl[0] + shift
    ty = dl[1]
    t2 = tx * tx + ty * ty
    ok = t2 < 1.0
    tz2 = jnp.maximum(1.0 - t2, 0.0)
    tz = jnp.sqrt(jnp.where(ok, tz2, 1.0))
    sign = jnp.sign(jnp.where(jnp.abs(dl[2]) < 1e-12, 1.0, dl[2]))
    tz = tz * sign * jnp.where(reflective > 0.5, -1.0, 1.0)
    out_local = (tx, ty, jnp.where(ok, tz, dl[2]))
    return v3.rot_t(out_local, Rw), ok


def doe_dir(d, Rw, hit_local, coeffs, order, lam0_um, wavelength_um,
            n1, n2):
    """Radial-phase diffractive surface (kinoform / diffractive lens —
    beyond the reference, whose only direction functors are
    specular, phys/std.py).

    The phase profile phi(r) = sum_k c_k r^(2k) is in CYCLES with
    ``coeffs`` c_k in cycles/mm^(2k) (geometry in mm, wavelengths in
    um; the 1e-3 conversion is internal).  Vector grating equation in
    optical-momentum form, in the surface-local frame:

        n2 * d_out_t = n1 * d_in_t + m * lam_mm * grad(phi)

    with the normal component restored from |p| = n2 — exact for any
    incidence, subsuming the thin-lens behavior p_r += 2 m lam c1 r
    (focal length f = -1 / (2 m lam_mm c1)).  Power scales as lam/lam0:
    the DOE Abbe number V = lam_d / (lam_F - lam_C) = -3.452, the lever
    of refractive/diffractive hybrid achromats.  Evanescent orders
    return ok=False (the trace zeroes those rays).

    Returns (new_dir tuple, ok mask)."""
    dl = v3.rot(d, Rw)
    wl = jnp.where(wavelength_um > 0, wavelength_um, lam0_um)
    lam_mm = wl * 1e-3
    x, y = hit_local[0], hit_local[1]
    r2 = x * x + y * y
    gscale = jnp.zeros_like(r2)
    rpow = jnp.ones_like(r2)            # r^(2(k-1))
    for k_i, c in enumerate(coeffs, start=1):
        gscale = gscale + (2.0 * k_i) * c * rpow
        rpow = rpow * r2
    kick = order * lam_mm * gscale
    tx = n1 * dl[0] + kick * x
    ty = n1 * dl[1] + kick * y
    t2 = tx * tx + ty * ty
    n2sq = n2 * n2
    ok = t2 < n2sq
    tz = jnp.sqrt(jnp.where(ok, jnp.maximum(n2sq - t2, 0.0), 1.0))
    sign = jnp.sign(jnp.where(jnp.abs(dl[2]) < 1e-12, 1.0, dl[2]))
    inv = 1.0 / n2
    out_local = (tx * inv, ty * inv,
                 jnp.where(ok, tz * sign * inv, dl[2]))
    return v3.rot_t(out_local, Rw), ok


def phase_grid_dir(d, Rw, hit_local, grid, order, lam0_um,
                   wavelength_um, n1, n2, hx, hy, corners_fn=None):
    """Pixelated phase plate (beyond the reference): a traced [H, W]
    phase map in CYCLES spanning the rect aperture [-hx, hx] x
    [-hy, hy] in the surface frame, bilinearly interpolated; the ray
    picks up the same momentum-form kick as :func:`doe_dir`,

        n2 d_out_t = n1 d_in_t + m lam_mm grad(phi),

    with grad(phi) the analytic gradient of the bilinear patch at the
    hit (piecewise-bilinear; exact at cell centers for any quadratic
    profile).  Because the GRID VALUES are traced, jax.grad flows into
    every pixel — the 'deep optics' design surface (the bwd pass of
    the per-ray gather is a scatter-add of ray cotangents into the
    map).  Rays kicked evanescent return ok=False.

    Returns (new_dir tuple, ok mask)."""
    dl = v3.rot(d, Rw)
    wl = jnp.where(wavelength_um > 0, wavelength_um, lam0_um)
    lam_mm = wl * 1e-3
    H, W = grid.shape
    x, y = hit_local[0], hit_local[1]
    u = (x + hx) / (2.0 * hx) * (W - 1)
    v = (y + hy) / (2.0 * hy) * (H - 1)
    u = jnp.clip(u, 0.0, W - 1 - 1e-6)
    v = jnp.clip(v, 0.0, H - 1 - 1e-6)
    iu = u.astype(jnp.int32)
    iv = v.astype(jnp.int32)
    fu, fv = u - iu, v - iv
    if corners_fn is None:
        # per-ray 4-corner gather — fine under XLA (native TPU gather);
        # Mosaic has no per-lane gather lowering, so the fused Pallas
        # kernel passes corners_fn=_grid_corners_mxu (one-hot matmul
        # reads, ops/pallas_trace.py) instead
        g00 = grid[iv, iu]
        g01 = grid[iv, iu + 1]
        g10 = grid[iv + 1, iu]
        g11 = grid[iv + 1, iu + 1]
    else:
        g00, g01, g10, g11 = corners_fn(grid, iv, iu)
    # bilinear gradient, rescaled from cell to length units
    su = (W - 1) / (2.0 * hx)
    sv = (H - 1) / (2.0 * hy)
    gx = ((1 - fv) * (g01 - g00) + fv * (g11 - g10)) * su
    gy = ((1 - fu) * (g10 - g00) + fu * (g11 - g01)) * sv
    kick = order * lam_mm
    tx = n1 * dl[0] + kick * gx
    ty = n1 * dl[1] + kick * gy
    t2 = tx * tx + ty * ty
    n2sq = n2 * n2
    ok = t2 < n2sq
    tz = jnp.sqrt(jnp.where(ok, jnp.maximum(n2sq - t2, 0.0), 1.0))
    sign = jnp.sign(jnp.where(jnp.abs(dl[2]) < 1e-12, 1.0, dl[2]))
    inv = 1.0 / n2
    out_local = (tx * inv, ty * inv,
                 jnp.where(ok, tz * sign * inv, dl[2]))
    return v3.rot_t(out_local, Rw), ok


def kinoform_efficiency(order, lam0_um, wavelength_um):
    """Scalar-theory diffraction efficiency of a kinoform blazed for
    order m at lam0: eta = sinc^2(alpha - m), alpha = lam0/lam (unity at
    the design wavelength, zero at integer detunings)."""
    wl = jnp.where(wavelength_um > 0, wavelength_um, lam0_um)
    a = lam0_um / wl - order
    safe = jnp.abs(a) > 1e-9
    x = jnp.where(safe, a, 1.0) * jnp.pi
    return jnp.where(safe, (jnp.sin(x) / x) ** 2, 1.0)


def mla_dir(d, hit_local, Rw, pitch, f_lens):
    """Microlens array (beyond the reference): a square grid of ideal
    thin lenslets of traced ``pitch`` and focal length ``f_lens`` in
    the surface-local frame.  The hit's cell center is
    pitch * floor(x/pitch + 0.5) (a discrete choice, zero-gradient like
    every winner merge); within the cell, the ideal thin-lens slope map
    applies about the cell center:

        sx' = sx - (x - x_cell) / f

    (same in y).  Gradients flow through pitch, f and the hit
    coordinates — a Shack-Hartmann model is differentiable end-to-end."""
    dl = v3.rot(d, Rw)
    dz = dl[2]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    x, y = hit_local[0], hit_local[1]
    inv_p = 1.0 / jnp.maximum(pitch, 1e-9)
    xc = pitch * jnp.floor(x * inv_p + 0.5)
    yc = pitch * jnp.floor(y * inv_p + 0.5)
    inv_f = 1.0 / f_lens
    nx = dl[0] / dz_safe - (x - xc) * inv_f
    ny = dl[1] / dz_safe - (y - yc) * inv_f
    inv = 1.0 / jnp.sqrt(nx * nx + ny * ny + 1.0)
    sign = jnp.sign(jnp.where(jnp.abs(dz) < 1e-12, 1.0, dz))
    new_local = (nx * inv * sign, ny * inv * sign, inv * sign)
    return v3.rot_t(new_local, Rw)


def linear_dir(d, hit_local, Rw, Cx, Cy, Dx, Dy):
    """Ideal ABCD optic (phys/std.py:35-88): rotate the direction into the
    surface frame, normalize to dz=1, apply the per-axis linear map on
    (position, slope), renormalize, rotate back."""
    dl = v3.rot(d, Rw)
    dz = dl[2]
    dz_safe = jnp.where(jnp.abs(dz) < 1e-12, 1e-12, dz)
    nx = Cx * hit_local[0] + Dx * dl[0] / dz_safe
    ny = Cy * hit_local[1] + Dy * dl[1] / dz_safe
    inv = 1.0 / jnp.sqrt(jnp.maximum(nx * nx + ny * ny + 1.0, 1e-12))
    new_local = (nx * inv, ny * inv, inv)
    return v3.rot_t(new_local, Rw)


def apply_physics(ph_kind, ph, Rw, sb_kind, sb, hit_local, d, n, u):
    """Dense physics application (traced kinds — the non-sequential winner
    path).  All vectors are component tuples.

    Returns (new_dir tuple, intensity_mod [...]).

    NOTE: GRATING is only handled by the statically-specialized path
    (static_dispatch.apply_physics_one) because it needs per-ray
    wavelengths, and coated FRESNEL/FRESNEL_W surfaces compute their
    bare-interface R here (coatings need the static layer count); every
    Scene/SequentialScene entry point supplies static metadata, so this
    dense fallback never sees those in practice.
    """
    ior_in, ior_out = ph[..., 0], ph[..., 1]
    Cx, Cy, Dx, Dy = ph[..., 2], ph[..., 3], ph[..., 4], ph[..., 5]

    refl = reflect_dir(d, n)
    snell = snell_dir(d, n, ior_in, ior_out)
    fresnel = fresnel_dir(d, n, ior_in, ior_out, u)
    linear = linear_dir(d, hit_local, Rw, Cx, Cy, Dx, Dy)
    aper_pass = sb_check(sb_kind, sb, hit_local)
    aper_mod = aper_pass.astype(d[0].dtype)

    kind = ph_kind
    out = d
    zero = (jnp.zeros_like(d[0]),) * 3
    out = v3.where(kind == PhysKind.BLOCK, zero, out)
    out = v3.where(kind == PhysKind.REFLECT, refl, out)
    out = v3.where(kind == PhysKind.SNELL, snell, out)
    out = v3.where(kind == PhysKind.FRESNEL, fresnel, out)
    out = v3.where(kind == PhysKind.FRESNEL_W, snell, out)
    out = v3.where(kind == PhysKind.REFLECT_W, refl, out)
    out = v3.where(kind == PhysKind.LINEAR, linear, out)
    out = v3.where(kind == PhysKind.APERTURE, v3.scale(d, aper_mod), out)

    # weighted Fresnel: refract with intensity *= (1 - R); TIR keeps full
    # power (snell_dir already reflects)
    _, cos_i, n1, n2, _, tir, cos_t, _ = refract_components(
        d, n, ior_in, ior_out)
    R_w = jnp.where(tir, 0.0, fresnel_reflectance(cos_i, cos_t, n1, n2))

    ones = jnp.ones(jnp.broadcast_shapes(
        jnp.shape(ph_kind), d[0].shape), dtype=d[0].dtype)
    imod = ones
    imod = jnp.where(ph_kind == PhysKind.BLOCK, 0.0, imod)
    imod = jnp.where(ph_kind == PhysKind.APERTURE, aper_mod, imod)
    imod = jnp.where(ph_kind == PhysKind.FRESNEL_W,
                     jnp.clip(1.0 - R_w, 0.0, 1.0), imod)
    # weighted Fresnel reflection (ghost surface): reflect with
    # intensity *= R; TIR reflects with full power (R_w has tir -> 0,
    # but a TIR'd ghost surface reflects everything)
    imod = jnp.where(ph_kind == PhysKind.REFLECT_W,
                     jnp.where(tir, 1.0, jnp.clip(R_w, 0.0, 1.0)), imod)
    return out, imod
