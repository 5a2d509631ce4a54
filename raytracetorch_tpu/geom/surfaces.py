"""Unified analytic surface representation and branchless intersection solver.

Every surface family in the reference (``geom/primitives.py``: Plane, Sphere,
Cylinder, Quadric, QuadricZY, Cone) is a special case of the diagonal implicit
quadric

    F(p) = qx*x^2 + qy*y^2 + qz*z^2 + lz*z + q0 = 0

so the whole geometry engine reduces to ONE coefficient build + ONE quadratic
solve + ONE gradient-normal formula, evaluated densely for all (ray, surface)
pairs — no per-type dispatch, no dynamic shapes, pure VPU-friendly FMAs.

Encodings (verified against the reference's per-class ``_solve_t``):

=============  =========================================  ======  ==========
kind           q = (qx, qy, qz, lz, q0)                   n_sign  reference
=============  =========================================  ======  ==========
PLANE          (0, 0, 0, -2, 0)                           -1      :119
SPHERE(R)      (1, 1, 1, 0, -R^2)                         +1      :146
CYLINDER(R)    (1, 1, 0, 0, -R^2)                         +1      :190
QUADRIC(c,k)   (c, c, c(1+k), -2, 0)                      -1      :244
QUADRICZY(c,k) (0, c, c(1+k), -2, 0)                      -1      :346
CONE(s)        (-s^2, -s^2, 1, 0, 0)                      +1      :398
=============  =========================================  ======  ==========

``n_sign`` matches each reference class's normal orientation choice (e.g.
Quadric returns the *negated* normalized gradient, primitives.py:343; Sphere
returns ``pos/R`` = +gradient, :185).

Solver semantics (matches reference ``_solve_quadratic``, primitives.py:290):
- discriminant < 0 -> miss (both roots invalid)
- |A| < eps  -> linear fallback t = -C / B_safe
- roots <= INTERSECT_EPS rejected by the caller (min-positive selection)

All miss handling uses (value, valid) pairs with finite sentinels instead of
inf, so forward AND backward passes are NaN-free (the reference relies on
inf masking which is grad-hazardous; see SURVEY.md §7 hazard checklist).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import BIG, INTERSECT_EPS, NORMAL_EPS, SOLVER_EPS


# ---------------------------------------------------------------------------
# Coefficient constructors (used by the element spec layer at table build)
# ---------------------------------------------------------------------------

def q_plane():
    return jnp.array([0.0, 0.0, 0.0, -2.0, 0.0]), -1.0


def q_sphere(radius):
    r2 = radius * radius
    one = jnp.ones_like(r2)
    zero = jnp.zeros_like(r2)
    return jnp.stack([one, one, one, zero, -r2]), 1.0


def q_cylinder(radius):
    r2 = radius * radius
    one = jnp.ones_like(r2)
    zero = jnp.zeros_like(r2)
    return jnp.stack([one, one, zero, zero, -r2]), 1.0


def q_quadric(c, k):
    c = jnp.asarray(c, dtype=jnp.result_type(float))
    k = jnp.asarray(k, dtype=c.dtype)
    zero = jnp.zeros_like(c)
    return jnp.stack([c, c, c * (1.0 + k), jnp.full_like(c, -2.0), zero]), -1.0


def q_quadric_zy(c, k):
    c = jnp.asarray(c, dtype=jnp.result_type(float))
    k = jnp.asarray(k, dtype=c.dtype)
    zero = jnp.zeros_like(c)
    return jnp.stack([zero, c, c * (1.0 + k), jnp.full_like(c, -2.0), zero]), -1.0


def q_cone(slope):
    s2 = slope * slope
    one = jnp.ones_like(s2)
    zero = jnp.zeros_like(s2)
    return jnp.stack([-s2, -s2, one, zero, zero]), 1.0


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------

def ray_coeffs(q, o, d):
    """Quadratic coefficients A t^2 + B t + C = 0 of F(o + t d) = 0.

    ``q [..., 5]``; ``o``/``d`` are component tuples (x, y, z) of [...]
    arrays (see geom/vec3.py for why the planar layout).
    """
    qx, qy, qz, lz, q0 = (q[..., i] for i in range(5))
    ox, oy, oz = o
    dx, dy, dz = d
    A = qx * dx * dx + qy * dy * dy + qz * dz * dz
    B = 2.0 * (qx * ox * dx + qy * oy * dy + qz * oz * dz) + lz * dz
    C = qx * ox * ox + qy * oy * oy + qz * oz * oz + lz * oz + q0
    return A, B, C


def solve_roots(q, o, d):
    """Both candidate ray parameters, as ((t1, v1), (t2, v2)).

    Invalid roots carry ``valid=False`` and a sanitized finite ``t`` so any
    downstream arithmetic on the unselected branch stays NaN-free.
    """
    A, B, C = ray_coeffs(q, o, d)
    disc = B * B - 4.0 * A * C
    hit = disc >= 0.0
    # Double-where keeps miss-branch gradients clean; the tiny epsilon keeps
    # d sqrt/d disc finite at disc == 0 exactly (tangent hits and degenerate
    # zero-direction rays), which would otherwise NaN-poison masked branches
    # via 0 * inf in the backward pass.
    sqrt_delta = jnp.sqrt(jnp.where(hit, disc, 1.0) + 1e-24)

    linear = jnp.abs(A) < SOLVER_EPS
    A_safe = jnp.where(linear, 1.0, A)
    B_safe = jnp.where(jnp.abs(B) < SOLVER_EPS, SOLVER_EPS, B)

    t1 = (-B - sqrt_delta) / (2.0 * A_safe)
    t2 = (-B + sqrt_delta) / (2.0 * A_safe)
    t_lin = -C / B_safe

    t1 = jnp.where(linear, t_lin, t1)
    t2 = jnp.where(linear, t_lin, t2)
    # Degenerate rays (A ~ 0 AND B ~ 0) have no real solution: mark invalid.
    # (The reference's paths diverge here — Quadric keeps a huge-t pseudo-hit,
    # Cylinder NaNs into a miss; a clean miss is strictly more correct.)
    lin_ok = linear & (jnp.abs(B) >= SOLVER_EPS)
    # pure boolean select (a where over bools lowers to an unsupported
    # i8->i1 truncation in Mosaic)
    v1 = lin_ok | (~linear & hit)
    v2 = v1
    return (t1, v1), (t2, v2)


REL_EPS = 1e-5   # see min_positive: float32 self-intersection headroom


def min_positive(roots, scale=None):
    """Min-positive-root selection (reference ``_check_t``,
    primitives.py:28-36): reject t <= eps and invalid roots; return
    ``(t, valid)`` with ``t`` sanitized to 0 when no root survives.

    ``roots`` is an iterable of ``(t, valid)`` pairs (valid may already
    include surface-local bound checks, cf. bounded.py:20-36).

    ``scale`` (optional, [...]): magnitude of the ray origin in the surface
    frame.  The reject threshold becomes ``INTERSECT_EPS + REL_EPS*scale``:
    a float32 hit point recomputed at coordinates ~|o| lies O(ulp * |o|) off
    the surface, so a purely absolute epsilon (the reference's 1e-6,
    primitives.py:6) lets the *next* bounce re-hit the same surface at
    t ~ 1e-6 and double-apply its physics.  The relative term keeps
    self-intersection rejection robust at any scene scale while remaining
    far below any legitimate inter-surface distance.
    """
    eps = INTERSECT_EPS if scale is None else INTERSECT_EPS + REL_EPS * scale
    t_best = None
    for t, v in roots:
        keep = v & (t > eps)
        t_masked = jnp.where(keep, t, BIG)
        t_best = t_masked if t_best is None else jnp.minimum(t_best, t_masked)
    valid = t_best < BIG * 0.5
    return jnp.where(valid, t_best, 0.0), valid


def surface_normal(q, n_sign, p_local):
    """Unit normal (component tuple) from the implicit gradient, with the
    per-family orientation sign and the degenerate-gradient guard defaulting
    to +Z (reference Cone._getNormal, primitives.py:468-497; Quadric
    normalization :330-343).  ``p_local`` is a component tuple."""
    qx, qy, qz, lz = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    gx = 2.0 * qx * p_local[0]
    gy = 2.0 * qy * p_local[1]
    gz = 2.0 * qz * p_local[2] + lz
    g2 = gx * gx + gy * gy + gz * gz
    degen = g2 < NORMAL_EPS * NORMAL_EPS
    inv = jnp.where(n_sign < 0, -1.0, 1.0) / (
        jnp.sqrt(jnp.where(degen, 1.0, g2)) + NORMAL_EPS)
    nx = jnp.where(degen, 0.0, gx * inv)
    ny = jnp.where(degen, 0.0, gy * inv)
    nz = jnp.where(degen, jnp.ones_like(gz), gz * inv)
    return nx, ny, nz


def asph_sag(c, kc2, coeffs, r2):
    """Even-asphere sag: conic term + polynomial r^4..r^10 terms.

    z(r) = c r^2 / (1 + sqrt(1 - (1+k) c^2 r^2)) + a4 r^4 + a6 r^6 + ...
    with ``kc2 = (1+k) c^2`` (the product form stays well-defined as c -> 0).
    The industry-standard surface the reference stubs out
    (geom/complex.py:6-10 raises NotImplementedError).
    """
    term = jnp.maximum(1.0 - kc2 * r2, 0.0)
    z = c * r2 / (1.0 + jnp.sqrt(term + 1e-24))
    rp = r2 * r2
    for a in coeffs:
        z = z + a * rp
        rp = rp * r2
    return z


def asph_refine(c, kc2, coeffs, o, d, t0, valid, n_iter=4):
    """Halley-refine a conic-surface root onto the aspheric surface.

    Solves G(t) = z(t) - sag(r(t)^2) = 0 along the ray starting from the
    base-conic hit ``t0``; fixed iteration count keeps it jit-static and
    differentiable (implicit-function gradients flow through the final
    residual evaluation).  Halley's cubic update
    ``t -= 2 G G' / (2 G'^2 - G G'')`` reaches Newton-8's residual floor
    in 4 iterations at ~1.35x the per-iteration cost (measured on a
    k=-2, a4=1e-3 asphere with 30-degree marginal rays: max |t - t_ref|
    5.6e-6 for Halley-4 vs 4.8e-6 for Newton-8; Newton-4 left 1.7% of
    rays unconverged) — about 30% off the asphere refine tax.
    Returns (t, still_valid).
    """
    def G_dG_d2G(t):
        x = o[0] + t * d[0]
        y = o[1] + t * d[1]
        z = o[2] + t * d[2]
        r2 = x * x + y * y
        g = z - asph_sag(c, kc2, coeffs, r2)
        # S'(r2): conic term + polynomial
        term = jnp.maximum(1.0 - kc2 * r2, 0.0)
        sq = jnp.sqrt(term + 1e-24)
        inv = 1.0 / (2.0 * sq * (1.0 + sq) ** 2)
        dsag = c / (1.0 + sq) + c * r2 * kc2 * inv
        rp, i = r2, 2.0
        for a in coeffs:
            dsag = dsag + i * a * rp
            rp = rp * r2
            i = i + 1.0
        # S''(r2): d/dr2 of both conic pieces (dsq = -kc2 / (2 sq)) + poly
        dsq = -kc2 * (0.5 / sq)
        dinv = -(1.0 / sq + 2.0 / (1.0 + sq)) * inv * dsq
        d2sag = 2.0 * c * kc2 * inv + c * r2 * kc2 * dinv
        rp, i = jnp.ones_like(r2), 2.0
        for a in coeffs:
            d2sag = d2sag + i * (i - 1.0) * a * rp
            rp = rp * r2
            i = i + 1.0
        # chain rule along the ray: r2(t) quadratic in t
        dr2 = 2.0 * (x * d[0] + y * d[1])
        d2r2 = 2.0 * (d[0] * d[0] + d[1] * d[1])
        dg = d[2] - dsag * dr2
        d2g = -(d2sag * dr2 * dr2 + dsag * d2r2)
        return g, dg, d2g

    t = t0
    for _ in range(n_iter):
        g, dg, d2g = G_dG_d2G(t)
        denom = 2.0 * dg * dg - g * d2g
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        t = t - 2.0 * g * dg / denom
    g, _, _ = G_dG_d2G(t)
    converged = jnp.abs(g) < 1e-4
    return t, valid & converged & (t > INTERSECT_EPS)


def asph_normal(c, kc2, coeffs, p_local):
    """Unit normal of the aspheric surface, oriented like the reference
    quadrics (+z at the vertex): gradient of G = z - sag(r^2)."""
    x, y, z = p_local
    r2 = x * x + y * y
    term = jnp.maximum(1.0 - kc2 * r2, 0.0)
    sq = jnp.sqrt(term + 1e-24)
    dsag = c / (1.0 + sq) + c * r2 * kc2 / (
        2.0 * sq * (1.0 + sq) ** 2)
    rp, i = r2, 2.0
    for a in coeffs:
        dsag = dsag + i * a * rp
        rp = rp * r2
        i = i + 1.0
    # grad(z - S(r^2)) = (-S' * 2x, -S' * 2y, 1)
    gx = -2.0 * dsag * x
    gy = -2.0 * dsag * y
    gz = jnp.ones_like(z)
    inv = 1.0 / jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-24)
    return gx * inv, gy * inv, gz * inv


def sag_z(c, r):
    """Sag (z height above the vertex) of a curvature-c surface at radial
    coordinate r (reference HalfSphere.sagittalZ, bounded.py:129-139; the
    relu clamp keeps the sqrt differentiable past the hemisphere rim)."""
    r2 = r * r
    term = jax_relu(1.0 - c * c * r2)
    denom = 1.0 + jnp.sqrt(term + 1e-24)
    return (c * r2) / denom


def jax_relu(x):
    return jnp.maximum(x, 0.0)


# ---------------------------------------------------------------------------
# Freeform (XY-polynomial) surfaces
# ---------------------------------------------------------------------------

def _ipow(v, n):
    """v**n for a small STATIC integer n, as an explicit multiply chain
    (stays planar/VPU-friendly and Mosaic-safe)."""
    out = None
    for _ in range(int(n)):
        out = v if out is None else out * v
    return out if out is not None else jnp.ones_like(v)


def ff_sag_grad(c, kc2, asph_coeffs, powers, ff_coeffs, x, y):
    """Freeform sag and its partials.

    S(x, y) = conic(r²) + even-asphere(r²) + Σ_m c_m x^i_m y^j_m, the
    industry XY-polynomial surface (no rotational symmetry — anamorphic
    and off-axis corrector terms).  ``powers`` is a STATIC tuple of
    (i, j) integer exponent pairs, unrolled at trace time;
    ``ff_coeffs`` the matching traced coefficients.  Returns
    ``(S, dS/dx, dS/dy)`` — the partials drive both the Newton root
    refinement and the exact surface normal, so refraction through a
    freeform is differentiable in every coefficient.
    """
    r2 = x * x + y * y
    term = jnp.maximum(1.0 - kc2 * r2, 0.0)
    sq = jnp.sqrt(term + 1e-24)
    sag = c * r2 / (1.0 + sq)
    dsag = c / (1.0 + sq) + c * r2 * kc2 / (2.0 * sq * (1.0 + sq) ** 2)
    rp, i = r2 * r2, 2.0
    drp = r2
    for a in asph_coeffs:
        sag = sag + a * rp
        dsag = dsag + i * a * drp
        rp = rp * r2
        drp = drp * r2
        i = i + 1.0
    gx = 2.0 * x * dsag
    gy = 2.0 * y * dsag
    for (pi, pj), cm in zip(powers, ff_coeffs):
        xi = _ipow(x, pi)
        yj = _ipow(y, pj)
        sag = sag + cm * xi * yj
        if pi > 0:
            gx = gx + cm * float(pi) * _ipow(x, pi - 1) * yj
        if pj > 0:
            gy = gy + cm * float(pj) * xi * _ipow(y, pj - 1)
    return sag, gx, gy


def ff_refine(c, kc2, asph_coeffs, powers, ff_coeffs, o, d, t0, valid,
              n_iter=8):
    """Newton-refine a base-conic root onto the freeform surface.

    Same implicit-function scheme as :func:`asph_refine` (fixed
    iteration count, gradients flow through the final residual), but
    first-order only — the XY polynomial's second partials buy little
    here and Newton-8 matches Halley-4's residual floor on the
    magnitudes freeform correctors use (|coeff·x^i y^j| ≪ aperture).
    """
    def G_dG(t):
        x = o[0] + t * d[0]
        y = o[1] + t * d[1]
        z = o[2] + t * d[2]
        sag, gx, gy = ff_sag_grad(c, kc2, asph_coeffs, powers, ff_coeffs,
                                  x, y)
        g = z - sag
        dg = d[2] - gx * d[0] - gy * d[1]
        return g, dg

    t = t0
    for _ in range(n_iter):
        g, dg = G_dG(t)
        dg = jnp.where(jnp.abs(dg) < 1e-12,
                       jnp.where(dg < 0, -1e-12, 1e-12), dg)
        t = t - g / dg
    g, _ = G_dG(t)
    converged = jnp.abs(g) < 1e-4
    return t, valid & converged & (t > INTERSECT_EPS)


def ff_normal(c, kc2, asph_coeffs, powers, ff_coeffs, p_local):
    """Unit normal of the freeform surface (+z at the vertex):
    grad(z - S(x, y)) = (-dS/dx, -dS/dy, 1), normalized."""
    x, y, _ = p_local
    _, gx, gy = ff_sag_grad(c, kc2, asph_coeffs, powers, ff_coeffs, x, y)
    gz = jnp.ones_like(x)
    inv = 1.0 / jnp.sqrt(gx * gx + gy * gy + 1.0 + 1e-24)
    return -gx * inv, -gy * inv, gz * inv
