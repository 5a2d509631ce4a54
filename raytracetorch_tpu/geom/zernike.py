"""Exact Cartesian (monomial) expansion of Zernike circle polynomials.

Zernike-sag surfaces (the other industry freeform standard next to the XY
polynomial; no reference counterpart — the reference's most general
surface is the stubbed even asphere, reference geom/complex.py:6-10) are
XY polynomials under a FIXED linear change of basis: every Noll term
Z_j(rho, theta) expands exactly into monomials x^i y^j of total degree n.
Building that expansion HOST-side (exact rational arithmetic, static
per-scene) lets a Zernike surface ride the entire existing freeform
trace path — XLA driver, both fused Pallas kernels, Newton refinement,
exact normals, gradients — with zero new kernel code, while the
parameter pytree stays in the Zernike basis (so ``jax.grad`` designs in
the coefficients opticians actually use).

Conventions match utils/wavefront.py::zernike_basis: Noll ordering,
m >= 0 -> cos(m theta), m < 0 -> sin(|m| theta), and NO normalization
factor — a coefficient is the peak sag contribution of its term at the
rim of the normalization radius, in length units.
"""

from __future__ import annotations

from fractions import Fraction
from math import comb, factorial


def noll_nm(j):
    """Radial/azimuthal orders (n, m) of Noll index ``j`` (j >= 1).

    Noll's rule: terms sorted by n, then |m| ascending; the sign of m is
    chosen so even j carries cos (m > 0) and odd j carries sin (m < 0).
    The first 15 reproduce utils/wavefront.py::_NOLL_NM exactly
    (regression-tested).
    """
    if j < 1:
        raise ValueError(f"Noll index starts at 1, got {j}")
    jj = 0
    n = 0
    while True:
        for m_abs in range(n % 2, n + 1, 2):
            reps = 1 if m_abs == 0 else 2
            for _ in range(reps):
                jj += 1
                if jj == j:
                    if m_abs == 0:
                        return n, 0
                    return n, (m_abs if jj % 2 == 0 else -m_abs)
        n += 1


def zernike_xy_poly(n, m):
    """{(i, k): Fraction} monomial coefficients of Z_n^m on the UNIT disk.

    Z_n^m(u, v) = R_n^|m|(rho) * {cos, sin}(|m| theta) with rho^2 = u^2+v^2,
    expanded via rho^|m| cos(|m|t) = Re[(u+iv)^|m|] (Im for sin) and the
    binomial theorem — exact rational arithmetic end to end, so the basis
    change introduces no rounding beyond the final float cast.
    """
    ma = abs(m)
    if (n - ma) % 2 or ma > n:
        raise ValueError(f"invalid Zernike orders (n={n}, m={m})")
    # angular factor: Re/Im[(u + i v)^|m|]
    ang = {}
    if m >= 0:
        if ma == 0:
            ang[(0, 0)] = Fraction(1)
        else:
            for t in range(0, ma + 1, 2):
                ang[(ma - t, t)] = Fraction((-1) ** (t // 2) * comb(ma, t))
    else:
        for t in range(1, ma + 1, 2):
            ang[(ma - t, t)] = Fraction((-1) ** ((t - 1) // 2) * comb(ma, t))
    poly = {}
    for s in range((n - ma) // 2 + 1):
        c = Fraction(
            (-1) ** s * factorial(n - s),
            factorial(s) * factorial((n + ma) // 2 - s)
            * factorial((n - ma) // 2 - s))
        p = (n - 2 * s - ma) // 2          # radial remainder (u^2 + v^2)^p
        for a in range(p + 1):
            rad = Fraction(comb(p, a))
            for (ai, aj), ac in ang.items():
                key = (ai + 2 * a, aj + 2 * (p - a))
                poly[key] = poly.get(key, Fraction(0)) + c * rad * ac
    return {k: v for k, v in poly.items() if v != 0}


def zernike_monomial_map(indices, norm_radius):
    """Static basis-change for a Zernike-sag surface.

    ``indices``: Noll j's of the traced terms; ``norm_radius``: the radius
    the polynomials are normalized over (lens units).  Returns
    ``(powers, M)`` where ``powers`` is the sorted tuple of (i, k)
    monomial exponent pairs (static scene structure, feeds
    SurfaceRec.ff_powers) and ``M[r][c]`` is the float weight of Zernike
    coefficient c on monomial r — already scaled by norm_radius^-(i+k),
    so monomial coefficients (lens units) are ``M @ z`` for Zernike
    coefficients ``z`` (sag length units).
    """
    polys = [zernike_xy_poly(*noll_nm(int(j))) for j in indices]
    powers = sorted({k for p in polys for k in p})
    R = float(norm_radius)
    if R <= 0.0:
        raise ValueError(f"norm_radius must be positive, got {R}")
    M = [[float(p.get(mn, Fraction(0))) / R ** (mn[0] + mn[1])
          for p in polys] for mn in powers]
    return tuple(powers), M
