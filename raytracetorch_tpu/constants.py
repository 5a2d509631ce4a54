"""Global numeric constants and kind enums for the TPU ray-trace engine.

The epsilon constellation mirrors the reference implementation so that
numerical behavior (hit acceptance, bound tolerances) matches:

- ``INTERSECT_EPS`` — minimum accepted ray parameter t; hits closer than this
  are treated as self-intersections and rejected
  (reference: ``geom/primitives.py:6`` ``intersectEpsilon = 1e-6``).
- ``SOLVER_EPS`` — |A| threshold below which the surface quadratic falls back
  to the linear solution t = -C/B (reference: ``geom/primitives.py:21,300``).
- ``BIG`` — finite stand-in for "miss" (the reference uses ``float('inf')``;
  we use a large finite value so masked arithmetic never produces inf-inf
  NaNs in forward or backward passes).
"""

import enum

INTERSECT_EPS = 1e-6   # reference geom/primitives.py:6
SOLVER_EPS = 1e-6      # reference geom/primitives.py:21 (self.epsilon)
SHAPE_EPS = 1e-7       # reference geom/shape.py:17 (unused in hot path)
NORMAL_EPS = 1e-8      # reference geom/primitives.py:341,489
BIG = 1e30             # finite "miss" distance
HIT_THRESHOLD = 1e29   # t below this counts as a hit (t_masked < HIT_THRESHOLD)

# Bound-check tolerances (match reference literals)
CVX_EPS = 1e-4         # reference geom/shape.py:127 (half-space slack)
CYL_RECT_EPS = 1e-5    # reference geom/cylindrics.py:36 (aperture slack)
CYL_EDGE_EPS = 1e-4    # reference geom/cylindrics.py:51 (edge z slack)

MAX_HALFSPACES = 8     # padded per-surface half-space bound capacity
MAX_COAT_LAYERS = 8     # thin-film stack ceiling per surface (table coat row
                        # is 2*MAX_COAT_LAYERS wide: (n, d_um) interleaved)
MAX_FF_TERMS = 32       # XY-polynomial term ceiling per freeform surface
                        # (32 covers the full monomial span of Zernike
                        # terms through n=6 / Noll j=28; compute cost is
                        # per STATIC term, the pad only sizes the table)
                        # (exponent pairs are STATIC; the table ff row holds
                        # the traced coefficients)


class GeomKind(enum.IntEnum):
    """Analytic surface families (reference geom/primitives.py classes).

    All are special cases of the diagonal implicit quadric
    ``F(p) = qx x^2 + qy y^2 + qz z^2 + lz z + q0 = 0`` — see
    :mod:`raytracetorch_tpu.geom.surfaces` for the (q, n_sign) encodings.
    """

    PLANE = 0        # reference geom/primitives.py:119
    SPHERE = 1       # reference geom/primitives.py:146
    CYLINDER = 2     # reference geom/primitives.py:190
    QUADRIC = 3      # reference geom/primitives.py:244
    QUADRIC_ZY = 4   # reference geom/primitives.py:346
    CONE = 5         # reference geom/primitives.py:398


class SBKind(enum.IntEnum):
    """Surface-local bounds, applied per candidate root
    (reference geom/bounded.py SurfaceBounded subclasses)."""

    NONE = 0
    DISK = 1         # params [radius^2]                  bounded.py:51
    RECT = 2         # params [hx, hy]                    bounded.py:67
    ELLIPSE = 3      # params [r_major, r_minor, rot]     bounded.py:85
    HEMI = 4         # params [c]; |z*c| < 1+eps          bounded.py:109
    HEMI_APER = 5    # params [c, (D/2)^2]                bounded.py:142
    CONE_NAPPE = 6   # params [slope]; z*slope >= -eps    bounded.py:189


class VBKind(enum.IntEnum):
    """Volume-level bounds, applied to the chosen hit in the element frame
    (reference geom/shape.py Shape.inBounds implementations)."""

    NONE = 0
    APER_R2 = 1      # params [radius^2]                  spherics.py:40-46
    Z_BETWEEN = 2    # params [z_lo, z_hi]                spherics.py:34-39
    RECT = 3         # params [xmin, xmax, ymin, ymax]    cylindrics.py:31-41
    CYL_EDGE = 4     # params [c1, z1, c2, z2, xmin, xmax, ymin, ymax]
                     #                                    cylindrics.py:44-55
    HALFSPACES = 5   # uses hp_n / hp_d / hp_mask arrays  shape.py:122-132


class DispModel(enum.IntEnum):
    """Per-medium chromatic dispersion model of a surface side (see
    core/static_dispatch.py::dispersive_iors; table ``disp`` layout is
    [in 6 | out 6] with Cauchy using the side's first slot)."""

    NONE = 0         # constant index (the stored ph value)
    CAUCHY = 1       # n = n_d + B (1/l^2 - 1/l_d^2), B from the Abbe number
    SELLMEIER = 2    # n^2 = 1 + sum Bi l^2/(l^2 - Ci) (3-term, um^2)


class PhysKind(enum.IntEnum):
    """Surface interaction functors (reference phys/std.py, phys/filter.py)."""

    TRANSMIT = 0     # phys/std.py:221
    BLOCK = 1        # phys/std.py:237
    REFLECT = 2      # phys/std.py:91
    SNELL = 3        # phys/std.py:111 (see PARITY.md: mu selection corrected)
    FRESNEL = 4      # phys/std.py:148
    LINEAR = 5       # phys/std.py:35
    APERTURE = 6     # phys/filter.py:10
    GRATING = 7      # (beyond reference) linear diffraction grating
    FRESNEL_W = 8    # (beyond reference) deterministic weighted Fresnel:
                     # always refract, intensity *= (1 - R) — the
                     # differentiable "main beam with coating losses"
                     # model (MC FRESNEL branch draws are stop-gradient)
    REFLECT_W = 9    # (beyond reference) deterministic weighted Fresnel
                     # REFLECTION: always reflect, intensity *= R — the
                     # ghost-surface functor (utils/ghosts.py synthesizes
                     # two-reflection stray-light paths from these)
    SCATTER = 10     # (beyond reference) stochastic surface scattering:
                     # new direction drawn from a lobe (model static on
                     # StaticRowMeta.scatter: 'lambert' cosine about the
                     # normal, 'gauss_r' Gaussian about specular,
                     # 'gauss_t' Gaussian about straight-through),
                     # intensity *= albedo (ph[2]); lobe width sigma rad
                     # = ph[3] (differentiable via reparameterization).
                     # Needs TWO per-ray uniforms (u, u2).
    JONES = 11       # (beyond reference) polarization optics element
                     # (linear polarizer / waveplate): direction and
                     # intensity unchanged; the tracked E-field is
                     # multiplied by a Jones matrix with eigen-axes at
                     # angle ph[0] (rad, about the element-local x axis
                     # in the transverse plane), amplitude eigenvalues
                     # ph[1]/ph[2] and retardance ph[3] (rad; fast axis
                     # = axis 1).  ph[4] = design wavelength um when
                     # StaticRowMeta.jones_chrom (retardance scales as
                     # lam0/lam).  Requires track_field=True (raises
                     # otherwise — there is no intensity-only model of
                     # a polarizer acting on an unpolarized ensemble).
    GRIN = 12        # (beyond reference) gradient-index rod ENTRY plane:
                     # the interaction couples the ray in (tangential-p
                     # Snell), RK4-integrates the z-parametrized ray ODE
                     # through n^2 = ph[1] + ph[2] r^2 + ph[3] r^4 +
                     # ph[4] z over thickness ph[5] (ambient index
                     # ph[0]), and lands it at the exit face
                     # (core/grin.py).  Step count is static
                     # (StaticRowMeta.grin_steps).  Sequential driver
                     # only; other drivers assert.
    DOE = 13         # (beyond reference) radial-phase diffractive
                     # surface (kinoform lens): tangential momentum kick
                     # n2 d_t = n1 d_t + m lam grad(phi), phi = sum c_k
                     # r^(2k) cycles with traced c_k in the table ff
                     # row (term count static: StaticRowMeta.doe).
                     # ph = (n_in, n_out, order m, lam0_um, 0, 0); power
                     # scales as lam/lam0 (V = -3.452 — the hybrid-
                     # achromat lever).  Optional sinc^2 kinoform
                     # efficiency into intensity (meta.doe[1]).
    PHASE_GRID = 15  # (beyond reference) pixelated phase plate: a
                     # TRACED [H, W] phase map (cycles) bilinearly
                     # interpolated over the rect aperture; momentum
                     # kick n2 d_t = n1 d_t + m lam grad(phi) like DOE
                     # but with a freely-optimizable per-pixel profile
                     # ("deep optics" / kinoform holography).  The grid
                     # rides a side channel (Scene.side_grids), not the
                     # fixed-width table row; sequential XLA driver
                     # only.  ph = (n_in, n_out, m, lam0, hx, hy).
    MLA = 14         # (beyond reference) microlens array: square grid
                     # of ideal thin lenslets, pitch ph[0], lenslet
                     # focal length ph[1] (both traced).  The hit's
                     # cell index is floor(x/pitch + 0.5) (discrete,
                     # zero-gradient like a winner merge); the slope
                     # kick is the ideal thin-lens map about the cell
                     # center.  The Shack-Hartmann building block.
