"""Statically specialized bound/physics evaluation for the sequential path.

The dense compute-all-select design (geom/bounds.py, core/physics.py) is
required where surface kinds are traced per ray (the non-sequential winner
gather).  But in a *sequential* trace every surface row is visited by a
statically unrolled Python loop, and its kinds are compile-time constants —
so each step can evaluate exactly one bound formula and one physics model.
This cuts the per-ray FLOP count ~3-4x (the trace is VPU-bound, not
HBM-bound, on v5e), for bit-identical results.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import (CVX_EPS, CYL_EDGE_EPS, CYL_RECT_EPS, INTERSECT_EPS,
                         PhysKind, SBKind, VBKind)
from ..geom.surfaces import sag_z
from .physics import fresnel_dir, linear_dir, reflect_dir, snell_dir


def sb_check_one(kind: int, sb, hit):
    """Single-kind surface-local bound (cf. geom/bounds.py::sb_check).
    ``hit`` is a component tuple (x, y, z)."""
    x, y, z = hit
    p0, p1, p2 = sb[..., 0], sb[..., 1], sb[..., 2]
    if kind == SBKind.NONE:
        return jnp.ones(x.shape, bool)
    if kind == SBKind.DISK:
        dx_ = x - p1
        dy_ = y - p2
        return dx_ * dx_ + dy_ * dy_ <= p0
    if kind == SBKind.RECT:
        return (jnp.abs(x) <= p0) & (jnp.abs(y) <= p1)
    if kind == SBKind.ELLIPSE:
        u = x * jnp.cos(p2) - y * jnp.sin(p2)
        v = x * jnp.sin(p2) + y * jnp.cos(p2)
        return (u / p0) ** 2 + (v / p1) ** 2 <= 1.0
    if kind == SBKind.HEMI:
        return jnp.abs(z * p0) < 1.0 + INTERSECT_EPS
    if kind == SBKind.HEMI_APER:
        return (jnp.abs(z * p0) < 1.0 + INTERSECT_EPS) & (x * x + y * y <= p1)
    if kind == SBKind.CONE_NAPPE:
        return z * p0 >= -INTERSECT_EPS
    raise ValueError(f"unknown SBKind {kind}")


def vb_check_one(kind: int, vb, hp_n, hp_d, hp_mask, hit):
    """Single-kind volume bound (cf. geom/bounds.py::vb_check).
    ``hit`` is a component tuple (x, y, z)."""
    x, y, z = hit
    p = [vb[..., i] for i in range(8)]
    if kind == VBKind.NONE:
        return jnp.ones(x.shape, bool)
    if kind == VBKind.APER_R2:
        return x * x + y * y <= p[0]
    if kind == VBKind.Z_BETWEEN:
        return (z >= p[0]) & (z <= p[1])
    if kind == VBKind.RECT:
        return ((x <= p[1] + CYL_RECT_EPS) & (x >= p[0] - CYL_RECT_EPS)
                & (y <= p[3] + CYL_RECT_EPS) & (y >= p[2] - CYL_RECT_EPS))
    if kind == VBKind.CYL_EDGE:
        z_front = sag_z(p[0], y) + p[1]
        z_back = sag_z(p[2], y) + p[3]
        rect = ((x <= p[5] + CYL_RECT_EPS) & (x >= p[4] - CYL_RECT_EPS)
                & (y <= p[7] + CYL_RECT_EPS) & (y >= p[6] - CYL_RECT_EPS))
        return rect & (z >= z_front + CYL_EDGE_EPS) & (z <= z_back - CYL_EDGE_EPS)
    if kind == VBKind.HALFSPACES:
        if not hasattr(hp_n, 'ndim'):
            # Scalar-view row (pallas kernels: ops/pallas_trace.py
            # _SmemRow/_ValueRow) — unroll the padded planes with scalar
            # reads; the mask rides the flat table as float 0/1
            from ..constants import MAX_HALFSPACES
            ok = jnp.ones(x.shape, bool)
            for j in range(MAX_HALFSPACES):
                signed = (hp_n[..., j, 0] * x + hp_n[..., j, 1] * y
                          + hp_n[..., j, 2] * z) - hp_d[..., j]
                active = hp_mask[..., j] > 0.5
                ok = ok & ((signed < CVX_EPS) | ~active)
            return ok
        signed = (hp_n[..., 0] * x[..., None] + hp_n[..., 1] * y[..., None]
                  + hp_n[..., 2] * z[..., None]) - hp_d
        return jnp.all((signed < CVX_EPS) | ~hp_mask, axis=-1)
    raise ValueError(f"unknown VBKind {kind}")


class StaticRowMeta:
    """Compile-time kinds of one surface row, read off the element specs
    before tracing (Scene.static_meta)."""

    __slots__ = ('ph', 'sb', 'vb', 'sensor', 'invert', 'asph', 'disp',
                 'plane', 'slot', 'n_coat', 'dispm', 'metal', 'metal_nk',
                 'coat_k', 'ff', 'scatter', 'jones_chrom', 'jones_bire',
                 'grin_steps', 'doe', 'depol')

    def __init__(self, ph, sb, vb, sensor=False, invert=False, asph=False,
                 disp=False, plane=False, slot=0, n_coat=0,
                 dispm=(1, 1), metal=False, metal_nk=None, coat_k=None,
                 ff=None, scatter=None, jones_chrom=False,
                 jones_bire=None, grin_steps=0, doe=None, depol=False):
        self.ph, self.sb, self.vb = int(ph), int(sb), int(vb)
        self.sensor = bool(sensor)
        self.invert = bool(invert)
        self.asph = bool(asph)
        self.disp = bool(disp)
        self.plane = bool(plane)
        self.slot = int(slot)       # sensor slot index (0 if not a sensor)
        self.n_coat = int(n_coat)   # static thin-film layer count
        self.dispm = (int(dispm[0]), int(dispm[1]))  # per-side DispModel
        self.metal = bool(metal)    # REFLECT with absorbing substrate
        # static ((n knots), (k knots)) metal dispersion table, or None
        self.metal_nk = (tuple(map(tuple, metal_nk))
                         if metal_nk is not None else None)
        # static per-layer extinction coefficients (absorbing FILMS —
        # thin-metal beamsplitters, inconel ND).  Normalized to None when
        # every layer is dielectric so the cheap real-matrix coating path
        # stays the compile-time default.
        # STATIC freeform exponent pairs ((i, j), ...) or None
        self.ff = (tuple((int(a), int(b)) for a, b in ff)
                   if ff else None)
        ck = (tuple(float(k) for k in coat_k)
              if coat_k is not None else None)
        if ck is not None and not any(k != 0.0 for k in ck):
            ck = None
        self.coat_k = ck
        # STATIC scatter lobe model for PhysKind.SCATTER rows
        self.scatter = str(scatter) if scatter is not None else None
        # STATIC: JONES retardance scales as lam0/lam (true zero-order
        # waveplate dispersion; lam0 rides ph[4])
        self.jones_chrom = bool(jones_chrom)
        # STATIC crystal name: retardance ALSO scales by the material's
        # dn(lam)/dn(lam0) (utils/birefringence.py; core/field.py JONES)
        self.jones_bire = (str(jones_bire).upper()
                           if jones_bire is not None else None)
        # STATIC RK4 step count for PhysKind.GRIN rows (core/grin.py)
        self.grin_steps = int(grin_steps)
        # STATIC (n_radial_terms, efficiency_bool) for PhysKind.DOE rows
        # (traced coefficients ride the table ff row)
        self.doe = ((int(doe[0]), bool(doe[1]))
                    if doe is not None else None)
        # STATIC: SCATTER surfaces reset the tracked E-state (depolarize
        # proxy) instead of raising under track_field
        self.depol = bool(depol)


def dispersive_iors(row, wavelength_um, meta=None):
    """Per-ray media indices of a dispersive surface.

    Per-side model selection is static (``meta.dispm``, a DispModel pair;
    ``None`` keeps the legacy Cauchy-on-both-sides behavior).  The table's
    ``disp`` row is laid out [in-side 6 | out-side 6]:

    - CAUCHY: n = n_d + B (1/lambda^2 - 1/lambda_d^2) with B (um^2) in the
      side's slot 0 and the d-line index (0.5876 um) in ph[side].
    - SELLMEIER: n^2 = 1 + sum_i Bi lambda^2 / (lambda^2 - Ci), the
      side's six slots holding B1 B2 B3 C1 C2 C3 (Ci in um^2) — catalog
      accuracy ~1e-5 across 0.4-1.0 um (utils/glass.py::SELLMEIER).
    - NONE: the constant ph value.

    Unset wavelengths (0) evaluate at the d line."""
    from ..constants import DispModel
    d2 = 0.5876 ** 2
    l2 = jnp.where(wavelength_um > 0,
                   jnp.maximum(wavelength_um * wavelength_um, 1e-6), d2)
    inv_l2, inv_d2 = 1.0 / l2, 1.0 / d2
    models = meta.dispm if meta is not None else (DispModel.CAUCHY,
                                                  DispModel.CAUCHY)

    def side(j, base):
        nd = row.ph[..., j]
        if models[j] == DispModel.SELLMEIER:
            n2 = jnp.ones_like(l2)
            for i in range(3):
                B = row.disp[..., base + i]
                C = row.disp[..., base + 3 + i]
                den = l2 - C
                den = jnp.where(jnp.abs(den) < 1e-9,
                                jnp.where(den < 0, -1e-9, 1e-9), den)
                n2 = n2 + B * l2 / den
            return jnp.sqrt(jnp.maximum(n2, 1e-6))
        if models[j] == DispModel.CAUCHY:
            return nd + row.disp[..., base] * (inv_l2 - inv_d2)
        return nd + 0.0 * l2

    return side(0, 0), side(1, 6)


def coated_reflectance(meta: StaticRowMeta, row, d, n, n_in, n_out,
                       wavelength=None):
    """Unpolarized reflectance of this row's thin-film stack at the ray's
    incidence (utils/coatings.py characteristic matrices; meta.n_coat is
    the static layer count; row.coat interleaves (index, thickness_um)).

    The stack is listed from the LOW-index (air) side; a ray arriving
    from the substrate encounters the layers in reverse, which matters
    for asymmetric multilayers (Stokes reciprocity equates the two sides
    only when the layer ORDER is also reversed — a 2-layer MgF2/ZnS
    stack computed unreversed from the glass side is off by 4x in R).
    The side is detected per ray by n1 < n2 (arriving from the
    lower-index medium); single-layer stacks skip the second compute."""
    Rs, Rp = coated_reflectance_sp(meta, row, d, n, n_in, n_out, wavelength)
    return 0.5 * (Rs + Rp)


def coated_reflectance_sp(meta: StaticRowMeta, row, d, n, n_in, n_out,
                          wavelength=None):
    """Per-polarization (Rs, Rp) of this row's thin-film stack (same layer
    reversal rules as coated_reflectance); feeds the polarized Monte-Carlo
    draw so coated FRESNEL surfaces sample the branch with the true
    polarization-weighted reflectance."""
    Rs, Rp, _, _ = coated_rt_sp(meta, row, d, n, n_in, n_out, wavelength)
    return Rs, Rp


def coated_rt_sp(meta: StaticRowMeta, row, d, n, n_in, n_out,
                 wavelength=None):
    """Per-polarization (Rs, Rp, Ts, Tp) of this row's thin-film stack.

    ``meta.coat_k`` (static per-layer extinction, absorbing films) makes
    R + T < 1 — the deficit is the film absorptance.  Side asymmetry of
    R comes from the n1/n2 swap in refract_components (incidence side
    first); the layer-ORDER reversal below additionally matters only for
    multi-layer stacks, absorbing or not.  Unused outputs are dead-code
    eliminated by XLA, so callers that need only R pay nothing for T."""
    from ..utils.coatings import coating_rt
    from .physics import refract_components
    _, cos_i, n1, n2, _, _, _, _ = refract_components(d, n, n_in, n_out)
    ns = [row.coat[..., 2 * i] for i in range(meta.n_coat)]
    ds = [row.coat[..., 2 * i + 1] for i in range(meta.n_coat)]
    ks = list(meta.coat_k) if meta.coat_k is not None else None
    lam = (jnp.where(wavelength > 0, wavelength, 0.5876)
           if wavelength is not None else 0.5876)

    def RT_of(pol):
        R, T = coating_rt(ns, ds, n1, n2, cos_i, lam, pol=pol, k_stack=ks)
        if meta.n_coat > 1:
            R_rev, T_rev = coating_rt(
                ns[::-1], ds[::-1], n1, n2, cos_i, lam, pol=pol,
                k_stack=ks[::-1] if ks is not None else None)
            R = jnp.where(n1 < n2, R, R_rev)
            T = jnp.where(n1 < n2, T, T_rev)
        return R, T

    Rs, Ts = RT_of('s')
    Rp, Tp = RT_of('p')
    return Rs, Rp, Ts, Tp


def mirror_reflectances_sp(meta: StaticRowMeta, row, d, n, wavelength=None):
    """Per-polarization (Rs, Rp) of a metal-substrate mirror row (bare or
    dielectric-enhanced; utils/coatings.py::metal_reflectance).  The row's
    ph holds (n_metal, k_metal, n_ambient); coat interleaves the stack
    outermost-first — the same orientation the incidence side sees, so no
    reversal logic is needed (light only ever arrives from the ambient
    side of a mirror).

    With ``meta.metal_nk`` set (metal_dispersion=True on the element),
    the substrate (n, k) follows the ray wavelength by piecewise-linear
    interpolation of the static knot table (utils/coatings.py::
    metal_nk_at) — unset wavelengths (0) evaluate at the d line of the
    SAME table, so a dispersive mirror is self-consistent across rays
    with and without wavelengths (it does NOT fall back to the fixed
    METALS d-line entry, which differs by ~0.1% in R for Al)."""
    from ..utils.coatings import metal_nk_at, metal_reflectance
    from ..geom import vec3 as v3
    cos_i = jnp.abs(v3.dot(d, n))
    n_amb = row.ph[..., 2]
    ns = [row.coat[..., 2 * i] for i in range(meta.n_coat)]
    ds = [row.coat[..., 2 * i + 1] for i in range(meta.n_coat)]
    lam = (jnp.where(wavelength > 0, wavelength, 0.5876)
           if wavelength is not None else 0.5876)
    if meta.metal_nk is not None:
        n_m, k_m = metal_nk_at(meta.metal_nk[0], meta.metal_nk[1], lam)
    else:
        n_m, k_m = row.ph[..., 0], row.ph[..., 1]
    ks = list(meta.coat_k) if meta.coat_k is not None else None
    Rs = metal_reflectance(ns, ds, n_amb, n_m, k_m, cos_i, lam, pol='s',
                           k_stack=ks)
    Rp = metal_reflectance(ns, ds, n_amb, n_m, k_m, cos_i, lam, pol='p',
                           k_stack=ks)
    return Rs, Rp


def polarized_R(meta: StaticRowMeta, row, d, n, n_in, n_out, field,
                wavelength=None):
    """Polarization-weighted reflectance R_pol = (Rs |Es|^2 + Rp |Ep|^2)
    / |E|^2 at this interface for the rays' current field state.

    This is the branch probability of the *polarized* Monte-Carlo Fresnel
    draw (and the weighted-Fresnel loss under track_field): with the field
    renormalized per branch (core/field.py::transport_field), the
    intensity * |E|^2 sensor estimator is exactly energy-conserving —
    no selection-factor bias (generalizes reference phys/std.py:148-203
    to polarized input)."""
    R, _ = polarized_RT(meta, row, d, n, n_in, n_out, field, wavelength)
    return R


def polarized_RT(meta: StaticRowMeta, row, d, n, n_in, n_out, field,
                 wavelength=None):
    """Polarization-weighted (R_pol, T_pol) for the rays' field state.

    For bare and lossless-coated interfaces T_pol = 1 - R_pol; with an
    absorbing coating (meta.coat_k) R + T < 1 and the transmitted branch
    of the Monte-Carlo draw must carry the importance weight T/(1 - R)
    (apply_physics_one) for intensity*|E|^2 flux to stay unbiased.  TIR
    returns (1, 0)."""
    from .field import sp_power_fractions
    from .physics import fresnel_rs_rp, refract_components
    _, cos_i, n1, n2, _, tir, cos_t, _ = refract_components(
        d, n, n_in, n_out)
    if meta.n_coat:
        Rs, Rp, Ts, Tp = coated_rt_sp(meta, row, d, n, n_in, n_out,
                                      wavelength)
    else:
        Rs, Rp = fresnel_rs_rp(cos_i, cos_t, n1, n2)
        Ts, Tp = 1.0 - Rs, 1.0 - Rp
    fs, fp = sp_power_fractions(field.r_c, field.i_c, d, n)
    frac = jnp.maximum(fs + fp, 1e-20)
    R = (Rs * fs + Rp * fp) / frac
    T = (Ts * fs + Tp * fp) / frac
    return jnp.where(tir, 1.0, R), jnp.where(tir, 0.0, T)


def medium_after(meta: StaticRowMeta, row, d, n, u, wavelength=None,
                 field=None):
    """Refractive index of the medium a ray travels in AFTER this surface
    (for optical-path-length accumulation).  Refraction moves the ray into
    the transmission-side medium unless TIR (or a Fresnel reflection draw)
    keeps it in the incidence medium; every other interaction leaves the
    medium unchanged (returns None).  ``field`` (when track_field is on)
    makes the FRESNEL u < R compare use the same polarized R as the
    physics draw."""
    if meta.ph not in (PhysKind.SNELL, PhysKind.FRESNEL,
                       PhysKind.FRESNEL_W, PhysKind.DOE,
                       PhysKind.PHASE_GRID):
        return None
    from .physics import fresnel_reflectance, refract_components
    if meta.disp and wavelength is not None:
        n_in, n_out = dispersive_iors(row, wavelength, meta)
    else:
        n_in, n_out = row.ph[..., 0], row.ph[..., 1]
    dot, cos_i, n1, n2, mu, tir, cos_t, _ = refract_components(
        d, n, n_in, n_out)
    if meta.ph in (PhysKind.DOE, PhysKind.PHASE_GRID):
        return n2        # always transmits (evanescent orders are dead)
    if meta.ph in (PhysKind.SNELL, PhysKind.FRESNEL_W):
        return jnp.where(tir, n1, n2)
    if field is not None:
        R = polarized_R(meta, row, d, n, n_in, n_out, field, wavelength)
        return jnp.where(u < R, n1, n2)
    if meta.n_coat:
        R_raw = coated_reflectance(meta, row, d, n, n_in, n_out, wavelength)
    else:
        R_raw = fresnel_reflectance(cos_i, cos_t, n1, n2)
    R = jnp.where(tir, 1.0, R_raw)
    return jnp.where(u < R, n1, n2)


def apply_physics_one(meta: StaticRowMeta, row, hit_local, d, n, u,
                      wavelength=None, field=None, u2=None, grid=None,
                      grid_corners=None):
    """Single-kind physics (cf. core/physics.py::apply_physics).  ``d``,
    ``n``, ``hit_local`` are component tuples.

    ``field`` (a FieldState, set when the trace runs with
    ``track_field=True``) switches FRESNEL's Monte-Carlo branch draw and
    FRESNEL_W's intensity loss to the POLARIZED reflectance of the rays'
    actual field state (polarized_R) — the energy-exact estimator; without
    a field the unpolarized R is the only consistent choice."""
    kind = meta.ph
    ones = jnp.ones(d[0].shape, dtype=d[0].dtype)
    if meta.disp and wavelength is not None:
        n_in, n_out = dispersive_iors(row, wavelength, meta)
    else:
        n_in, n_out = row.ph[..., 0], row.ph[..., 1]
    if kind == PhysKind.TRANSMIT:
        return d, ones
    if kind == PhysKind.BLOCK:
        zero = (jnp.zeros_like(d[0]),) * 3
        return zero, jnp.zeros_like(ones)
    if kind == PhysKind.REFLECT:
        if meta.metal:
            # metal mirror (bare or dielectric-enhanced): the reflectance
            # R < 1 scales the intensity (reference mirrors are ideal,
            # elements/mirror.py:14-19 — this is the beyond-reference
            # physical-mirror model).  With a tracked field the loss is
            # polarization-weighted (the field itself is renormalized in
            # transport_field, so R is counted exactly once).
            Rs, Rp = mirror_reflectances_sp(meta, row, d, n, wavelength)
            if field is not None:
                from .field import sp_power_fractions
                fs, fp = sp_power_fractions(field.r_c, field.i_c, d, n)
                R = (Rs * fs + Rp * fp) / jnp.maximum(fs + fp, 1e-20)
            else:
                R = 0.5 * (Rs + Rp)
            return reflect_dir(d, n), R
        return reflect_dir(d, n), ones
    if kind == PhysKind.SNELL:
        return snell_dir(d, n, n_in, n_out), ones
    if kind == PhysKind.SCATTER:
        if meta.scatter is None:
            raise NotImplementedError(
                'SCATTER row without a static lobe model (scatter '
                'surfaces are not supported on this path — e.g. ghost '
                'synthesis)')
        if u2 is None:
            raise NotImplementedError(
                'SCATTER needs a second per-ray uniform (u2) — this '
                'driver path does not supply one')
        if field is not None and not meta.depol:
            raise NotImplementedError(
                'track_field through a SCATTER surface: scattering '
                'depolarizes, which a single E-vector cannot represent '
                'exactly.  Pass depolarize=True on the scatter element '
                'to reset the field to a unit transverse vector at each '
                'scatter (pragmatic proxy; core/field.py), or trace '
                'without track_field.')
        from .physics import scatter_dir
        albedo, sigma = row.ph[..., 2], row.ph[..., 3]
        return scatter_dir(meta.scatter, d, n, sigma, u, u2), albedo * ones
    if kind == PhysKind.JONES:
        if field is None:
            raise NotImplementedError(
                'polarizer/waveplate (JONES) surfaces act on the tracked '
                'E-field: trace with track_field=True (an unpolarized '
                'ensemble has no per-ray Jones action)')
        # geometric pass-through; the field update is transport_field's
        # JONES case (core/field.py) — power change lives in |E|^2
        return d, ones
    if kind == PhysKind.GRIN:
        raise NotImplementedError(
            'GRIN rods are a volumetric interaction handled by '
            'trace_sequential directly (core/grin.py::grin_surface_step) '
            '— this driver path does not support them; use '
            'SequentialScene.simulate')
    if kind == PhysKind.PHASE_GRID:
        if grid is None:
            raise NotImplementedError(
                'pixelated phase plates need their traced [H, W] grid '
                'side channel (Scene.side_grids) — this driver path '
                'does not supply it; use SequentialScene.simulate')
        from .physics import phase_grid_dir
        wl = (wavelength if wavelength is not None
              else jnp.zeros_like(d[0]))
        dot = (d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
        from_in = dot < 0
        n1 = jnp.where(from_in, n_in, n_out)
        n2 = jnp.where(from_in, n_out, n_in)
        out, ok = phase_grid_dir(d, row.Rw, hit_local, grid,
                                 row.ph[..., 2], row.ph[..., 3], wl,
                                 n1, n2, row.ph[..., 4], row.ph[..., 5],
                                 corners_fn=grid_corners)
        return out, ok.astype(d[0].dtype)
    if kind == PhysKind.FRESNEL:
        T_ov = None
        if field is not None:
            R_ov, T_ov = polarized_RT(meta, row, d, n, n_in, n_out, field,
                                      wavelength)
        elif meta.n_coat:
            Rs, Rp, Ts, Tp = coated_rt_sp(meta, row, d, n, n_in, n_out,
                                          wavelength)
            R_ov, T_ov = 0.5 * (Rs + Rp), 0.5 * (Ts + Tp)
        else:
            R_ov = None
        out = fresnel_dir(d, n, n_in, n_out, u, R_override=R_ov)
        if meta.coat_k is None:
            return out, ones
        # absorbing coating: the transmitted branch carries the importance
        # weight T/(1-R) so expected flux = R (reflect) + T (transmit) and
        # the film absorptance A = 1 - R - T is genuinely lost.  The
        # branch mask reproduces fresnel_dir's choice exactly (same R,
        # same where(tir, 1, R) clamp, same u compare).
        from .physics import refract_components
        _, _, _, _, _, tir, _, _ = refract_components(d, n, n_in, n_out)
        R_eff = jnp.where(tir, 1.0, R_ov)
        reflected = u < R_eff
        w_t = T_ov / jnp.maximum(1.0 - R_eff, 1e-12)
        return out, jnp.where(reflected, ones,
                              jnp.clip(w_t, 0.0, 1.0))
    if kind == PhysKind.FRESNEL_W:
        # deterministic weighted Fresnel: refract (TIR -> reflect, full
        # power), intensity *= (1 - R) — differentiable in R and thus in
        # coating thicknesses, unlike the FRESNEL branch draw.  Under
        # track_field, R is the polarized reflectance and the field is
        # renormalized per interaction (transport_field), so the loss is
        # counted exactly once, in the intensity.
        from .physics import fresnel_reflectance, refract_components
        _, cos_i, n1, n2, _, tir, cos_t, _ = refract_components(
            d, n, n_in, n_out)
        if field is not None:
            if meta.coat_k is not None:
                # absorbing coating: the deterministic weight is the true
                # transmittance T (< 1 - R; the film absorbs the rest)
                _, T = polarized_RT(meta, row, d, n, n_in, n_out, field,
                                    wavelength)
                imod = jnp.where(tir, 1.0, jnp.clip(T, 0.0, 1.0))
                return snell_dir(d, n, n_in, n_out), imod
            R = polarized_R(meta, row, d, n, n_in, n_out, field, wavelength)
            R = jnp.where(tir, 0.0, R)   # TIR reflects with full power
        elif meta.n_coat:
            if meta.coat_k is not None:
                Rs, Rp, Ts, Tp = coated_rt_sp(meta, row, d, n, n_in, n_out,
                                              wavelength)
                T = 0.5 * (Ts + Tp)
                imod = jnp.where(tir, 1.0, jnp.clip(T, 0.0, 1.0))
                return snell_dir(d, n, n_in, n_out), imod
            R = coated_reflectance(meta, row, d, n, n_in, n_out, wavelength)
        else:
            R = fresnel_reflectance(cos_i, cos_t, n1, n2)
        imod = jnp.where(tir, 1.0, jnp.clip(1.0 - R, 0.0, 1.0))
        return snell_dir(d, n, n_in, n_out), imod
    if kind == PhysKind.REFLECT_W:
        # deterministic weighted Fresnel REFLECTION — the ghost-surface
        # functor (utils/ghosts.py): always reflect, intensity *= R of
        # the interface the main beam would refract through.  TIR
        # reflects with full power.  Differentiable in R (and coating
        # thicknesses) like FRESNEL_W; under track_field the field takes
        # the (complex) reflection amplitudes and is renormalized
        # (transport_field), so R is counted exactly once here.
        from .physics import fresnel_reflectance, refract_components
        _, cos_i, n1, n2, _, tir, cos_t, _ = refract_components(
            d, n, n_in, n_out)
        if field is not None:
            R = polarized_R(meta, row, d, n, n_in, n_out, field, wavelength)
        elif meta.n_coat:
            R = coated_reflectance(meta, row, d, n, n_in, n_out, wavelength)
        else:
            R = fresnel_reflectance(cos_i, cos_t, n1, n2)
        imod = jnp.where(tir, 1.0, jnp.clip(R, 0.0, 1.0))
        return reflect_dir(d, n), imod
    if kind == PhysKind.LINEAR:
        return linear_dir(d, hit_local, row.Rw, row.ph[..., 2], row.ph[..., 3],
                          row.ph[..., 4], row.ph[..., 5]), ones
    if kind == PhysKind.APERTURE:
        # The aperture filter re-checks its own RAW bound (phys/filter.py:27)
        mod = sb_check_one(meta.sb, row.sb, hit_local).astype(d[0].dtype)
        from ..geom import vec3 as v3
        return v3.scale(d, mod), mod
    if kind == PhysKind.GRATING:
        from .physics import grating_dir
        wl = (wavelength if wavelength is not None
              else jnp.zeros_like(d[0]))
        out, ok = grating_dir(d, n, row.Rw, row.ph[..., 2], row.ph[..., 3],
                              row.ph[..., 4], wl)
        return out, ok.astype(d[0].dtype)
    if kind == PhysKind.MLA:
        from .physics import mla_dir
        return mla_dir(d, hit_local, row.Rw, row.ph[..., 0],
                       row.ph[..., 1]), ones
    if kind == PhysKind.DOE:
        from .physics import doe_dir, kinoform_efficiency
        n_terms, use_eff = meta.doe
        coeffs = [row.ff[..., i] for i in range(n_terms)]
        wl = (wavelength if wavelength is not None
              else jnp.zeros_like(d[0]))
        # side-aware media, same convention as refract_components
        dot = (d[0] * n[0] + d[1] * n[1] + d[2] * n[2])
        from_in = dot < 0
        n1 = jnp.where(from_in, n_in, n_out)
        n2 = jnp.where(from_in, n_out, n_in)
        out, ok = doe_dir(d, row.Rw, hit_local, coeffs, row.ph[..., 2],
                          row.ph[..., 3], wl, n1, n2)
        imod = ok.astype(d[0].dtype)
        if use_eff:
            imod = imod * kinoform_efficiency(row.ph[..., 2],
                                              row.ph[..., 3], wl)
        return out, imod
    raise ValueError(f"unknown PhysKind {kind}")
