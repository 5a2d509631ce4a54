"""Split-step scalar beam propagation ("wave trace") through a scene.

Propagates a sampled complex field through a SequentialScene's element
chain: each optical face collapses onto its vertex plane as a thin
phase screen ``OPD(x, y) = (n_before - n_after) * sag(x, y)`` (the
exact thin-screen limit of refraction — two such screens plus the
in-glass propagation reproduce the lensmaker equation, and conic /
even-asphere terms ride the sag exactly), with angular-spectrum
propagation (utils/propagation.py) between consecutive planes in the
local medium.  This is the standard split-step BPM of photonics codes,
here differentiable end-to-end: ``jax.grad`` of any functional of the
output field flows back to curvatures, thicknesses, conics, asphere
coefficients, poses and ideal-lens powers, so a design can be
optimized directly for a WAVE metric (on-axis intensity, fiber
overlap) instead of ray spots.

The ray tracer and this wave trace are two independent models of the
same prescription — tests/test_beamprop.py cross-validates them (the
through-focus peak of the benchmark singlet lands at the ray-optics
best focus; an ideal thin lens focuses a Gaussian to the ABCD waist).

Validity: thin-screen sag collapse needs |sag| << the distances being
propagated and the field's angular content inside the paraxial-ish
band (the propagator itself is exact; the screens are the
approximation).  Element TILTS enter as their exact small-angle prism
term ``(n_b - n_a) * (rx * y - ry * x)``.  Axis-aligned MIRRORS are
UNFOLDED: the walk tracks zeta(z) = fold_s * z + fold_o, a reflection
applies the round-trip screen ``2 n fold_s sag`` and flips the map, so
telescopes (fold chains, Cassegrains) wave-trace on one effective
axis; off-axis mirrors raise.

AMPLITUDES are physical where the ray model's are: faces of lenses
with Fresnel physics apply the flux-normalized complex transmission
of their (possibly coated) stack at normal incidence
(utils/coatings.py::coating_amplitudes — |t|^2 = T, so wave-traced
sensor power tracks the ray tracer's intensity * |E|^2 flux), metal
mirrors apply the coated stack's complex r (|r|^2 = R plus the
phase-on-reflection), and plain-SNELL faces / ideal mirrors stay
unit-amplitude exactly like the ray intensity path.

The torch reference has no wave model at all (rays only); this extends
the physical-optics layer (utils/psf.py, utils/propagation.py) from
pupil-plane analysis to full-system propagation.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..elements.aperture import (CircularAperture, EllipticAperture,
                                 RectangularAperture)
from ..elements.diffractive import DiffractiveLens, PhaseGridPlate
from ..elements.grin import GrinRod
from ..elements.ideal import IdealThinLens
from ..elements.lens import (AsphericLens, CylSingletLens, FreeformLens,
                             ZernikeLens, _SphericLens)
from ..elements.mirror import (AsphericMirror, ConicMirror,
                               CylindricalMirror, ManginMirror,
                               ParabolicMirror, SphericalMirror)
from ..elements.polarization import _JonesPlate
from ..elements.sensor import SensorElement
from ..geom.surfaces import ff_sag_grad, sag_z
from .propagation import angular_spectrum

__all__ = ['wave_trace', 'wave_trace_vector']


def _cscale(comps, amp):
    """Multiply every component by the COMPLEX scalar ``amp = (re, im)``
    (amplitude+phase screens: Fresnel/coating transmission, metal
    reflection)."""
    ar, ai = amp
    return tuple((r * ar - i * ai, r * ai + i * ar) for r, i in comps)


def _lens_face_amp(el, p, i, n_in, n_out, lam_um):
    """Flux-normalized complex transmission amplitude (re, im) of lens
    optical face ``i`` at normal incidence, or None for unit amplitude.

    Gated exactly like the ray model's intensity path: only elements
    with Fresnel physics (``fresnel=True`` MC / ``'weighted'`` —
    elements/lens.py::_set_coating docstring) lose power at faces; under
    the default SNELL kind both models keep unit flux.  Coated faces use
    the face's thin-film stack (utils/coatings.py::coating_amplitudes
    characteristic matrices) with the same side-dependent layer-order
    reversal as the ray model (core/static_dispatch.py::coated_rt_sp —
    arriving from the substrate the stack is traversed in reverse,
    selected by a traced n_in < n_out where like the ray path); bare
    faces reduce to the Fresnel t = 2 sqrt(n1 n2)/(n1 + n2).  The
    amplitude is FLUX-normalized (|t|^2 = T, the core/field.py
    convention), so wave-traced sensor power directly tracks the ray
    tracer's intensity * |E|^2 flux; the complex phase is the stack's
    transmission phase (zero for bare faces at normal incidence).
    """
    if not getattr(el, 'fresnel', False):
        return None
    from .coatings import coating_amplitudes
    coat_ns = getattr(el, 'coating_n', None) or {}
    cos_i = jnp.asarray(1.0)
    if i in coat_ns:
        ns = list(coat_ns[i])
        ks = el.coating_k[i]
        dsv = p['coat_d'][str(i)] if el._coat_per_face else p['coat_d']
        ds = [dsv[j] for j in range(len(ns))]
        t, _ = coating_amplitudes(ns, ds, n_in, n_out, cos_i, lam_um,
                                  pol='s', k_stack=ks)
        if len(ns) > 1:
            t_rev, _ = coating_amplitudes(
                ns[::-1], ds[::-1], n_in, n_out, cos_i, lam_um, pol='s',
                k_stack=ks[::-1] if ks is not None else None)
            lt = n_in < n_out
            t = (jnp.where(lt, t[0], t_rev[0]),
                 jnp.where(lt, t[1], t_rev[1]))
        return t
    t, _ = coating_amplitudes([], [], n_in, n_out, cos_i, lam_um, pol='s')
    return t


def _mirror_amp(el, p, n_amb, lam_um):
    """Complex reflection amplitude (re, im) of a (possibly coated) metal
    mirror at normal incidence, or None for an ideal (metal=None, R = 1)
    reflector — the same gate as the ray model's intensity path
    (elements/mirror.py: metal=None is the reference's unit Reflect).
    Dispersion follows the element's static METAL_NK knots when
    ``metal_dispersion=True``, like core/static_dispatch.py::
    mirror_reflectances_sp; |r|^2 = R and the phase-on-reflection rides
    the field (s convention — s and p coincide in magnitude at normal
    incidence)."""
    if getattr(el, '_metal', None) is None:
        return None
    from .coatings import metal_nk_at, metal_reflection_amplitudes
    if getattr(el, '_metal_nk', None) is not None:
        n_m, k_m = metal_nk_at(el._metal_nk[0], el._metal_nk[1],
                               jnp.asarray(lam_um))
    else:
        n_m, k_m = el._metal
    ns = list(getattr(el, 'coating_n', ()) or ())
    if ns:
        ds = [p['coat_d'][j] for j in range(len(ns))]
        ks = el.coating_k
    else:
        ds, ks = [], None
    return metal_reflection_amplitudes(ns, ds, n_amb, n_m, k_m,
                                       jnp.asarray(1.0), lam_um, pol='s',
                                       k_stack=ks)


def _grid(shape, dx, dtype):
    H, W = shape
    y = (jnp.arange(H, dtype=dtype) - H // 2) * dx
    x = (jnp.arange(W, dtype=dtype) - W // 2) * dx
    return x[None, :], y[:, None]


def _mul_phase(re, im, opd, wavelength):
    ph = (2.0 * jnp.pi / wavelength) * opd
    c, s = jnp.cos(ph), jnp.sin(ph)
    return re * c - im * s, re * s + im * c


def _tilt_term(p, what='element', check_rz=True):
    """Small-angle prism height of the element's tilt: the rotated
    face plane sits at z = vz - ry*x' + rx*y' (Rodrigues to first
    order), so the screen sag gains ``rx*y' - ry*x'``.

    The first-order screen is only valid for SMALL tilts — a genuinely
    rotated element (a 45-degree fold flat, say) would otherwise be
    silently wave-traced as a tiny prism, so concrete rotations beyond
    ~0.1 rad raise.  (Traced rotations cannot be checked — the caller
    under jit owns that contract.)  The axial component rz is dropped:
    exact for rotationally-symmetric faces, first-order-negligible
    otherwise.  ``check_rz=False`` exempts rz from the bound — JONES
    plates represent a z-rotation EXACTLY (it adds to the optic-axis
    angle), so only their rx/ry tilts are paraxially limited."""
    import jax
    import numpy as np

    rv = p.get('rot_vec')
    if rv is None:
        return None
    if isinstance(rv, jax.core.Tracer):
        return rv[0], rv[1]        # traced pose: caller's contract
    mags = np.abs(np.asarray(rv))
    mx = float(mags.max()) if check_rz else float(mags[:2].max())
    if mx > 0.1:
        raise NotImplementedError(
            f'wave_trace: {what} carries a {mx:.3f} rad '
            'rotation — the thin-screen model only supports small '
            '(paraxial, < ~0.1 rad) tilts as first-order prism terms; '
            'fold geometry belongs to the MIRROR unfolding or the ray '
            'tracer')
    if float(mags[0]) == 0.0 and float(mags[1]) == 0.0:
        return None
    return rv[0], rv[1]


def _extra_ff(el, p, i):
    """STATIC monomial powers + traced coefficients of face ``i``'s
    freeform/Zernike sag extension (empty for a plain asphere) — the
    same expansion the ray table rows carry (elements/lens.py::build)."""
    if isinstance(el, FreeformLens):
        key = ('xy1', 'xy2')[i]
        pw = el._ff_powers[i]
        return (pw, [p[key][m] for m in range(len(pw))]) if pw else ((), ())
    if isinstance(el, ZernikeLens):
        key = ('z1', 'z2')[i]
        zm = el._zern_maps[i]
        if not zm:
            return (), ()
        powers, M = zm
        z = p[key]
        ff = []
        # unrolled exact-f32 basis change, same as ZernikeLens.build
        for row in M:
            acc = None
            for k, w in enumerate(row):
                if w != 0.0:
                    term = w * z[k]
                    acc = term if acc is None else acc + term
            ff.append(acc if acc is not None else 0.0 * z[0])
        return powers, ff
    return (), ()


def _medium_iors(el, p, wavelength_um):
    """Per-medium indices of a lens element, with the element's
    dispersion models (Sellmeier/Cauchy, elements/lens.py::_disp_chain)
    evaluated at ``wavelength_um`` when given — the same models the ray
    table rows carry (core/static_dispatch.py::dispersive_iors)."""
    iors = el._ior_chain(p)
    if wavelength_um is None:
        return iors
    dc = el._disp_chain(p)
    if dc is None:
        return iors
    from ..constants import DispModel
    from .glass import sellmeier_index
    d2 = 0.5876 ** 2
    # keep wavelength_um symbolic: sellmeier_index takes jax scalars, so
    # the chromatic wave trace jits/differentiates in the wavelength
    l2 = wavelength_um * wavelength_um
    out = []
    for n0, (model, coeffs) in zip(iors, dc):
        if model == DispModel.SELLMEIER:
            out.append(sellmeier_index(coeffs, wavelength_um))
        elif model == DispModel.CAUCHY:
            out.append(n0 + coeffs[0] * (1.0 / l2 - 1.0 / d2))
        else:
            out.append(n0)
    return out


def _wave_trace_core(scene, params, comps, dx, wavelength, z0,
                     n_ambient, wavelength_um):
    """Shared walk behind :func:`wave_trace` (one scalar component) and
    :func:`wave_trace_vector` (the transverse (Ex, Ey) pair).  ``comps``
    is a tuple of (re, im) [H, W] float pairs; every thin screen, mask
    and angular-spectrum hop is polarization-independent and applies to
    each component alike — only JONES plates mix them.  Returns
    ``(comps, z)``."""
    comps = tuple((jnp.asarray(r), jnp.asarray(i)) for r, i in comps)
    dt = comps[0][0].dtype
    shape = comps[0][0].shape
    x, y = _grid(shape, dx, dt)
    # mirror folds are UNFOLDED onto a monotonically-increasing effective
    # axis: zeta(z) = fold_s * z + fold_o; each reflection flips fold_s
    # and re-anchors fold_o so zeta stays continuous at the mirror
    fold_s, fold_o = 1.0, 0.0
    zeta_cur = jnp.asarray(z0, dt)
    n_cur = jnp.asarray(n_ambient, dt)
    # coating/Fresnel amplitude screens evaluate in MICRONS (the
    # thin-film unit); without an explicit wavelength_um assume mm trace
    # units (the package convention — same fallback as the kinoform
    # efficiency term below)
    lam_um = (wavelength_um if wavelength_um is not None
              else wavelength * 1e3)

    def hop(comps, z_to, n):
        nonlocal zeta_cur
        zt = fold_s * z_to + fold_o
        out = tuple(angular_spectrum(r, i, dx, wavelength,
                                     zt - zeta_cur, n_medium=n)
                    for r, i in comps)
        zeta_cur = zt
        return out

    def screen(comps, opd):
        return tuple(_mul_phase(r, i, opd, wavelength) for r, i in comps)

    def scale(comps, m):
        return tuple((r * m, i * m) for r, i in comps)

    for el in scene.elements:
        p = params[el.name]
        if isinstance(el, CylSingletLens):
            # HalfCyl faces: curvature acts in Y only (q_quadric_zy),
            # rect clear aperture
            tilt = _tilt_term(p)
            te = p['trans']
            xp, yp = x - te[0], y - te[1]
            mask = ((jnp.abs(xp) <= p['half_w'])
                    & (jnp.abs(yp) <= p['half_h'])).astype(dt)
            iors = _medium_iors(el, p, wavelength_um)
            cs_zs = [(p['c1'], -p['t'] / 2.0), (p['c2'], p['t'] / 2.0)]
            # after an odd number of folds the beam traverses the lens
            # BACK to front: visit faces in traversal order and enter
            # the medium on the traversal side (screen value itself is
            # direction-independent — both the sag sign and the media
            # order flip in the unfolded frame)
            for i in (range(2) if fold_s > 0 else range(1, -1, -1)):
                c, zv = cs_zs[i]
                z_face = te[2] + zv
                comps = hop(comps, z_face, n_cur)
                n_a, n_b = ((iors[i], iors[i + 1]) if fold_s > 0
                            else (iors[i + 1], iors[i]))
                n_cur = n_b
                sag = sag_z(c, jnp.sqrt(yp * yp + 1e-24))
                sag = jnp.broadcast_to(sag, shape)
                if tilt is not None:
                    sag = sag + tilt[0] * yp - tilt[1] * xp
                opd = (iors[i] - iors[i + 1]) * sag
                comps = screen(comps, opd)
                amp = _lens_face_amp(el, p, i, n_a, n_b, lam_um)
                if amp is not None:
                    comps = _cscale(comps, amp)
                comps = scale(comps, mask)
            continue
        if isinstance(el, _SphericLens):
            tilt = _tilt_term(p)
            te = p['trans']
            xp, yp = x - te[0], y - te[1]
            r2 = xp * xp + yp * yp
            mask = (r2 <= p['radius'] ** 2).astype(dt)
            zs = el._vertex_zs(p)
            cs = [p[n] for n in el._curv_names]
            iors = _medium_iors(el, p, wavelength_um)
            is_asph = isinstance(el, AsphericLens)
            # traversal order follows the fold parity (see the cyl
            # branch comment): back-to-front after an odd fold count
            nf = len(cs)
            for i in (range(nf) if fold_s > 0 else range(nf - 1, -1, -1)):
                c, zv = cs[i], zs[i]
                z_face = te[2] + zv
                comps = hop(comps, z_face, n_cur)
                n_a, n_b = ((iors[i], iors[i + 1]) if fold_s > 0
                            else (iors[i + 1], iors[i]))
                n_cur = n_b
                if is_asph:
                    kc2 = (1.0 + p[('k1', 'k2')[i]]) * c * c
                    a = p[('a1', 'a2')[i]]
                    powers, coeffs = _extra_ff(el, p, i)
                    sag = ff_sag_grad(c, kc2, tuple(a[j] for j in range(4)),
                                      powers, coeffs, xp, yp)[0]
                else:
                    sag = sag_z(c, jnp.sqrt(r2 + 1e-24))
                if tilt is not None:
                    sag = sag + tilt[0] * yp - tilt[1] * xp
                opd = (iors[i] - iors[i + 1]) * sag
                comps = screen(comps, opd)
                amp = _lens_face_amp(el, p, i, n_a, n_b, lam_um)
                if amp is not None:
                    comps = _cscale(comps, amp)
                comps = scale(comps, mask)
            continue
        if isinstance(el, DiffractiveLens):
            # kinoform: groove pattern phi_c(r) [cycles] is wavelength-
            # independent; the m-th order's screen phase is 2 pi m phi_c
            # — its gradient reproduces doe_dir's momentum kick
            # m lam_mm grad(phi) exactly (core/physics.py::doe_dir).
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            r2 = xp * xp + yp * yp
            phi_c = jnp.zeros_like(r2)
            rp = r2
            for j in range(len(el._coeffs_init)):
                phi_c = phi_c + p['phase'][j] * rp
                rp = rp * r2
            # OPD = m * phi_c * lambda  (the 2 pi / lambda of the screen
            # multiply cancels it — the phase is achromatic in cycles)
            comps = screen(comps, el._order * phi_c * wavelength)
            if el.efficiency:
                # prefer the explicit micron value; the *1e3 fallback
                # assumes mm trace units (the package convention)
                lam_um = (wavelength_um if wavelength_um is not None
                          else wavelength * 1e3)
                eta = jnp.abs(jnp.sinc(el._lam0 / lam_um - el._order))
                comps = scale(comps, eta)
            m = (r2 <= p['radius'] ** 2).astype(dt)
            comps = scale(comps, m)
            continue
        if isinstance(el, PhaseGridPlate):
            # same corner-anchored bilinear patch as the ray model
            # (core/physics.py::phase_grid_dir lines 255-263)
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            grid = p['grid']
            Hg, Wg = grid.shape
            hx, hy = p['half_x'], p['half_y']
            u = jnp.clip((xp + hx) / (2.0 * hx) * (Wg - 1),
                         0.0, Wg - 1 - 1e-6)
            v = jnp.clip((yp + hy) / (2.0 * hy) * (Hg - 1),
                         0.0, Hg - 1 - 1e-6)
            xb = jnp.broadcast_to(u, shape)
            yb = jnp.broadcast_to(v, shape)
            iu, iv = xb.astype(jnp.int32), yb.astype(jnp.int32)
            fu, fv = xb - iu, yb - iv
            g00, g01 = grid[iv, iu], grid[iv, iu + 1]
            g10, g11 = grid[iv + 1, iu], grid[iv + 1, iu + 1]
            phi_c = ((1 - fv) * ((1 - fu) * g00 + fu * g01)
                     + fv * ((1 - fu) * g10 + fu * g11))
            comps = screen(comps, el._order * phi_c * wavelength)
            m = ((jnp.abs(xp) <= hx) & (jnp.abs(yp) <= hy)).astype(dt)
            comps = scale(comps, m)
            continue
        if isinstance(el, IdealThinLens):
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            # OPD = -r^2/(2 f) = +r^2 * P / 2  (P = -1/f)
            r2 = xp * xp + yp * yp
            comps = screen(comps, 0.5 * p['P'] * r2)
            if el.diameter != float('inf'):
                # the ray model bounds the element (SBKind.DISK) — and
                # an unbounded chirp would alias past the grid Nyquist
                m = (r2 <= (el.diameter / 2.0) ** 2).astype(dt)
                comps = scale(comps, m)
            continue
        if isinstance(el, (CircularAperture, RectangularAperture,
                           EllipticAperture)):
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            if isinstance(el, CircularAperture):
                inside = xp * xp + yp * yp <= p['radius'] ** 2
            elif isinstance(el, RectangularAperture):
                inside = ((jnp.abs(xp) <= p['half_x'])
                          & (jnp.abs(yp) <= p['half_y']))
            else:
                cr, sr = jnp.cos(p['ap_rot']), jnp.sin(p['ap_rot'])
                xr = cr * xp + sr * yp
                yr = -sr * xp + cr * yp
                inside = ((xr / p['r_major']) ** 2
                          + (yr / p['r_minor']) ** 2 <= 1.0)
            if getattr(el, 'invert', False):
                inside = ~inside
            m = inside.astype(dt)
            comps = scale(comps, m)
            continue
        if isinstance(el, (SphericalMirror, ParabolicMirror, ConicMirror)):
            # axis-aligned mirror: unfold.  A ray at radius r reflects
            # with geometric round-trip OPD = 2 n s sag(r) relative to
            # the vertex plane (s = incoming direction sign: arriving in
            # -z, a point with sag > 0 is CLOSER, so the sign flips);
            # the fold map then flips so later elements' world z keep
            # increasing along the effective axis.
            tilt = _tilt_term(p)
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            r2 = xp * xp + yp * yp
            if isinstance(el, SphericalMirror):
                sag = sag_z(p['c'], jnp.sqrt(r2 + 1e-24))
                aper2 = (p['diameter'] / 2.0) ** 2
            else:
                k = -1.0 if isinstance(el, ParabolicMirror) else p['k']
                kc2 = (1.0 + k) * p['c'] ** 2
                a = (p['a'] if isinstance(el, AsphericMirror)
                     else (0.0, 0.0, 0.0, 0.0))
                sag = ff_sag_grad(p['c'], kc2,
                                  tuple(a[j] for j in range(4)),
                                  (), (), xp, yp)[0]
                aper2 = ((p['d'] / 2.0) ** 2 if el._d_init > 0 else None)
            if tilt is not None:
                sag = sag + tilt[0] * yp - tilt[1] * xp
            comps = screen(comps, 2.0 * n_cur * fold_s * sag)
            amp = _mirror_amp(el, p, n_cur, lam_um)
            if amp is not None:
                comps = _cscale(comps, amp)
            if aper2 is not None:
                m = (r2 <= aper2).astype(dt)
                comps = scale(comps, m)
            fold_o = zeta_cur + fold_s * te[2]
            fold_s = -fold_s
            continue
        if isinstance(el, CylindricalMirror):
            # axis-aligned cylinder mirror: the unfold machinery is
            # identical to the rotationally-symmetric mirrors, the
            # screen sag just depends on y only (curves in Y, invariant
            # in X — elements/mirror.py:192, line focus at R/2 in y)
            tilt = _tilt_term(p)
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            sag = sag_z(p['c'], jnp.sqrt(yp * yp + 1e-24))
            sag = jnp.broadcast_to(sag, shape)
            if tilt is not None:
                sag = sag + tilt[0] * yp - tilt[1] * xp
            comps = screen(comps, 2.0 * n_cur * fold_s * sag)
            amp = _mirror_amp(el, p, n_cur, lam_um)
            if amp is not None:
                comps = _cscale(comps, amp)
            if el._d_init > 0:
                m = (xp * xp + yp * yp
                     <= (p['d'] / 2.0) ** 2).astype(dt)
                comps = scale(comps, m)
            fold_o = zeta_cur + fold_s * te[2]
            fold_s = -fold_s
            continue
        if isinstance(el, ManginMirror):
            # silvered-back meniscus, one unfolded pass: refract in
            # through the front face (thin screen (n_amb - n_g) sag1 —
            # direction-independent, see the lens-branch comment), hop
            # t IN GLASS to the back face, reflect there (2 n_g sag2
            # round trip; a metal/coated back sees the GLASS as its
            # ambient — elements/mirror.py:395), fold, hop back through
            # the glass and refract out through the front face again.
            # The glass path between the faces is real propagation, so
            # the classic Mangin spherical-aberration correction shows
            # up in the wave focus.  ior_glass is used as-is (the
            # element has no dispersion model).
            if fold_s < 0:
                raise NotImplementedError(
                    'wave_trace: a Mangin mirror behind an odd '
                    'mirror-fold count would be traversed back-face '
                    'first — trace rays instead')
            tilt = _tilt_term(p)
            te = p['trans']
            xp, yp = x - te[0], y - te[1]
            r2m = xp * xp + yp * yp
            n_g = p['ior_glass']
            z1, z2 = te[2] - p['t'] / 2.0, te[2] + p['t'] / 2.0
            rr = jnp.sqrt(r2m + 1e-24)
            sag1 = jnp.broadcast_to(sag_z(p['c1'], rr), shape)
            sag2 = jnp.broadcast_to(sag_z(p['c2'], rr), shape)
            if tilt is not None:
                th = tilt[0] * yp - tilt[1] * xp
                sag1, sag2 = sag1 + th, sag2 + th
            mask = (r2m <= (p['d'] / 2.0) ** 2).astype(dt)
            comps = hop(comps, z1, n_cur)
            comps = screen(comps, (n_cur - n_g) * sag1)
            comps = scale(comps, mask)
            comps = hop(comps, z2, n_g)
            comps = screen(comps, 2.0 * n_g * fold_s * sag2)
            amp = _mirror_amp(el, p, n_g, lam_um)
            if amp is not None:
                comps = _cscale(comps, amp)
            comps = scale(comps, mask)
            fold_o = zeta_cur + fold_s * z2
            fold_s = -fold_s
            comps = hop(comps, z1, n_g)
            comps = screen(comps, (n_cur - n_g) * sag1)
            comps = scale(comps, mask)
            continue
        if isinstance(el, GrinRod):
            # Split-step BPM through the rod: the beam hops in the
            # uniform n0 reference medium and picks up a midpoint index
            # screen exp(i k0 (n(x,y,z_mid) - n0) dz) per sub-step —
            # the standard symmetric split-step (O(dz^2) error/step).
            # The profile is the SAME squared-index polynomial the RK4
            # ray model integrates (core/grin.py: n^2 = c0 + c2 r^2 +
            # a4 r^4 + az z, z in [0, L] from the entry face; c0 =
            # n0^2, c2 = -n0^2 A).  Parabolic-profile anchors: the
            # centroid follows the sinusoidal ray x0 cos(sqrt(A) z)
            # (Ehrenfest) and an off-axis fundamental mode
            # w_m^2 = lam / (pi n0 sqrt(A)) is a coherent state —
            # shape-invariant while its center oscillates
            # (tests/test_beamprop.py::test_grin_coherent_state).
            # The flat faces impart no transverse screen (tangential-
            # momentum coupling is exact for a plane); the barrel mask
            # absorbs at every sub-step like the ray model's r2_max
            # kill.  Fresnel amplitudes at the rod faces are not
            # modeled (the ray model's GRIN kind has no fresnel gate
            # either — both models keep unit flux through the rod).
            tilt = _tilt_term(p, 'GrinRod')
            if fold_s < 0:
                raise NotImplementedError(
                    'wave_trace: a GRIN rod behind an odd mirror-fold '
                    'count would be traversed exit-face first, and the '
                    'rod is one-directional (backward rays are misses '
                    'in the ray model too — core/grin.py::'
                    'grin_interaction fwd mask)')
            te = p['trans']
            xp, yp = x - te[0], y - te[1]
            r2 = xp * xp + yp * yp
            r4 = r2 * r2
            mask = (r2 <= p['radius'] ** 2).astype(dt)
            c0 = p['n0'] ** 2
            c2 = -c0 * p['grin_A']
            L = p['t']
            n_bar = p['n0']
            steps = el.n_steps
            dz = L / steps
            z_in = te[2] - 0.5 * L
            comps = hop(comps, z_in, n_cur)
            if tilt is not None:
                # first-order prism screens at the flat faces: a small
                # rod tilt (rx, ry) tips both faces, so the entry gains
                # the lens-branch tilt height h = rx*y' - ry*x' weighted
                # by the index jump (n_amb - n0), the exit its negative
                # — a tilted parallel slab: zero net deviation, n-scaled
                # lateral walk-off.  The GRIN axis itself stays untipped
                # (O(tilt^2) in the profile).  Traced poses now get the
                # same screens instead of the former silent ignore
                # (round-4 advisor finding).
                tilt_h = tilt[0] * yp - tilt[1] * xp
                comps = screen(comps, (n_cur - n_bar) * tilt_h)
            comps = scale(comps, mask)
            for j in range(steps):
                z_mid = (j + 0.5) * dz
                comps = hop(comps, z_in + z_mid, n_bar)
                n2 = c0 + c2 * r2 + p['a4'] * r4 + p['az'] * z_mid
                n_loc = jnp.sqrt(jnp.maximum(n2, 1e-12))
                comps = screen(comps, (n_loc - n_bar) * dz)
                comps = scale(comps, mask)
            comps = hop(comps, z_in + L, n_bar)
            if tilt is not None:
                comps = screen(comps, (n_bar - n_cur) * tilt_h)
            comps = scale(comps, mask)
            continue
        if isinstance(el, _JonesPlate):
            # Polarizer/waveplate: J = R(th) diag(a1 e^{-i d/2},
            # a2 e^{+i d/2}) R(-th) applied pointwise to the transverse
            # (Ex, Ey) pair — the PARAXIAL limit of the ray model's
            # projected-axis Jones transport (core/field.py JONES case:
            # on-axis, the element-local x axis IS the grid x axis).
            # A z-rotation of the element rotates the optic axis
            # exactly (it adds to ``angle``); rx/ry tilts are bounded
            # by _tilt_term (a zero-sag plane has no prism screen).
            # Outside the plate radius the field is masked — the ray
            # model kills DISK misses in the sequential driver too.
            if len(comps) != 2:
                raise NotImplementedError(
                    'wave_trace: polarization elements act on the '
                    'transverse (Ex, Ey) pair — use wave_trace_vector '
                    '(the scalar wave has no polarization state; the '
                    'ray model likewise requires track_field=True for '
                    'JONES surfaces)')
            _tilt_term(p, type(el).__name__, check_rz=False)
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            xp, yp = x - te[0], y - te[1]
            theta = p['angle']
            rv = p.get('rot_vec')
            if rv is not None:
                theta = theta + rv[2]
            if fold_s < 0:
                # behind an odd mirror-fold count the ray model's
                # transverse basis e2 = d x e1 flips the angle sign for
                # backward-traveling rays (core/field.py JONES case) —
                # mirror theta so both models act on the same PHYSICAL
                # axis line (round-4 advisor finding; covered by
                # tests/test_beamprop.py fold+polarizer cross-check).
                theta = -theta
            delta = (2.0 * jnp.pi) * p['retardance']
            if getattr(el, 'chromatic', False):
                # true zero-order plate: retardance scales as lam0/lam
                lam_w = (wavelength_um if wavelength_um is not None
                         else wavelength * 1e3)
                delta = delta * el._lam0 / lam_w
                if getattr(el, 'material', None) is not None:
                    # real crystal: times dn(lam)/dn(lam0) — the same
                    # physical delta = 2 pi dn t / lam the ray model
                    # applies (core/field.py jones_bire)
                    from .birefringence import birefringence
                    delta = delta * (birefringence(el.material, lam_w)
                                     / birefringence(el.material,
                                                     el._lam0))
            ca, sa = jnp.cos(theta), jnp.sin(theta)
            ch, sh = jnp.cos(0.5 * delta), jnp.sin(0.5 * delta)
            a1, a2 = p['amp1'], p['amp2']
            (xr, xi), (yr, yi) = comps
            ar, ai = ca * xr + sa * yr, ca * xi + sa * yi
            br, bi = -sa * xr + ca * yr, -sa * xi + ca * yi
            # fast axis e^{-i delta/2}, slow axis e^{+i delta/2}
            ar, ai = a1 * (ar * ch + ai * sh), a1 * (ai * ch - ar * sh)
            br, bi = a2 * (br * ch - bi * sh), a2 * (bi * ch + br * sh)
            comps = ((ca * ar - sa * br, ca * ai - sa * bi),
                     (sa * ar + ca * br, sa * ai + ca * bi))
            m = (xp * xp + yp * yp <= p['radius'] ** 2).astype(dt)
            comps = scale(comps, m)
            continue
        if isinstance(el, SensorElement):
            te = p['trans']
            comps = hop(comps, te[2], n_cur)
            return comps, te[2]
        raise NotImplementedError(
            f'wave_trace: no thin-screen model for '
            f'{type(el).__name__} (off-axis mirrors fold the axis '
            'sideways and scatter is stochastic — neither has an '
            'axis-aligned thin screen) — trace rays instead')
    return comps, (zeta_cur - fold_o) / fold_s


def wave_trace(scene, params, re, im, dx, wavelength, z0, n_ambient=1.0,
               wavelength_um=None):
    """Propagate the scalar field ``(re, im)`` (sampled at pitch
    ``dx``, centered on the optical axis at plane ``z = z0``) through
    ``scene.elements`` in listed order.

    Supported elements: the full refractive lens family (Singlet/
    Doublet/Triplet/Aspheric/Freeform/Zernike — conic + even-asphere +
    XY-monomial/Zernike sag screens via the same static expansion the
    ray table rows carry; clear-aperture disk masks; in-glass
    propagation between faces), CylSingletLens (y-only sag, rect
    aperture), IdealThinLens (quadratic screen),
    DiffractiveLens and PhaseGridPlate (achromatic cycles profiles as
    2 pi m phi_c screens — the wave model whose stationary-phase limit
    is exactly doe_dir/phase_grid_dir's momentum kick; kinoform
    ``efficiency`` scales the amplitude by |sinc(lam0/lam - m)|),
    Circular/Rectangular/Elliptic apertures (binary masks, ``invert``
    honored), axis-aligned Spherical/Parabolic/Conic/Aspheric/
    Cylindrical mirrors (unfolded — see module docstring; METAL mirrors
    reflect with the coated stack's complex amplitude r so |E|^2 loses
    the true 1 - R and picks up the phase-on-reflection, ideal
    ``metal=None`` mirrors stay unit — the ray model's gate),
    ManginMirror (refract/in-glass hop/reflect/hop/refract in one
    unfolded pass; its silvered back sees the glass as ambient),
    GrinRod (true split-step BPM inside the rod: ``el.n_steps``
    midpoint index screens between angular-spectrum hops in the n0
    reference medium — the same squared-index polynomial the RK4 ray
    model integrates), and SensorElement (terminates the walk).
    Polarization elements need the vector entry point
    (:func:`wave_trace_vector`); anything else — off-axis mirrors,
    scatter — raises NotImplementedError.

    By default media use their design-wavelength params (``ior_glass``
    etc.) as-is; pass ``wavelength_um`` (the same micron value the ray
    model puts on ``rays.wavelength``) to evaluate each lens's
    Sellmeier/Cauchy dispersion model at that line instead —
    ``wavelength`` itself stays in trace LENGTH units and sets the
    propagation scale.

    Returns ``(re, im, z)`` — the field at the first sensor plane (or
    after the last element if the scene has no sensor) and that
    plane's z.
    """
    comps, z = _wave_trace_core(scene, params, ((re, im),), dx,
                                wavelength, z0, n_ambient, wavelength_um)
    return comps[0][0], comps[0][1], z


def wave_trace_vector(scene, params, ex, ey, dx, wavelength, z0,
                      n_ambient=1.0, wavelength_um=None):
    """Vector (polarized) wave trace: propagate the transverse pair
    ``ex = (re, im)``, ``ey = (re, im)`` through the scene.

    Everything :func:`wave_trace` supports works identically — each
    Cartesian transverse component satisfies the scalar Helmholtz
    equation, so thin screens, masks and angular-spectrum hops apply
    componentwise (utils/propagation.py::vector_angular_spectrum) —
    plus the polarization elements (LinearPolarizer, Waveplate,
    Quarter/HalfWaveplate): their Jones matrix J = R(th) diag(a1
    e^{-i d/2}, a2 e^{+i d/2}) R(-th) acts pointwise on (Ex, Ey), the
    paraxial limit of the ray model's projected-axis transport
    (core/field.py JONES case).  Malus's law, crossed-polarizer
    extinction and waveplate conversion carry over to the wave layer
    (tests/test_beamprop.py::test_vector_*), and for tight-focus
    analysis the returned pair feeds
    utils/propagation.py::longitudinal_field for Ez.

    The unfolded frame keeps WORLD transverse axes through mirror
    reflections; behind an odd fold count JONES optic-axis angles are
    mirrored (theta -> -theta) to match the ray model's d-dependent
    e2 = d x e1 basis (core/field.py).  Metal mirrors apply the same
    scalar complex r to both components (s = p in magnitude at normal
    incidence — the paraxial screen model's regime), ideal mirrors
    stay unit-amplitude, matching the scalar trace.

    Returns ``(ex, ey, z)`` with ``ex``/``ey`` the propagated (re, im)
    pairs at the first sensor plane (or after the last element).
    """
    comps, z = _wave_trace_core(scene, params,
                                (tuple(ex), tuple(ey)), dx,
                                wavelength, z0, n_ambient, wavelength_um)
    return comps[0], comps[1], z
