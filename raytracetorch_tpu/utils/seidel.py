"""Third-order (Seidel) aberration analysis — differentiable.

Classic paraxial aberration theory over a centered system: trace a
marginal and a chief paraxial ray, accumulate the five monochromatic
Seidel sums (S_I spherical, S_II coma, S_III astigmatism, S_IV Petzval,
S_V distortion) plus the two first-order chromatic sums (C_I axial,
C_II lateral color), with even-asphere / conic contributions and mirror
support via the standard ``n -> -n`` reflection convention (Welford,
"Aberrations of Optical Systems", ch. 8 formulation).

The reference has no aberration theory at all — its closest machinery is
the 5x5 paraxial transfer matrices (reference ``elements/lens.py:129-147``,
``phys/std.py:35-88``), which give first-order image location only.  This
module is the natural TPU-era extension: every quantity is a jnp scalar
traced from the parameter pytree, so ``jax.grad`` flows from any Seidel
sum back to curvatures / thicknesses / indices / asphere coefficients and
the sums can be used directly as optimization targets (aberration-
balancing design, e.g. solving an asphere for S_I = 0) — see
``tests/test_seidel.py`` and ``optim/goals.py`` losses for the pattern.

Conventions
-----------
- Light starts traveling +z (pass ``axis_direction=-1`` for -z scenes;
  internally flips the axis).  Surfaces are taken in ELEMENT ORDER of the
  SequentialScene — the trace order — not sorted by z, so folded (mirror)
  systems work.
- Curvature sign follows the table encoding: sag z = (c/2) r^2 + ...,
  i.e. c > 0 means center of curvature at +z of the vertex (standard
  R > 0 for light traveling +z).
- After each mirror every subsequent index (and the implied separations,
  which come signed out of the raw z differences) flips sign.
- Angles are paraxial slopes u = dy/dz; the field is specified as a
  chief-ray slope in object space (infinite conjugates) or an object
  height (finite conjugates).

Supported elements: the spherical lens stacks (Singlet/Doublet/Triplet),
AsphericLens (conic + a4 enter the 4th-order sums; a6+ are 6th-order and
ignored), SphericalMirror and ParabolicMirror (k = -1).  Cylindrical
elements, wedges, gratings and ideal (ABCD) elements have no
rotationally-symmetric Seidel decomposition and raise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..constants import DispModel

#: default chromatic line pair (um): F (486.1 nm) and C (656.3 nm)
LINE_F = 0.48613
LINE_C = 0.65627
LINE_D = 0.5876


# ---------------------------------------------------------------------------
# Prescription extraction
# ---------------------------------------------------------------------------

class ParaxSurface(struct.PyTreeNode):
    """One rotationally-symmetric surface of the paraxial prescription.

    ``n1``/``n2`` are SIGNED indices (negative after an odd number of
    mirrors); ``dn1``/``dn2`` are the matching signed F-C index
    differences for the chromatic sums; ``eps4`` is the 4th-order
    aspheric sag departure coefficient (sag = (c/2) r^2 + (c^3/8) r^4 +
    eps4 r^4 + O(r^6) relative to the sphere of the same c is captured
    by eps4 = k c^3 / 8 + a4)."""

    z: jnp.ndarray
    c: jnp.ndarray
    n1: jnp.ndarray
    n2: jnp.ndarray
    dn1: jnp.ndarray
    dn2: jnp.ndarray
    eps4: jnp.ndarray
    label: str = struct.field(pytree_node=False, default='')


def _is_concrete(x):
    return not isinstance(x, jax.core.Tracer)


def _check_on_axis(el, p):
    """Seidel theory assumes a centered system; reject decentered/tilted
    elements when the parameters are concrete (skipped under tracing —
    the structure was already validated at first concrete call)."""
    rv, tr = p['rot_vec'], p['trans']
    if _is_concrete(rv) and _is_concrete(tr):
        import numpy as np
        if np.abs(np.asarray(rv)).max() > 1e-12 or \
                np.abs(np.asarray(tr)[:2]).max() > 1e-12:
            raise ValueError(
                f"element {el.name!r} is decentered or tilted — Seidel "
                "analysis requires a centered (rotationally symmetric) "
                "system")


def _index_at(model, coeffs, nd, lam_um):
    """Evaluate one medium's index at a wavelength (matches
    core/static_dispatch.py::dispersive_iors per-side models)."""
    if model == DispModel.SELLMEIER:
        l2 = lam_um * lam_um
        n2 = 1.0
        for i in range(3):
            n2 = n2 + coeffs[i] * l2 / (l2 - coeffs[3 + i])
        return jnp.sqrt(n2)
    if model == DispModel.CAUCHY:
        return nd + coeffs[0] * (1.0 / lam_um ** 2 - 1.0 / LINE_D ** 2)
    return nd + jnp.zeros(())


def _lens_media_dn(el, p, lines):
    """Per-medium n_F - n_C for a _SphericLens chain (zeros when the
    element is non-dispersive)."""
    iors = el._ior_chain(p)
    dc = el._disp_chain(p)
    if dc is None:
        return [jnp.zeros(()) for _ in iors]
    lo, hi = lines
    out = []
    for (model, coeffs), nd in zip(dc, iors):
        out.append(_index_at(model, coeffs, nd, lo)
                   - _index_at(model, coeffs, nd, hi))
    return out


def paraxial_prescription(scene, params, lines=(LINE_F, LINE_C),
                          axis_direction=1.0):
    """Extract the ordered list of ParaxSurfaces plus stop/image hints.

    Returns ``(surfs, stop_z, stop_radius, image_z)`` where ``stop_z`` /
    ``stop_radius`` come from the first aperture element (None if the
    scene has none) and ``image_z`` from the first sensor (None if
    absent).  Element order defines trace order (SequentialScene
    semantics, reference scene/sequential.py:12-36)."""
    from ..elements.aperture import CircularAperture, _ApertureBase
    from ..elements.lens import AsphericLens, CylSingletLens, _SphericLens
    from ..elements.mirror import (ParabolicMirror, SphericalMirror,
                                   _MirrorBase)

    sgn = float(axis_direction)
    if sgn not in (1.0, -1.0):
        raise ValueError("axis_direction must be +1 or -1")

    surfs = []
    parity = 1.0
    stop_z = stop_r = image_z = None
    for el in scene.elements:
        p = params[el.name]
        if el.is_sensor:
            if image_z is None:
                image_z = sgn * p['trans'][2]
            continue
        if isinstance(el, _ApertureBase):
            _check_on_axis(el, p)
            if stop_z is None:
                stop_z = sgn * p['trans'][2]
                stop_r = (p['radius'] if isinstance(el, CircularAperture)
                          else None)
            continue
        if isinstance(el, CylSingletLens):
            raise ValueError(
                f"element {el.name!r}: cylindrical surfaces have no "
                "rotationally-symmetric Seidel decomposition")
        if isinstance(el, _SphericLens):
            _check_on_axis(el, p)
            zs = el.optical_zs(p)
            cs = [p[n] for n in el._curv_names]
            iors = el._ior_chain(p)
            dns = _lens_media_dn(el, p, lines)
            if isinstance(el, AsphericLens):
                ks = [p['k1'], p['k2']]
                a4s = [p['a1'][0], p['a2'][0]]
            else:
                ks = [0.0] * len(cs)
                a4s = [0.0] * len(cs)
            for i, (zv, c) in enumerate(zip(zs, cs)):
                c_s = sgn * c
                surfs.append(ParaxSurface(
                    z=jnp.asarray(sgn * zv), c=jnp.asarray(c_s),
                    n1=parity * iors[i], n2=parity * iors[i + 1],
                    dn1=parity * dns[i], dn2=parity * dns[i + 1],
                    eps4=jnp.asarray(ks[i] * c_s ** 3 / 8.0 + sgn * a4s[i]),
                    label=f'{el.name}[{i}]'))
            continue
        if isinstance(el, (SphericalMirror, ParabolicMirror)):
            _check_on_axis(el, p)
            k = -1.0 if isinstance(el, ParabolicMirror) else 0.0
            amb = parity * getattr(el, '_ambient', 1.0)
            c_s = sgn * p['c']
            surfs.append(ParaxSurface(
                z=jnp.asarray(sgn * p['trans'][2]), c=jnp.asarray(c_s),
                n1=jnp.asarray(amb), n2=jnp.asarray(-amb),
                dn1=jnp.zeros(()), dn2=jnp.zeros(()),
                eps4=jnp.asarray(k * c_s ** 3 / 8.0),
                label=f'{el.name}[0]'))
            parity = -parity
            continue
        if isinstance(el, _MirrorBase):
            raise ValueError(
                f"element {el.name!r}: only rotationally-symmetric mirrors "
                "(SphericalMirror, ParabolicMirror) support Seidel analysis")
        raise ValueError(
            f"element {el.name!r} ({type(el).__name__}) has no Seidel "
            "decomposition (supported: spherical lens stacks, aspheres, "
            "spherical/parabolic mirrors, apertures, sensors)")
    if not surfs:
        raise ValueError("scene has no refracting or reflecting surfaces")
    return surfs, stop_z, stop_r, image_z


# ---------------------------------------------------------------------------
# Paraxial ray trace
# ---------------------------------------------------------------------------

def paraxial_ray(surfs, y0, u0):
    """Trace one paraxial ray; (y0, u0) are height/slope AT the first
    surface's vertex plane (object-space side).

    Returns per-surface lists (y, u_in, u_out, A) plus the image-space
    slope — the refraction invariant A = n i = n (u + y c) and the
    transfer y' = y + t u with t the raw vertex separation (signed z
    differences handle folded paths under the n -> -n convention)."""
    y, u = jnp.asarray(y0, jnp.result_type(float)), \
        jnp.asarray(u0, jnp.result_type(float))
    ys, u_ins, u_outs, As = [], [], [], []
    for j, s in enumerate(surfs):
        if j > 0:
            y = y + (s.z - surfs[j - 1].z) * u
        A = s.n1 * (u + y * s.c)
        u_ins.append(u)
        u = A / s.n2 - y * s.c
        ys.append(y)
        u_outs.append(u)
        As.append(A)
    return ys, u_ins, u_outs, As


def _y_at(surfs, ys, u_outs, u0, z, seg):
    """Height of a traced ray at plane z lying in gap ``seg`` (0 = object
    space before the first surface, j = after surface j-1)."""
    if seg == 0:
        return ys[0] + (z - surfs[0].z) * u0
    return ys[seg - 1] + (z - surfs[seg - 1].z) * u_outs[seg - 1]


def _resolve_stop(surfs, ap_stop_z, stop_z, stop_after):
    """Shared stop resolution (seidel / field_scan / first_order):
    returns ``(stop_z, seg)`` from an explicit plane, an element name, the
    scene's aperture element, or the first vertex — in that priority."""
    if stop_z is None and stop_after is not None:
        cands = [s.z for s in surfs
                 if s.label.rsplit('[', 1)[0] == stop_after]
        if not cands:
            raise KeyError(f"no optical element named {stop_after!r}")
        return cands[-1], _stop_segment(surfs, None, stop_after)
    if stop_z is None:
        stop_z = ap_stop_z if ap_stop_z is not None else surfs[0].z
    return stop_z, _stop_segment(surfs, stop_z, stop_after)


def _stop_segment(surfs, stop_z, stop_after_label):
    """Which inter-surface gap holds the stop.  With ``stop_after_label``
    (an element name) the gap is structural; otherwise locate by z
    (requires concrete z's and an unfolded path)."""
    if stop_after_label is not None:
        seg = 0
        for j, s in enumerate(surfs):
            if s.label.rsplit('[', 1)[0] == stop_after_label:
                seg = j + 1
        return seg
    import numpy as np
    zs = np.asarray([float(s.z) for s in surfs])
    if not np.all(np.diff(zs) > 0):
        raise ValueError(
            "folded system: pass stop_after=<element name> to locate the "
            "stop structurally instead of by z")
    return int(np.searchsorted(zs, float(stop_z)))


# ---------------------------------------------------------------------------
# Seidel sums
# ---------------------------------------------------------------------------

class SeidelReport(struct.PyTreeNode):
    """Per-surface Seidel contributions [K] and their totals (scalars).

    All leaves are jnp arrays — the report is a pytree, so
    ``jax.grad(lambda p: seidel(scene, p, ...).S_I)`` works.  Transverse-
    aberration conversions divide by (2 n' u'): ``n_img`` / ``u_img`` are
    the image-space marginal index and slope, ``H`` the Lagrange
    invariant, ``z_image`` the paraxial image plane used."""

    s1: jnp.ndarray
    s2: jnp.ndarray
    s3: jnp.ndarray
    s4: jnp.ndarray
    s5: jnp.ndarray
    c1: jnp.ndarray
    c2: jnp.ndarray
    y: jnp.ndarray
    ybar: jnp.ndarray
    A: jnp.ndarray
    Abar: jnp.ndarray
    H: jnp.ndarray
    n_img: jnp.ndarray
    u_img: jnp.ndarray
    ubar_img: jnp.ndarray
    z_image: jnp.ndarray
    labels: tuple = struct.field(pytree_node=False, default=())

    @property
    def S_I(self):
        return jnp.sum(self.s1)

    @property
    def S_II(self):
        return jnp.sum(self.s2)

    @property
    def S_III(self):
        return jnp.sum(self.s3)

    @property
    def S_IV(self):
        return jnp.sum(self.s4)

    @property
    def S_V(self):
        return jnp.sum(self.s5)

    @property
    def C_I(self):
        return jnp.sum(self.c1)

    @property
    def C_II(self):
        return jnp.sum(self.c2)

    # -- conversions (Welford 8.29/9.x; signs validated by real-ray
    #    regressions in tests/test_seidel.py) --------------------------------

    @property
    def _conv(self):
        return 2.0 * self.n_img * self.u_img

    @property
    def transverse_spherical(self):
        """Marginal-ray transverse aberration at the paraxial image
        (real upper marginal ray lands at +TSA for S_I > 0 with the
        converging u' < 0 of a positive system)."""
        return self.S_I / self._conv

    @property
    def coma_tangential(self):
        """Tangential coma: mean height of the upper+lower full-aperture
        meridional rays minus the chief ray, at the paraxial image."""
        return 3.0 * self.S_II / self._conv

    @property
    def astigmatism_ts(self):
        """Longitudinal tangential-minus-sagittal focus split z_T - z_S
        at full field (real-ray calibrated, tests/test_seidel.py)."""
        return -self.S_III / (self.n_img * self.u_img ** 2)

    @property
    def field_curvature_sagittal(self):
        """Longitudinal sagittal focus shift z_S - z_image at full
        field."""
        return -(self.S_III + self.S_IV) / self._conv / self.u_img

    @property
    def field_curvature_tangential(self):
        """Longitudinal tangential focus shift z_T - z_image at full
        field."""
        return -(3.0 * self.S_III + self.S_IV) / self._conv / self.u_img

    @property
    def petzval_curvature(self):
        """Curvature 1/R of the Petzval surface (in image-space index
        units): S_IV = -H^2 * (petzval sum)."""
        return -self.n_img * self.S_IV / (self.H ** 2)

    @property
    def distortion_transverse(self):
        """Chief-ray transverse displacement at the paraxial image
        (positive = pincushion for a positive system)."""
        return self.S_V / self._conv

    @property
    def axial_color_longitudinal(self):
        """Paraxial focus shift z_short - z_long (longitudinal axial
        color; negative for a simple positive crown singlet: blue
        focuses closer)."""
        return -self.C_I / (self.n_img * self.u_img ** 2)

    @property
    def lateral_color_transverse(self):
        """Chief-ray height difference (y_short - y_long) at the image."""
        return self.C_II / (self.n_img * self.u_img)

    @property
    def wavefront_coeffs(self):
        """Wavefront expansion coefficients (length units): W040, W131,
        W222, W220 (Petzval-flattened field curvature), W311."""
        return dict(W040=self.S_I / 8.0, W131=self.S_II / 2.0,
                    W222=self.S_III / 2.0,
                    W220=(self.S_III + self.S_IV) / 4.0,
                    W311=self.S_V / 2.0)


def seidel(scene, params, aperture, field, object_z=None, stop_z=None,
           stop_after=None, lines=(LINE_F, LINE_C), axis_direction=1.0):
    """Seidel sums of a centered SequentialScene.

    Parameters
    ----------
    aperture : marginal-ray height at the STOP (stop semi-aperture).
    field : chief-ray slope in object space (infinite conjugates) or
        object height (finite ``object_z``).
    object_z : axial object position; None = object at infinity.
    stop_z : stop plane; defaults to the scene's first aperture element,
        else the first surface vertex.
    stop_after : element NAME the stop follows (locates the stop's gap
        structurally — required for folded/mirror systems whose z's are
        not monotone).
    lines : (short, long) wavelengths in um for C_I / C_II.

    Returns a :class:`SeidelReport`.  Differentiable w.r.t. ``params``
    (and ``aperture`` / ``field`` / ``object_z``).
    """
    surfs, ap_stop_z, _, _ = paraxial_prescription(
        scene, params, lines=lines, axis_direction=axis_direction)
    stop_z, seg = _resolve_stop(surfs, ap_stop_z, stop_z, stop_after)

    # Two basis rays from the first-surface plane span all paraxial rays.
    yP, uP_in, uP_out, _ = paraxial_ray(surfs, 1.0, 0.0)
    yQ, uQ_in, uQ_out, _ = paraxial_ray(surfs, 0.0, 1.0)
    YsP = _y_at(surfs, yP, uP_out, 0.0, stop_z, seg)
    YsQ = _y_at(surfs, yQ, uQ_out, 1.0, stop_z, seg)

    z1 = surfs[0].z
    if object_z is None:
        # marginal: u0 = 0, y0 scaled to `aperture` at the stop
        my0, mu0 = aperture / YsP, jnp.zeros(())
        # chief: u0 = field, y at stop = 0
        cu0 = jnp.asarray(field, jnp.result_type(float))
        cy0 = -cu0 * YsQ / YsP
    else:
        dz = z1 - object_z
        t = aperture / (dz * YsP + YsQ)
        my0, mu0 = t * dz, t
        # chief: y_obj = y0 - dz*u0 = field ; y0*YsP + u0*YsQ = 0
        det = -YsQ - dz * YsP
        cy0 = -field * YsQ / det
        cu0 = field * YsP / det

    ym, um_in, um_out, Am = paraxial_ray(surfs, my0, mu0)
    yc, uc_in, uc_out, Ac = paraxial_ray(surfs, cy0, cu0)

    n1 = jnp.stack([s.n1 for s in surfs])
    n2 = jnp.stack([s.n2 for s in surfs])
    dn1 = jnp.stack([s.dn1 for s in surfs])
    dn2 = jnp.stack([s.dn2 for s in surfs])
    c = jnp.stack([s.c for s in surfs])
    eps4 = jnp.stack([s.eps4 for s in surfs])
    y = jnp.stack(ym)
    ybar = jnp.stack(yc)
    A = jnp.stack(Am)
    Abar = jnp.stack(Ac)
    u_in, u_out = jnp.stack(um_in), jnp.stack(um_out)

    H = n1[0] * (uc_in[0] * ym[0] - um_in[0] * yc[0])
    duon = u_out / n2 - u_in / n1
    d1on = 1.0 / n2 - 1.0 / n1

    s1 = -A * A * y * duon
    s2 = -A * Abar * y * duon
    s3 = -Abar * Abar * y * duon
    s4 = -H * H * c * d1on
    # per-surface S_V = (Abar/A)(s3 + s4); at A == 0 the numerator
    # vanishes identically (H = y*Abar there) — guard the division.
    A_safe = jnp.where(jnp.abs(A) < 1e-30, 1e-30, A)
    s5 = jnp.where(jnp.abs(A) < 1e-30, 0.0, (Abar / A_safe) * (s3 + s4))

    # even-asphere / conic 4th-order departure (sag + eps4 r^4):
    # W_extra = eps4 * (n2 - n1) * r^4 evaluated on (y + ybar) -> the
    # standard per-order split (Welford 8.3.4)
    G = 8.0 * eps4 * (n2 - n1)
    s1 = s1 + G * y ** 4
    s2 = s2 + G * y ** 3 * ybar
    s3 = s3 + G * y ** 2 * ybar ** 2
    s4 = s4
    s5 = s5 + G * y * ybar ** 3

    dduon = dn2 / n2 - dn1 / n1
    ch1 = A * y * dduon
    ch2 = Abar * y * dduon

    n_img, u_img = n2[-1], u_out[-1]
    z_image = surfs[-1].z - ym[-1] / jnp.where(
        jnp.abs(u_img) < 1e-30, 1e-30, u_img)

    return SeidelReport(
        s1=s1, s2=s2, s3=s3, s4=s4, s5=s5, c1=ch1, c2=ch2,
        y=y, ybar=ybar, A=A, Abar=Abar, H=H,
        n_img=n_img, u_img=u_img, ubar_img=uc_out[-1], z_image=z_image,
        labels=tuple(s.label for s in surfs))


def seidel_table(report):
    """Human-readable per-surface Seidel breakdown (host-side)."""
    import numpy as np
    rows = []
    head = (f"{'surface':<16}{'S_I':>12}{'S_II':>12}{'S_III':>12}"
            f"{'S_IV':>12}{'S_V':>12}{'C_I':>12}{'C_II':>12}")
    rows.append(head)
    rows.append('-' * len(head))
    arr = [np.asarray(getattr(report, k))
           for k in ('s1', 's2', 's3', 's4', 's5', 'c1', 'c2')]
    for i, lab in enumerate(report.labels):
        rows.append(f"{lab:<16}" + ''.join(f"{a[i]:>12.3e}" for a in arr))
    rows.append('-' * len(head))
    rows.append(f"{'TOTAL':<16}" + ''.join(f"{a.sum():>12.3e}" for a in arr))
    rows.append(
        f"image z = {float(report.z_image):.6g}   "
        f"H = {float(report.H):.6g}   n'u' = "
        f"{float(report.n_img * report.u_img):.6g}")
    return '\n'.join(rows)
