"""Aperture elements (reference ``elements/aperture.py``).

Semantics replicated exactly: the aperture's bounded plane only *exists*
where its bound (possibly inverted) holds — rays that miss fly by unchanged —
and rays that do hit are re-checked against the RAW (non-inverted) bound by
the filter physics (reference phys/filter.py:24-33).  So ``invert=False``
transmits in-bounds hits; ``invert=True`` makes a blocking iris: rays hitting
the plate outside the opening are absorbed.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PhysKind, SBKind
from ..core.table import SurfaceRec
from ..geom.surfaces import q_plane
from .base import Element, compose_world, frame_params


class _ApertureBase(Element):
    sb_kind = SBKind.NONE

    @property
    def n_surfaces(self):
        return 1

    @property
    def is_aperture(self):
        return True

    def _sb_params(self, p):
        return ()

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_plane()
        Rw, tw, Rs, ts = compose_world(Re, te)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=self.sb_kind, sb=self._sb_params(p),
                           sb_invert=self.invert, is_plane=True,
                           ph_kind=PhysKind.APERTURE)]


class ComponentFuzzy:
    """Marks an apodization callable as *component-style*: it is called as
    ``fn(x, y, z)`` with three planar [N] (or tile-shaped) arrays instead
    of one stacked ``[N, 3]`` array.  Component-style callables work in the
    fused Pallas kernels too, where ray state lives as planar component
    tiles and an ``[..., 3]`` minor dim would waste 125/128 vector lanes
    (see geom/vec3.py).  Restriction: the body must be elementwise jnp math
    (no gathers/scatters/complex) so Mosaic can lower it."""

    components = True

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x, y, z):
        return self.fn(x, y, z)


def call_fuzzy(fn, hit_c):
    """Dispatch a fuzzy apodization callable on a component-tuple hit:
    component-style fns (``fn.components``) get the planar components,
    legacy fns get the stacked [N, 3] array (reference phys/filter.py:44
    passes the hit tensor)."""
    if getattr(fn, 'components', False):
        return fn(*hit_c)
    from ..geom import vec3 as v3
    return fn(v3.to_array(hit_c))


class FuzzyAperture(Element):
    """Arbitrary-apodization plane: transmits with a user-supplied intensity
    modulation (reference ``Fuzzy``, phys/filter.py:36-50).  Two calling
    conventions:

    - ``intensity_fn(hit_local [N,3]) -> [N]`` (default, matches the
      reference) — supported by the XLA drivers only;
    - ``components=True``: ``intensity_fn(x, y, z) -> w`` on planar
      component arrays — also supported by the fused Pallas kernels
      (``simulate_fused``), where stacked [N, 3] intermediates would
      destroy the lane layout.

    The callable is static scene structure (it is traced into the jitted
    program), so it is not serializable to project files."""

    def __init__(self, intensity_fn, components=False, name='fuzzy', **kw):
        super().__init__(name=name, **kw)
        self.intensity_fn = (ComponentFuzzy(intensity_fn) if components
                             else intensity_fn)

    @property
    def n_surfaces(self):
        return 1

    @property
    def is_aperture(self):
        return True

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_plane()
        Rw, tw, Rs, ts = compose_world(Re, te)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           is_plane=True, ph_kind=PhysKind.TRANSMIT)]


class CircularAperture(_ApertureBase):
    """Disk-bounded plane + aperture filter (reference
    elements/aperture.py:8-21).

    ``curvature`` (beyond the reference) puts the opening on a spherical
    cap instead of a plane — the 'curved stop' of real prescriptions
    (a stop tooled onto a lens face): the disk bound applies in the
    surface-local (x, y) and the filter physics is unchanged (direction
    passes through; out-of-bounds rays are absorbed under ``invert``).
    Zemax files with a curved STOP surface import onto this
    (utils/zemax.py)."""

    sb_kind = SBKind.DISK

    def __init__(self, radius, invert=False, curvature=0.0,
                 name='circ_aperture', **kw):
        super().__init__(name=name, **kw)
        self._r_init = float(radius)
        self._c_init = float(curvature)
        if self._c_init and abs(1.0 / self._c_init) < self._r_init:
            raise ValueError('|1/curvature| must exceed the radius')
        self.invert = invert

    def extra_params(self):
        p = {'radius': self._r_init}
        if self._c_init:
            p['c'] = self._c_init
        return p

    def extra_trainable(self):
        t = {'radius': False}
        if self._c_init:
            t['c'] = False
        return t

    def _sb_params(self, p):
        return (p['radius'] ** 2,)

    def build(self, p):
        if not self._c_init:
            return super().build(p)
        from ..constants import VBKind
        from ..geom.surfaces import q_quadric
        Re, te = frame_params(p)
        q, sign = q_quadric(p['c'], 0.0)
        Rw, tw, Rs, ts = compose_world(Re, te)
        # The invertible opening test is the DISK alone; the far side of
        # the full sphere is clipped by a separate VOLUME bound (never
        # inverted — under invert=True an sb-level hemisphere clip would
        # resurrect the far cap and absorb in-bounds rays there)
        r_cap = 1.0 / jnp.abs(p['c'])
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=SBKind.DISK, sb=(p['radius'] ** 2,),
                           sb_invert=self.invert,
                           vb_kind=VBKind.Z_BETWEEN, vb=(-r_cap, r_cap),
                           ph_kind=PhysKind.APERTURE)]


class RectangularAperture(_ApertureBase):
    """Rectangle-bounded plane (reference elements/aperture.py:24-41)."""

    sb_kind = SBKind.RECT

    def __init__(self, half_x, half_y, invert=False, name='rect_aperture',
                 **kw):
        super().__init__(name=name, **kw)
        self._hx, self._hy = float(half_x), float(half_y)
        self.invert = invert

    def extra_params(self):
        return {'half_x': self._hx, 'half_y': self._hy}

    def extra_trainable(self):
        return {'half_x': False, 'half_y': False}

    def _sb_params(self, p):
        return (p['half_x'], p['half_y'])


class EllipticAperture(_ApertureBase):
    """Rotated-ellipse-bounded plane (reference elements/aperture.py:44-62)."""

    sb_kind = SBKind.ELLIPSE

    def __init__(self, r_major, r_minor, rot=0.0, invert=False,
                 r_major_grad=False, r_minor_grad=False, rot_grad=False,
                 name='ellipse_aperture', **kw):
        super().__init__(name=name, **kw)
        self._init = dict(r_major=float(r_major), r_minor=float(r_minor),
                          ap_rot=float(rot))
        self._grads = dict(r_major=r_major_grad, r_minor=r_minor_grad,
                           ap_rot=rot_grad)
        self.invert = invert

    def extra_params(self):
        return dict(self._init)

    def extra_trainable(self):
        return dict(self._grads)

    def _sb_params(self, p):
        return (p['r_major'], p['r_minor'], p['ap_rot'])


class ObscuredAperture(FuzzyAperture):
    """Telescope pupil mask: outer disk minus a central obscuration and
    ``n_vanes`` radial spider vanes (beyond the reference — its aperture
    zoo is disk/rect/ellipse, elements/aperture.py:8-58).

    ``obscuration`` is the LINEAR fraction (0.3 = 30% of the diameter);
    ``vane_width`` is the full vane width in lens units, the first vane
    points along +x rotated by ``vane_angle``.  The mask is built as a
    component-style fuzzy callable from these ctor scalars, so it runs
    in the fused Pallas kernels AND serializes through project files
    (the ctor args are captured; the generic FuzzyAperture caveat about
    arbitrary callables does not apply).

    The classic use is the diffraction PSF: an amp mask with four vanes
    puts the four-spike star on ``diffraction_psf``'s output
    (tests/test_obscuration.py).
    """

    def __init__(self, radius, obscuration=0.3, n_vanes=4,
                 vane_width=0.0, vane_angle=0.0, name='obscured', **kw):
        import math as _math

        if not 0.0 <= float(obscuration) < 1.0:
            raise ValueError(
                f'obscuration is a linear fraction in [0, 1), got '
                f'{obscuration}')
        if float(vane_width) < 0 or int(n_vanes) < 0:
            raise ValueError('vane_width and n_vanes must be >= 0')
        r_out = float(radius)
        r_in = float(obscuration) * r_out
        nv, w2 = int(n_vanes), 0.5 * float(vane_width)
        a0 = float(vane_angle)
        angles = [(_math.cos(a0 + 2 * _math.pi * k / nv),
                   _math.sin(a0 + 2 * _math.pi * k / nv))
                  for k in range(nv)] if nv and w2 > 0 else []

        def mask(x, y, z):
            import jax.numpy as jnp
            r2 = x * x + y * y
            ok = (r2 <= r_out * r_out) & (r2 >= r_in * r_in)
            for c, s in angles:
                along = x * c + y * s
                across = -x * s + y * c
                ok = ok & ~((along > 0.0) & (jnp.abs(across) <= w2))
            return ok.astype(x.dtype)

        super().__init__(mask, components=True, name=name, **kw)
        self.radius = r_out
        self.obscuration = float(obscuration)
