"""Aperture elements (reference ``elements/aperture.py``).

Semantics replicated exactly: the aperture's bounded plane only *exists*
where its bound (possibly inverted) holds — rays that miss fly by unchanged —
and rays that do hit are re-checked against the RAW (non-inverted) bound by
the filter physics (reference phys/filter.py:24-33).  So ``invert=False``
transmits in-bounds hits; ``invert=True`` makes a blocking iris: rays hitting
the plate outside the opening are absorbed.
"""

from __future__ import annotations

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


class FuzzyAperture(Element):
    """Arbitrary-apodization plane: transmits with a user-supplied intensity
    modulation ``intensity_fn(hit_local [N,3]) -> [N]`` (reference ``Fuzzy``,
    phys/filter.py:36-50).  The callable is static scene structure (it is
    traced into the jitted program), so it is not serializable to project
    files."""

    def __init__(self, intensity_fn, name='fuzzy', **kw):
        super().__init__(name=name, **kw)
        self.intensity_fn = intensity_fn

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
    elements/aperture.py:8-21)."""

    sb_kind = SBKind.DISK

    def __init__(self, radius, invert=False, name='circ_aperture', **kw):
        super().__init__(name=name, **kw)
        self._r_init = float(radius)
        self.invert = invert

    def extra_params(self):
        return {'radius': self._r_init}

    def extra_trainable(self):
        return {'radius': False}

    def _sb_params(self, p):
        return (p['radius'] ** 2,)


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
