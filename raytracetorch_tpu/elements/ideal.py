"""5x5 paraxial transfer matrices and ideal (ABCD) elements.

The paraxial state vector is [x, theta_x, y, theta_y, 1]; the affine row
enables element decentering via Frame.paraxial() shifts (reference
``elements/ideal.py:9-45``, ``geom/transform.py:121-139``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import PhysKind, SBKind
from ..geom.surfaces import q_plane
from ..geom.transform import mm
from .base import Element, compose_world, frame_params


def paraxial_lens_mat(power_x, power_y):
    """Thin-lens matrix (reference elements/ideal.py:9-15)."""
    m = jnp.eye(5, dtype=jnp.result_type(power_x, 1.0))
    m = m.at[1, 0].set(-power_x)
    m = m.at[3, 2].set(-power_y)
    return m


def paraxial_dist_mat(dist):
    """Free-space propagation matrix (reference elements/ideal.py:17-23)."""
    m = jnp.eye(5, dtype=jnp.result_type(dist, 1.0))
    m = m.at[0, 1].set(dist)
    m = m.at[2, 3].set(dist)
    return m


def paraxial_refract_mat(cx, cy, ior_1, ior_2):
    """Single refracting surface matrix (reference elements/ideal.py:25-37)."""
    r = ior_1 / ior_2
    m = jnp.eye(5, dtype=jnp.result_type(cx, 1.0))
    m = m.at[1, 0].set(cx * (ior_1 - ior_2) / ior_2)
    m = m.at[3, 2].set(cy * (ior_1 - ior_2) / ior_2)
    m = m.at[1, 1].set(r)
    m = m.at[3, 3].set(r)
    return m


def paraxial_mirror_mat(cx, cy):
    """Mirror matrix (reference elements/ideal.py:39-45)."""
    m = jnp.eye(5, dtype=jnp.result_type(cx, 1.0))
    m = m.at[1, 0].set(-2.0 * cx)
    m = m.at[3, 2].set(-2.0 * cy)
    return m


class LinearElement(Element):
    """A planar surface with ideal ABCD 'Linear' physics — base for thin
    lenses and ideal mirrors (reference elements/ideal.py:47-62).  The
    functor's frame is tied to the shape frame by construction (the table's
    composed Rw), matching elements/ideal.py:54."""

    def __init__(self, name='linear', diameter=float('inf'), rotation=None,
                 translation=None, rot_grad=False, trans_grad=False):
        super().__init__(name=name, rotation=rotation, translation=translation,
                         rot_grad=rot_grad, trans_grad=trans_grad)
        self.diameter = float(diameter)

    @property
    def n_surfaces(self):
        return 1

    def extra_params(self):
        return {'Cx': 0.0, 'Cy': 0.0, 'Dx': 1.0, 'Dy': 1.0}

    def extra_trainable(self):
        return {'Cx': False, 'Cy': False, 'Dx': False, 'Dy': False}

    def _abcd(self, p):
        return p['Cx'], p['Cy'], p['Dx'], p['Dy']

    def build(self, p):
        from ..core.table import SurfaceRec
        Re, te = frame_params(p)
        q, sign = q_plane()
        Rw, tw, Rs, ts = compose_world(Re, te)
        cx, cy, dx, dy = self._abcd(p)
        if self.diameter == float('inf'):
            sb_kind, sb = SBKind.NONE, ()
        else:
            sb_kind, sb = SBKind.DISK, ((self.diameter / 2.0) ** 2,)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb, is_plane=True,
                           ph_kind=PhysKind.LINEAR,
                           ph=(0.0, 0.0, cx, cy, dx, dy))]

    def _paraxial_mat(self, p):
        # reference LinearElement._paraxial = ParaxialLensMat(-Cx, -Cy)
        # (ideal.py:58-62), i.e. M[1,0] = +Cx = -P_sys — same sign
        # convention as the refraction-matrix chain
        cx, cy, _, _ = self._abcd(p)
        return paraxial_lens_mat(-cx, -cy)

    def paraxial(self, p):
        f = self.frame(p)
        t, t_inv = f.paraxial(), f.paraxial_inv()
        return [p['trans'][2]], [mm(t_inv, mm(self._paraxial_mat(p), t))]


class IdealThinLens(LinearElement):
    """Ideal thin lens of focal length f: P = -1/f wired into Cx = Cy
    (reference elements/ideal.py:65-87)."""

    def __init__(self, focal, focal_grad=False, name='ideal_lens', **kw):
        super().__init__(name=name, **kw)
        self.focal_init = float(focal)
        self.focal_grad = focal_grad

    def extra_params(self):
        return {'P': -1.0 / self.focal_init}

    def extra_trainable(self):
        return {'P': self.focal_grad}

    def _abcd(self, p):
        return p['P'], p['P'], 1.0, 1.0

    def f(self, p):
        return -1.0 / p['P']


class IdealCylThinLens(LinearElement):
    """Ideal cylindrical thin lens with independent x/y powers (reference
    elements/ideal.py:90-118; the reference wiring bug that indexes a second,
    nonexistent functor at :110 is fixed here — both powers act on the single
    surface)."""

    def __init__(self, focal_x, focal_y, focal_x_grad=False,
                 focal_y_grad=False, name='ideal_cyl_lens', **kw):
        super().__init__(name=name, **kw)
        self.fx_init, self.fy_init = float(focal_x), float(focal_y)
        self.fx_grad, self.fy_grad = focal_x_grad, focal_y_grad

    def extra_params(self):
        return {'Px': -1.0 / self.fx_init, 'Py': -1.0 / self.fy_init}

    def extra_trainable(self):
        return {'Px': self.fx_grad, 'Py': self.fy_grad}

    def _abcd(self, p):
        return p['Px'], p['Py'], 1.0, 1.0


class IdealMirror(LinearElement):
    """Ideal mirror with per-axis radii; Px = -2/Rx (reference
    elements/ideal.py:121-162)."""

    def __init__(self, radius_x, radius_y, radius_x_grad=False,
                 radius_y_grad=False, name='ideal_mirror', **kw):
        super().__init__(name=name, **kw)
        self.rx_init, self.ry_init = float(radius_x), float(radius_y)
        self.rx_grad, self.ry_grad = radius_x_grad, radius_y_grad

    def extra_params(self):
        return {'Px': -2.0 / self.rx_init, 'Py': -2.0 / self.ry_init}

    def extra_trainable(self):
        return {'Px': self.rx_grad, 'Py': self.ry_grad}

    def _abcd(self, p):
        return p['Px'], p['Py'], 1.0, 1.0

    def _paraxial_mat(self, p):
        return paraxial_mirror_mat(-p['Px'] / 2.0, -p['Py'] / 2.0)


class DiffractionGrating(Element):
    """Planar linear diffraction grating (beyond the reference): grooves
    along local y, grating vector along local x, diffracting the configured
    order with ideal efficiency.  Transmissive by default; ``reflective=True``
    folds the beam.  ``period_um`` is the groove period in the same units as
    ray wavelengths (um), so different wavelengths disperse per
    sin(theta_out) = sin(theta_in) + m * lambda / period."""

    def __init__(self, period_um, order=1, reflective=False,
                 diameter=float('inf'), period_grad=False,
                 name='grating', **kw):
        super().__init__(name=name, **kw)
        self._period_init = float(period_um)
        self._period_grad = period_grad
        self.order = int(order)
        self.reflective = bool(reflective)
        self.diameter = float(diameter)

    @property
    def n_surfaces(self):
        return 1

    @property
    def is_aperture(self):
        return False

    def extra_params(self):
        return {'period_um': self._period_init}

    def extra_trainable(self):
        return {'period_um': self._period_grad}

    def build(self, p):
        from ..constants import PhysKind, SBKind
        from ..core.table import SurfaceRec
        Re, te = frame_params(p)
        q, sign = q_plane()
        Rw, tw, Rs, ts = compose_world(Re, te)
        if self.diameter == float('inf'):
            sb_kind, sb = SBKind.NONE, ()
        else:
            sb_kind, sb = SBKind.DISK, ((self.diameter / 2.0) ** 2,)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=sb_kind, sb=sb, is_plane=True,
                           ph_kind=PhysKind.GRATING,
                           ph=(0.0, 0.0, p['period_um'],
                               float(self.order),
                               1.0 if self.reflective else 0.0))]
