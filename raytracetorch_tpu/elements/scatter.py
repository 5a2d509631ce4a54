"""Scattering surface elements (stray-light Monte Carlo).

Beyond the reference — its physics functors are all specular
(reference phys/std.py) — these add the diffuse half of stray-light
analysis: baffles/housings that scatter instead of absorbing, rough
mirrors with a finite lobe, and ground-glass diffusers.  All are flat
disks driven by ``PhysKind.SCATTER`` (core/physics.py::scatter_dir):
the new direction is drawn per ray from a lobe (two in-trace uniforms),
``intensity *= albedo``.

Differentiability: the Gaussian lobes are REPARAMETERIZED samples
(dir = f(u1, u2, sigma)), so ``roughness_grad=True`` lets jax.grad
design lobe widths; the draw itself (like the Fresnel MC branch) is
non-differentiable.  ``track_field`` through a scatter surface raises
(scattering depolarizes — not modeled).
"""

from __future__ import annotations

from ..constants import PhysKind, SBKind
from ..core.table import SurfaceRec
from ..geom.surfaces import q_plane
from .base import Element, compose_world, frame_params


class _ScatterBase(Element):
    """Shared machinery: a disk-bounded plane with SCATTER physics."""

    model = None        # 'lambert' | 'gauss_r' | 'gauss_t'

    def __init__(self, radius, albedo=1.0, roughness=0.0,
                 albedo_grad=False, roughness_grad=False,
                 depolarize=False, name='scatter', **kw):
        super().__init__(name=name, **kw)
        if not 0.0 <= float(albedo) <= 1.0:
            raise ValueError(f'albedo must be in [0, 1], got {albedo}')
        if float(roughness) < 0.0:
            raise ValueError(f'roughness must be >= 0, got {roughness}')
        self._r_init = float(radius)
        self._albedo_init = float(albedo)
        self._rough_init = float(roughness)
        self._albedo_grad = bool(albedo_grad)
        self._rough_grad = bool(roughness_grad)
        # track_field compatibility: reset the E-state to a unit
        # transverse vector at each scatter (a pragmatic depolarization
        # proxy — core/field.py SCATTER case) instead of raising, so
        # polarimetric systems WITH baffles still trace end to end
        self._depol = bool(depolarize)

    @property
    def n_surfaces(self):
        return 1

    def extra_params(self):
        return {'radius': self._r_init, 'albedo': self._albedo_init,
                'roughness': self._rough_init}

    def extra_trainable(self):
        return {'radius': False, 'albedo': self._albedo_grad,
                'roughness': self._rough_grad}

    def build(self, p):
        Re, te = frame_params(p)
        q, sign = q_plane()
        Rw, tw, Rs, ts = compose_world(Re, te)
        return [SurfaceRec(q=q, n_sign=sign, Rw=Rw, tw=tw, Rs=Rs, ts=ts,
                           sb_kind=SBKind.DISK, sb=(p['radius'] ** 2,),
                           is_plane=True, ph_kind=PhysKind.SCATTER,
                           ph=(1.0, 1.0, p['albedo'], p['roughness']),
                           scatter_model=self.model,
                           scatter_depol=self._depol)]


class LambertianScatterer(_ScatterBase):
    """Matte reflecting disk: cosine-weighted hemisphere about the
    incoming-facing normal, ``intensity *= albedo`` — the ideal baffle /
    housing-wall model for stray-light Monte Carlo (``roughness`` is
    unused by the Lambertian lobe)."""

    model = 'lambert'

    def __init__(self, radius, albedo=0.5, name='lambertian', **kw):
        super().__init__(radius, albedo=albedo, name=name, **kw)


class RoughMirror(_ScatterBase):
    """Specular reflection + transverse Gaussian lobe of width
    ``roughness`` radians: a mirror with finite surface quality.
    ``roughness -> 0`` recovers the ideal mirror; ``roughness_grad=True``
    makes the lobe width designable (reparameterized sampling)."""

    model = 'gauss_r'

    def __init__(self, radius, roughness=1e-3, albedo=1.0,
                 name='rough_mirror', **kw):
        super().__init__(radius, albedo=albedo, roughness=roughness,
                         name=name, **kw)


class Diffuser(_ScatterBase):
    """Thin ground-glass diffuser: straight-through direction +
    transverse Gaussian lobe of width ``roughness`` radians (medium
    unchanged — the plate is treated as optically thin)."""

    model = 'gauss_t'

    def __init__(self, radius, roughness=0.05, albedo=1.0,
                 name='diffuser', **kw):
        super().__init__(radius, albedo=albedo, roughness=roughness,
                         name=name, **kw)
