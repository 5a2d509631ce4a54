"""Ray batch state as an immutable structure-of-arrays pytree.

TPU-native equivalent of the reference's ``Rays`` tensorclass
(``rays/ray.py:7``), stored **component-planar**: seven scalar ``[N]``
arrays (px, py, pz, dx, dy, dz, intensity, ...) rather than ``[N, 3]``
blocks — an ``[N, 3]`` layout wastes 125/128 TPU vector lanes on the minor
dim, measured ~20x slower through the trace (see geom/vec3.py).  The
``pos`` / ``dir`` properties materialize ``[N, 3]`` views for user code;
the compute core consumes the component tuples ``pos_c`` / ``dir_c``
directly.

Semantics vs the reference: normalized dirs on construction, functional
``masked_update`` instead of in-place ``scatter_update`` (rays/ray.py:29),
int32 ids (PARITY.md §9), aliveness = ``intensity > 0`` masking — no
dynamic-shape boolean subsetting.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..geom import vec3 as v3


class Rays(struct.PyTreeNode):
    px: jnp.ndarray           # [N]
    py: jnp.ndarray
    pz: jnp.ndarray
    dx: jnp.ndarray           # [N] unit direction components
    dy: jnp.ndarray
    dz: jnp.ndarray
    intensity: jnp.ndarray    # [N]
    ray_id: jnp.ndarray       # [N] int32 bundle tag
    wavelength: jnp.ndarray   # [N]

    # -- construction ------------------------------------------------------

    @classmethod
    def create(cls, pos, direction, intensity=None, ray_id=0, wavelength=None,
               dtype=jnp.float32):
        """Factory with broadcasting + defaults (reference ``Rays.initialize``,
        rays/ray.py:42-82); directions are normalized on construction
        (rays/ray.py:22-25).  Accepts [N, 3] arrays (converted once here —
        outside the hot loop)."""
        pos = jnp.atleast_2d(jnp.asarray(pos, dtype))
        direction = jnp.atleast_2d(jnp.asarray(direction, dtype))
        n = pos.shape[0]
        if intensity is None:
            intensity = jnp.ones((n,), dtype)
        else:
            intensity = jnp.asarray(intensity, dtype)
        if wavelength is None:
            wavelength = jnp.zeros((n,), dtype)
        else:
            wavelength = jnp.asarray(wavelength, dtype)
        if jnp.ndim(ray_id) == 0:
            ray_id = jnp.full((n,), ray_id, jnp.int32)
        else:
            ray_id = jnp.asarray(ray_id, jnp.int32)
        px, py, pz = v3.from_array(pos)
        d = v3.from_array(direction)
        inv = 1.0 / jnp.sqrt(jnp.maximum(v3.norm2(d), 1e-12))
        return cls(px=px, py=py, pz=pz,
                   dx=d[0] * inv, dy=d[1] * inv, dz=d[2] * inv,
                   intensity=intensity, ray_id=ray_id, wavelength=wavelength)

    @classmethod
    def from_components(cls, pos_c, dir_c, intensity, ray_id, wavelength):
        return cls(px=pos_c[0], py=pos_c[1], pz=pos_c[2],
                   dx=dir_c[0], dy=dir_c[1], dz=dir_c[2],
                   intensity=intensity, ray_id=ray_id, wavelength=wavelength)

    # -- views -------------------------------------------------------------

    @property
    def pos(self):
        """[N, 3] position view (materialized on access)."""
        return v3.to_array(self.pos_c)

    @property
    def dir(self):
        """[N, 3] direction view (materialized on access)."""
        return v3.to_array(self.dir_c)

    @property
    def pos_c(self):
        return (self.px, self.py, self.pz)

    @property
    def dir_c(self):
        return (self.dx, self.dy, self.dz)

    @property
    def n(self):
        return self.px.shape[0]

    @property
    def alive(self):
        return self.intensity > 0

    # -- updates -----------------------------------------------------------

    def masked_update(self, mask, new_pos, new_dir, intensity_mod):
        """Functional equivalent of the reference's differentiable
        ``scatter_update`` (rays/ray.py:29-40).  ``new_pos`` / ``new_dir``
        are component tuples (or [N, 3] arrays, converted)."""
        if not isinstance(new_pos, tuple):
            new_pos = v3.from_array(new_pos)
        if not isinstance(new_dir, tuple):
            new_dir = v3.from_array(new_dir)
        p = v3.where(mask, new_pos, self.pos_c)
        d = v3.where(mask, new_dir, self.dir_c)
        return self.replace(
            px=p[0], py=p[1], pz=p[2], dx=d[0], dy=d[1], dz=d[2],
            intensity=jnp.where(mask, self.intensity * intensity_mod,
                                self.intensity))

    def with_coords(self, new_pos, new_dir):
        """New Rays sharing metadata (reference rays/ray.py:84-97)."""
        if not isinstance(new_pos, tuple):
            new_pos = v3.from_array(new_pos)
        if not isinstance(new_dir, tuple):
            new_dir = v3.from_array(new_dir)
        return self.replace(px=new_pos[0], py=new_pos[1], pz=new_pos[2],
                            dx=new_dir[0], dy=new_dir[1], dz=new_dir[2])

    @staticmethod
    def concatenate(batches):
        """Merge per-bundle batches along the ray axis (reference
        ``Scene._build_rays``, scene/base.py:57-90)."""
        import jax
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs), *batches)
