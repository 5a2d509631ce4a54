"""Ray batch state as an immutable structure-of-arrays pytree.

TPU-native equivalent of the reference's ``Rays`` tensorclass
(``rays/ray.py:7``): same SoA fields, but

- immutable (functional updates via ``masked_update`` instead of the
  reference's in-place ``index_put`` ``scatter_update``, rays/ray.py:29);
- ``ray_id`` is int32 (the reference stores int8, rays/ray.py:71, which
  silently wraps past 127 bundles);
- aliveness is ``intensity > 0`` — dead rays are carried as masked no-ops so
  every shape stays static (no boolean-gather subsetting, the reference's
  ``rays[mask]`` pattern is shape-dynamic poison on TPU).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Rays(struct.PyTreeNode):
    pos: jnp.ndarray          # [N, 3]
    dir: jnp.ndarray          # [N, 3] unit vectors
    intensity: jnp.ndarray    # [N]
    ray_id: jnp.ndarray       # [N] int32 bundle tag
    wavelength: jnp.ndarray   # [N]

    @classmethod
    def create(cls, pos, direction, intensity=None, ray_id=0, wavelength=None,
               dtype=jnp.float32):
        """Factory with broadcasting + defaults (reference ``Rays.initialize``,
        rays/ray.py:42-82); directions are normalized on construction
        (rays/ray.py:22-25)."""
        pos = jnp.atleast_2d(jnp.asarray(pos, dtype))
        direction = jnp.atleast_2d(jnp.asarray(direction, dtype))
        n = pos.shape[0]
        direction = _normalize(direction)
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
        return cls(pos=pos, dir=direction, intensity=intensity,
                   ray_id=ray_id, wavelength=wavelength)

    @property
    def n(self):
        return self.pos.shape[0]

    @property
    def alive(self):
        return self.intensity > 0

    def masked_update(self, mask, new_pos, new_dir, intensity_mod):
        """Functional equivalent of the reference's differentiable
        ``scatter_update`` (rays/ray.py:29-40): where ``mask`` holds, replace
        position/direction and multiply intensity by ``intensity_mod``."""
        m3 = mask[:, None]
        return self.replace(
            pos=jnp.where(m3, new_pos, self.pos),
            dir=jnp.where(m3, new_dir, self.dir),
            intensity=jnp.where(mask, self.intensity * intensity_mod,
                                self.intensity),
        )

    def with_coords(self, new_pos, new_dir):
        """New Rays sharing metadata (reference rays/ray.py:84-97)."""
        return self.replace(pos=new_pos, dir=new_dir)

    @staticmethod
    def concatenate(batches):
        """Merge per-bundle batches along the ray axis (reference
        ``Scene._build_rays``, scene/base.py:57-90)."""
        return Rays(
            pos=jnp.concatenate([r.pos for r in batches]),
            dir=jnp.concatenate([r.dir for r in batches]),
            intensity=jnp.concatenate([r.intensity for r in batches]),
            ray_id=jnp.concatenate([r.ray_id for r in batches]),
            wavelength=jnp.concatenate([r.wavelength for r in batches]),
        )


def _normalize(v, eps=1e-12):
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    return v * jax_rsqrt(jnp.maximum(n2, eps))


def jax_rsqrt(x):
    return 1.0 / jnp.sqrt(x)
