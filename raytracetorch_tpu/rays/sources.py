"""Stochastic ray sources (bundles) with explicit PRNG-key threading.

Re-designs the reference's ``rays/bundle.py`` / ``beam.py`` / ``particle.py``
/ ``panels.py`` source hierarchy as immutable pytrees whose ``sample(key, N)``
is pure: same key -> same rays, jit/vmap/shard-friendly (the reference draws
from torch's hidden global RNG).  Sampling math is replicated 1:1 — inverse
CDFs, sqrt-radius disk mapping, Frisvad ONB, Cardano's Rayleigh inverse, etc.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..geom.transform import Frame
from .ray import Rays

TWO_PI = 2.0 * math.pi


class Bundle(struct.PyTreeNode):
    """Base source: all rays at the local origin pointing +z, placed into the
    world by the bundle frame (reference rays/bundle.py:9-37).  ``wavelength``
    (um) tags every sampled ray; 0 means unset (traced at the d line by
    dispersive surfaces)."""

    frame: Frame
    ray_id: int = struct.field(pytree_node=False, default=0)
    wavelength: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def make(cls, ray_id=0, rotation=None, translation=None, **kw):
        return cls(frame=Frame.create(rotation, translation),
                   ray_id=ray_id, **kw)

    def sample_pos(self, key, n):
        return jnp.zeros((n, 3))

    def sample_dir(self, key, n):
        return jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))

    def sample(self, key, n, dtype=jnp.float32) -> Rays:
        """Draw n rays.  ``dtype`` sets the ray precision (pass
        jnp.float64 under jax.enable_x64 to match f64 scene params — the
        sensor record otherwise downcasts, see tests/test_x64.py)."""
        kp, kd = jax.random.split(key)
        pos = self.sample_pos(kp, n)
        direction = self.sample_dir(kd, n)
        pos_g, dir_g = self.frame.place(pos, direction)
        wl = jnp.full((n,), self.wavelength, dtype)
        return Rays.create(pos_g, dir_g, ray_id=self.ray_id, wavelength=wl,
                           dtype=dtype)


def disk_sample(key, n, r_inner2, r_outer2, theta_min=0.0, theta_max=TWO_PI):
    """Uniform annulus via the sqrt-of-uniform-radius^2 mapping (reference
    DiskSample, rays/bundle.py:40-56)."""
    ku, kt = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(ku, (n,), minval=r_inner2,
                                    maxval=r_outer2))
    theta = jax.random.uniform(kt, (n,), minval=theta_min, maxval=theta_max)
    x, y = r * jnp.cos(theta), r * jnp.sin(theta)
    return jnp.stack([x, y, jnp.zeros_like(x)], axis=1)


def solid_angle_dirs(key, n, cos_cap_F):
    """Uniform directions in a cone: phi from the inverse CDF
    acos(1 - 2F) with F ~ U(0, F_max) (reference SolidAngleSample,
    rays/bundle.py:58-80)."""
    kf, kt = jax.random.split(key)
    F = jax.random.uniform(kf, (n,), maxval=cos_cap_F)
    phi = jnp.arccos(jnp.clip(1.0 - 2.0 * F, -1.0, 1.0))
    theta = jax.random.uniform(kt, (n,), maxval=TWO_PI)
    dz = jnp.cos(phi)
    dr = jnp.sin(phi)
    return jnp.stack([jnp.cos(theta) * dr, jnp.sin(theta) * dr, dz], axis=1)


def cdf_phi(phi):
    """Reference ``SolidAngleSample.CDF_phi`` (rays/bundle.py:77-80)."""
    return (1.0 - jnp.cos(phi)) / 2.0


class CollimatedDisk(Bundle):
    """Parallel +z rays over a disk (reference rays/bundle.py:83-98)."""

    radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def sample_pos(self, key, n):
        return disk_sample(key, n, 0.0, self.radius * self.radius)


class CollimatedLine(Bundle):
    """Parallel +z rays along a line.  NOTE: the reference samples
    x in [-length, length] (rays/bundle.py:101-118 — its ``length_2``
    actually holds the full length); replicated as-is for parity."""

    length: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def sample_pos(self, key, n):
        x = jax.random.uniform(key, (n,), minval=-self.length,
                               maxval=self.length)
        return jnp.stack([x, jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)


class Fan(Bundle):
    """2D angular fan in the YZ plane (reference rays/bundle.py:121-140)."""

    angle: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))

    def sample_dir(self, key, n):
        half = self.angle / 2.0
        theta = jax.random.uniform(key, (n,), minval=-half, maxval=half)
        return jnp.stack([jnp.zeros_like(theta), jnp.sin(theta),
                          jnp.cos(theta)], axis=1)


class PointSource(Bundle):
    """Diverging cone defined by numerical aperture (reference
    rays/bundle.py:143-170)."""

    na: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.1))

    def sample_dir(self, key, n):
        cap = cdf_phi(jnp.arcsin(self.na))
        return solid_angle_dirs(key, n, cap)


class GaussianBeam(Bundle):
    """Collimated Gaussian beam; sigma = diameter_1e2 / 4 (reference
    rays/beam.py:9-41)."""

    diameter_x: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    diameter_y: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def sample_pos(self, key, n):
        kx, ky = jax.random.split(key)
        x = jax.random.normal(kx, (n,)) * (self.diameter_x / 4.0)
        y = jax.random.normal(ky, (n,)) * (self.diameter_y / 4.0)
        return jnp.stack([x, y, jnp.zeros_like(x)], axis=1)


def _frisvad_onb(normals):
    """Frisvad (2012) orthonormal basis from normals (reference
    rays/particle.py:53-83)."""
    nz = normals[:, 2]
    sign = jnp.sign(nz + 1e-10)
    a = -1.0 / (sign + nz)
    b = normals[:, 0] * normals[:, 1] * a
    tangent = jnp.stack([1.0 + sign * normals[:, 0] ** 2 * a, sign * b,
                         -sign * normals[:, 0]], axis=1)
    bitangent = jnp.stack([b, sign + normals[:, 1] ** 2 * a,
                           -normals[:, 1]], axis=1)
    return tangent, bitangent


def cosine_hemisphere(key, n):
    """Cosine-weighted hemisphere around +z: the sqrt mapping of the
    reference's LambertianEmission (rays/panels.py:16-37)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    r = jnp.sqrt(u1)
    phi = TWO_PI * u2
    z = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=1)


class LambertianSphere(Bundle):
    """Spherical Lambertian emitter: uniform surface positions, cosine
    hemisphere directions about the outward normal (reference
    rays/particle.py:9-83)."""

    radius: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))

    def sample(self, key, n, dtype=jnp.float32):
        kp, kd = jax.random.split(key)
        k1, k2 = jax.random.split(kp)
        cos_t = 2.0 * jax.random.uniform(k1, (n,)) - 1.0
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t ** 2, 0.0))
        phi = TWO_PI * jax.random.uniform(k2, (n,))
        normals = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                             cos_t], axis=1)
        pos = normals * self.radius

        local = cosine_hemisphere(kd, n)
        tangent, bitangent = _frisvad_onb(normals)
        dirs = (local[:, 0:1] * tangent + local[:, 1:2] * bitangent
                + local[:, 2:3] * normals)

        pos_g, dir_g = self.frame.place(pos, dirs)
        wl = jnp.full((n,), self.wavelength, dtype)
        return Rays.create(pos_g, dir_g, ray_id=self.ray_id, wavelength=wl,
                           dtype=dtype)


class RayleighScatter(Bundle):
    """Point source with the Rayleigh phase function p(theta) ~ 1 + cos^2:
    exact Cardano inverse-CDF (reference rays/particle.py:86-124)."""

    def sample_dir(self, key, n):
        ku, kp = jax.random.split(key)
        u = jax.random.uniform(ku, (n,))
        half_q = 2.0 - 4.0 * u
        A = jnp.cbrt(jnp.sqrt(half_q ** 2 + 1.0) - half_q)
        cos_t = A - 1.0 / A
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t ** 2, 0.0))
        phi = TWO_PI * jax.random.uniform(kp, (n,))
        return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                          cos_t], axis=1)


class MieScatter(Bundle):
    """Point source with the exact Mie-scattering angular distribution.

    The reference stubs this pending an external solver
    (rays/particle.py:127-163); here the Bohren & Huffman series is built in
    (rays/mie.py): the phase function |S1|^2 + |S2|^2 is tabulated once at
    construction into an inverse CDF that the jitted sampler interpolates.
    +z is the forward-scattering axis.  Sizes/wavelengths in nm.
    """

    # Tabulated inverse CDF is derived state: rebuilt by ``make``, skipped
    # by config serialization (config.py::_pytree_config).
    _derived_fields = ('mie_u', 'mie_mu')

    particle_size_nm: float = struct.field(pytree_node=False, default=0.0)
    wavelength_nm: float = struct.field(pytree_node=False, default=0.0)
    particle_ior: float = struct.field(pytree_node=False, default=1.0)
    environment_ior: float = struct.field(pytree_node=False, default=1.0)
    mie_u: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(0, jnp.float32))
    mie_mu: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros(0, jnp.float32))

    @classmethod
    def make(cls, ray_id=0, rotation=None, translation=None,
             particle_size_nm=0.0, wavelength_nm=0.0, particle_ior=1.0,
             environment_ior=1.0, **kw):
        from .mie import mie_inverse_cdf
        u, mu = mie_inverse_cdf(particle_size_nm, wavelength_nm,
                                particle_ior, environment_ior)
        return cls(frame=Frame.create(rotation, translation), ray_id=ray_id,
                   particle_size_nm=particle_size_nm,
                   wavelength_nm=wavelength_nm, particle_ior=particle_ior,
                   environment_ior=environment_ior,
                   mie_u=jnp.asarray(u), mie_mu=jnp.asarray(mu), **kw)

    def sample_dir(self, key, n):
        ku, kp = jax.random.split(key)
        u = jax.random.uniform(ku, (n,))
        cos_t = jnp.interp(u, self.mie_u, self.mie_mu)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t ** 2, 0.0))
        phi = TWO_PI * jax.random.uniform(kp, (n,))
        return jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi),
                          cos_t], axis=1)


class SolidAngleEmission(struct.PyTreeNode):
    """Uniform-in-solid-angle cone emission (reference rays/panels.py:40-61)."""

    cone_angle: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.float32(math.pi / 4.0))

    def sample_dir(self, key, n):
        return solid_angle_dirs(key, n, cdf_phi(self.cone_angle))


class LambertianEmission(struct.PyTreeNode):
    """Cosine-weighted emission (reference rays/panels.py:16-37)."""

    def sample_dir(self, key, n):
        return cosine_hemisphere(key, n)


class RectangularPanel(Bundle):
    """Rectangular area source with pluggable emission model (reference
    rays/panels.py:85-119)."""

    width: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    height: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    emission: LambertianEmission = struct.field(
        default_factory=LambertianEmission)

    def sample_pos(self, key, n):
        kx, ky = jax.random.split(key)
        x = jax.random.uniform(kx, (n,), minval=-self.width / 2,
                               maxval=self.width / 2)
        y = jax.random.uniform(ky, (n,), minval=-self.height / 2,
                               maxval=self.height / 2)
        return jnp.stack([x, y, jnp.zeros_like(x)], axis=1)

    def sample_dir(self, key, n):
        return self.emission.sample_dir(key, n)


class RingSource(Bundle):
    """Annular area source (reference rays/panels.py:122-154)."""

    radius_inner: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(0.0))
    radius_outer: jnp.ndarray = struct.field(default_factory=lambda: jnp.float32(1.0))
    emission: LambertianEmission = struct.field(
        default_factory=LambertianEmission)

    def sample_pos(self, key, n):
        return disk_sample(key, n, self.radius_inner ** 2,
                           self.radius_outer ** 2)

    def sample_dir(self, key, n):
        return self.emission.sample_dir(key, n)


def sample_bundles(key, bundles_with_counts, dtype=jnp.float32):
    """Sample and concatenate all bundles (reference ``Scene._build_rays``,
    scene/base.py:57-90)."""
    keys = jax.random.split(key, len(bundles_with_counts))
    batches = [b.sample(k, n, dtype) for k, (b, n) in
               zip(keys, bundles_with_counts)]
    return batches[0] if len(batches) == 1 else Rays.concatenate(batches)
