"""Statistical tests of every ray source: replaces the reference's
scatter-plot eyeballing (tests/vis_bundle.py) with numeric distribution
checks against the analytic densities each sampler claims."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, CollimatedLine, Fan,
                               GaussianBeam, LambertianSphere, MieScatter,
                               PointSource, RayleighScatter, RectangularPanel,
                               RingSource, sample_bundles)

N = 40000


def test_collimated_disk_uniform(key):
    b = CollimatedDisk.make(radius=jnp.float32(2.0))
    r = b.sample(key, N)
    np.testing.assert_allclose(np.asarray(r.dir),
                               np.tile([[0, 0, 1.0]], (N, 1)), atol=1e-6)
    rad = np.hypot(np.asarray(r.pos[:, 0]), np.asarray(r.pos[:, 1]))
    assert rad.max() <= 2.0 + 1e-5
    # Uniform density on the disk: E[r^2] = R^2/2, fraction within R/2 = 1/4
    np.testing.assert_allclose((rad ** 2).mean(), 2.0, rtol=0.03)
    np.testing.assert_allclose((rad < 1.0).mean(), 0.25, atol=0.01)


def test_collimated_line_extent(key):
    b = CollimatedLine.make(length=jnp.float32(3.0))
    r = b.sample(key, N)
    x = np.asarray(r.pos[:, 0])
    # PARITY.md §8: the reference samples the FULL +/- length
    assert 2.9 < x.max() <= 3.0 and -3.0 <= x.min() < -2.9
    np.testing.assert_allclose(np.asarray(r.pos[:, 1:]).std(), 0.0, atol=1e-7)


def test_fan_angle(key):
    b = Fan.make(angle=jnp.float32(0.6))
    r = b.sample(key, N)
    theta = np.arctan2(np.asarray(r.dir[:, 1]), np.asarray(r.dir[:, 2]))
    assert abs(theta).max() <= 0.3 + 1e-4
    np.testing.assert_allclose(np.asarray(r.dir[:, 0]), 0.0, atol=1e-7)
    np.testing.assert_allclose(theta.mean(), 0.0, atol=0.01)


def test_point_source_na(key):
    """Cone half-angle equals asin(NA) exactly, with the uniform-solid-angle
    density (PARITY.md §4: the reference's CDF/invCDF pair is inconsistent)."""
    na = 0.3
    b = PointSource.make(na=jnp.float32(na))
    r = b.sample(key, N)
    cos_phi = np.asarray(r.dir[:, 2])
    phi_max = math.asin(na)
    assert np.arccos(cos_phi).max() <= phi_max + 1e-3
    # Uniform in solid angle: cos(phi) ~ U(cos(phi_max), 1)
    u = (1.0 - cos_phi) / (1.0 - math.cos(phi_max))
    hist, _ = np.histogram(u, bins=10, range=(0, 1), density=True)
    np.testing.assert_allclose(hist, 1.0, atol=0.08)


def test_gaussian_beam_sigma(key):
    b = GaussianBeam.make(diameter_x=jnp.float32(4.0),
                          diameter_y=jnp.float32(8.0))
    r = b.sample(key, N)
    np.testing.assert_allclose(np.asarray(r.pos[:, 0]).std(), 1.0, rtol=0.03)
    np.testing.assert_allclose(np.asarray(r.pos[:, 1]).std(), 2.0, rtol=0.03)


def test_lambertian_sphere(key):
    b = LambertianSphere.make(radius=jnp.float32(2.0))
    r = b.sample(key, N)
    rad = np.linalg.norm(np.asarray(r.pos), axis=1)
    np.testing.assert_allclose(rad, 2.0, atol=1e-4)
    # Uniform on the sphere: z/R ~ U(-1, 1)
    np.testing.assert_allclose(np.asarray(r.pos[:, 2]).mean(), 0.0, atol=0.05)
    # Lambert's cosine law: E[cos(theta_local)] = 2/3 where theta_local is
    # measured from the outward normal
    n = np.asarray(r.pos) / rad[:, None]
    mu = np.sum(np.asarray(r.dir) * n, axis=1)
    assert mu.min() > -1e-4              # all emitted outward
    np.testing.assert_allclose(mu.mean(), 2.0 / 3.0, atol=0.01)


def test_rayleigh_phase_function(key):
    """p(mu) ~ (1 + mu^2): E[mu] = 0, E[mu^2] = 2/5 by symmetry of the
    normalized density 3(1+mu^2)/8."""
    b = RayleighScatter.make()
    r = b.sample(key, N)
    mu = np.asarray(r.dir[:, 2])
    np.testing.assert_allclose(mu.mean(), 0.0, atol=0.01)
    np.testing.assert_allclose((mu ** 2).mean(), 0.4, atol=0.01)


def test_rect_panel_and_ring(key):
    b = RectangularPanel.make(width=jnp.float32(2.0), height=jnp.float32(4.0))
    r = b.sample(key, N)
    x, y = np.asarray(r.pos[:, 0]), np.asarray(r.pos[:, 1])
    assert abs(x).max() <= 1.0 and abs(y).max() <= 2.0
    # Lambertian: E[dz] = 2/3
    np.testing.assert_allclose(np.asarray(r.dir[:, 2]).mean(), 2.0 / 3.0,
                               atol=0.01)

    ring = RingSource.make(radius_inner=jnp.float32(1.0),
                           radius_outer=jnp.float32(2.0))
    rr = ring.sample(key, N)
    rad = np.hypot(np.asarray(rr.pos[:, 0]), np.asarray(rr.pos[:, 1]))
    assert rad.min() >= 1.0 - 1e-5 and rad.max() <= 2.0 + 1e-5


def test_mie_samples(key):
    """MieScatter now has a built-in solver (the reference raises) —
    detailed physics tests live in tests/test_mie.py."""
    b = MieScatter.make(particle_size_nm=500.0, wavelength_nm=532.0,
                        particle_ior=1.59, environment_ior=1.33)
    r = b.sample(key, 64)
    assert np.isfinite(np.asarray(r.dir)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(r.dir), axis=1),
                               1.0, atol=1e-5)


def test_bundle_transform_and_merge(key):
    """Bundle frames place rays (rotation then translation, reference
    RayTransformBundle semantics) and sample_bundles concatenates with
    per-bundle ray ids."""
    b0 = CollimatedDisk.make(radius=jnp.float32(1.0), ray_id=0,
                             translation=[0.0, 0.0, -5.0])
    b1 = CollimatedDisk.make(radius=jnp.float32(1.0), ray_id=1,
                             rotation=[math.pi / 2, 0.0, 0.0])
    rays = sample_bundles(key, [(b0, 100), (b1, 50)])
    assert rays.n == 150
    assert (np.asarray(rays.ray_id[:100]) == 0).all()
    assert (np.asarray(rays.ray_id[100:]) == 1).all()
    np.testing.assert_allclose(np.asarray(rays.pos[:100, 2]), -5.0, atol=1e-6)
    # rot +90 deg about x maps +z to -y  (row convention d @ R.T)
    np.testing.assert_allclose(np.asarray(rays.dir[100:]),
                               np.tile([[0.0, -1.0, 0.0]], (50, 1)),
                               atol=1e-5)


def test_reproducible_sampling(key):
    b = CollimatedDisk.make(radius=jnp.float32(1.0))
    r1, r2 = b.sample(key, 64), b.sample(key, 64)
    np.testing.assert_array_equal(np.asarray(r1.pos), np.asarray(r2.pos))
    r3 = b.sample(jax.random.PRNGKey(99), 64)
    assert np.abs(np.asarray(r1.pos) - np.asarray(r3.pos)).max() > 1e-3
