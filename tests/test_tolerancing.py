"""Tolerancing tests: Monte-Carlo pose perturbation (the reference's
RayTransformNoisy capability, geom/transform.py:141-242)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.tolerancing import (monte_carlo_tolerance,
                                                 per_ray_perturbed_trace)


def _scene():
    return SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        SensorElement(radius=20.0, translation=[0.0, 0.0, 100.0],
                      name='sensor'),
    ])


def test_monte_carlo_trials_spread(key):
    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 1000)
    noise = {'lens': ((0.0, 0.2, 0.0), (0.0, 0.0, 0.0))}   # decenter in y
    states = monte_carlo_tolerance(scene, p, rays, key, noise, n_trials=16)
    # [n_trials, S, B, 7] moments; per-trial centroids spread in y
    m = np.asarray(states.moments)
    assert m.shape[0] == 16
    cy = m[:, 0, 0, 2] / m[:, 0, 0, 0]
    assert cy.std() > 1e-3          # decenter moves the spot
    assert np.abs(cy).max() < 1.0   # but boundedly
    # zero-noise control: no spread
    states0 = monte_carlo_tolerance(
        scene, p, rays, key, {'lens': ((0, 0, 0), (0, 0, 0))}, n_trials=4)
    cy0 = np.asarray(states0.moments)[:, 0, 0, 2] / \
        np.asarray(states0.moments)[:, 0, 0, 0]
    assert cy0.std() < 1e-7


def test_monte_carlo_reproducible(key):
    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 200)
    noise = {'lens': ((0.1, 0.1, 0.0), (0.0, 0.0, 0.0))}
    a = monte_carlo_tolerance(scene, p, rays, key, noise, n_trials=4)
    b = monte_carlo_tolerance(scene, p, rays, key, noise, n_trials=4)
    np.testing.assert_array_equal(np.asarray(a.moments),
                                  np.asarray(b.moments))


def test_per_ray_perturbation_blurs_spot(key):
    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -10.0]).sample(key, 400)

    out0, s0, _ = scene.simulate(p, rays, key)
    rms0 = float(s0.spot_rms(0)[0])

    noise = {'lens': ((0.0, 0.3, 0.0), (0.0, 0.0, 0.0))}
    out, s = per_ray_perturbed_trace(scene, p, rays, key, noise)
    assert out.pos.shape == rays.pos.shape
    rms = float(s.spot_rms(0)[0])
    # independent per-ray decenters blur the focused spot substantially
    assert rms > rms0 * 2
    w = float(s.total_weight(0)[0])
    assert w > 350


def test_per_ray_batched_frames_match_naive_vmap(key):
    """The single-table batched-frame implementation must be ray-for-ray
    identical to the naive semantics (vmap a full scene rebuild per ray —
    the reference's frozen per-ray RayTransformNoisy, transform.py:195)."""
    from raytracetorch_tpu.utils.tolerancing import (_apply_deltas,
                                                     _sample_deltas)

    scene = _scene()
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -10.0]).sample(key, 8)
    noise = {'lens': ((0.1, 0.3, 0.05), (0.001, 0.002, 0.0))}

    out, s = per_ray_perturbed_trace(scene, p, rays, key, noise)

    kn, kt = jax.random.split(key)
    deltas = _sample_deltas(kn, noise, n=8)

    def one(ray_1, delta_row):
        pp = _apply_deltas(p, delta_row)
        o, _, _ = scene.simulate(pp, ray_1, kt)
        return o

    rays_1 = jax.tree_util.tree_map(lambda a: a[:, None], rays)
    out_naive = jax.vmap(one)(rays_1, deltas)
    out_naive = jax.tree_util.tree_map(lambda a: a[:, 0], out_naive)
    np.testing.assert_allclose(np.asarray(out.pos),
                               np.asarray(out_naive.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.dir),
                               np.asarray(out_naive.dir), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.intensity),
                               np.asarray(out_naive.intensity), atol=1e-6)
