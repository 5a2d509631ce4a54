"""Monte-Carlo Fresnel physics at trace level: reflection statistics and
energy behavior through a fresnel=True lens."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import CollimatedDisk, SequentialScene, SingletLens


def test_fresnel_lens_transmission_statistics(key):
    """Near-normal incidence through two glass faces: each face reflects
    ~4.2% of rays ((n-1)^2/(n+1)^2 for n=1.5168), so ~91.8% transmit
    through both and continue forward."""
    scene = SequentialScene([SingletLens(
        c1=0.016667, c2=-0.00283, d=25.4, t=4.0, ior_glass=1.5168,
        fresnel=True, name='lens')])
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(2.0),
                               translation=[0, 0, -10.0]).sample(key, 40000)
    out, _, _ = scene.simulate(p, rays, key)
    forward = np.asarray(out.dir[:, 2]) > 0.5
    R = ((1.5168 - 1) / (1.5168 + 1)) ** 2
    expect = (1 - R) ** 2
    np.testing.assert_allclose(forward.mean(), expect, atol=0.01)
    # intensities unchanged (Monte-Carlo branch selection, not attenuation —
    # reference phys/std.py:150-158)
    np.testing.assert_allclose(np.asarray(out.intensity), 1.0, atol=1e-6)


def test_fresnel_reproducible_and_key_sensitive(key):
    scene = SequentialScene([SingletLens(
        c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
        fresnel=True, name='lens')])
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 2000)
    o1, _, _ = scene.simulate(p, rays, key)
    o2, _, _ = scene.simulate(p, rays, key)
    np.testing.assert_array_equal(np.asarray(o1.dir), np.asarray(o2.dir))
    o3, _, _ = scene.simulate(p, rays, jax.random.PRNGKey(7))
    assert np.abs(np.asarray(o1.dir) - np.asarray(o3.dir)).max() > 1e-3
