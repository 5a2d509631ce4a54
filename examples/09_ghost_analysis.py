"""Ghost-image (stray light) analysis via stochastic Fresnel Monte Carlo.

Every air-glass surface reflects ~4% (unpolarized Fresnel); double
reflections inside a lens form defocused "ghost" images on the sensor.
The reference models this with its RefractFresnel functor
(phys/std.py:148) but offers no way to see it; here the non-sequential
engine traces a Fresnel singlet with a generous bounce budget and the
sensor's irradiance grid exposes the ghost halo around the focused spot.

On real TPU the same scene also runs through the fused bounce-loop kernel
(`Scene.simulate_fused`, in-kernel PRNG) for large-N flux statistics.
Saves a 2-panel figure.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, Scene, SensorElement,
                               SingletLens)

OUT = os.path.join(os.path.dirname(__file__), 'output')


def make_scene(grid=True, coating=None):
    scene = Scene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5168,
                    fresnel=True, coating=coating, name='lens'),
        SensorElement(radius=8.0, translation=[0.0, 0.0, 19.3],
                      name='sensor'),
    ], n_bounces=12)
    if grid:
        scene.grid_shape = (256, 256)
        scene.grid_half_extent = 4.0
    return scene


def main():
    key = jax.random.PRNGKey(0)
    scene = make_scene()
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key,
                                                                 2_000_000)
    out, sensors, _ = jax.jit(
        lambda p, r, k: scene.simulate(p, r, k))(params, rays,
                                                 jax.random.PRNGKey(1))
    img = np.asarray(sensors.grid[0])
    total = img.sum()
    # the focused core: central 5% box; everything else is ghost/stray
    h, w = img.shape
    c = slice(h // 2 - h // 8, h // 2 + h // 8)
    core = img[c, c].sum()
    print(f'sensor flux: {total:.0f} of {rays.n} rays')
    ghost_bare = (total - core) / total
    print(f'ghost + stray fraction outside the core: {ghost_bare:.2e} '
          f'(single-surface Fresnel reflectance ~4%)')

    # quarter-wave MgF2 on both faces (utils/coatings.py, examples/10):
    # R drops 4.26% -> 1.28% per surface, double-reflection ghosts ~11x
    coated = make_scene(coating=[(1.38, 0.5876 / (4 * 1.38))])
    _, s_c, _ = jax.jit(lambda p, r, k: coated.simulate(p, r, k))(
        coated.init_params(), rays, jax.random.PRNGKey(1))
    img_c = np.asarray(s_c.grid[0])
    ghost_coat = (img_c.sum() - img_c[c, c].sum()) / img_c.sum()
    print(f'with a quarter-wave MgF2 AR coat: {ghost_coat:.2e} '
          f'({ghost_bare / max(ghost_coat, 1e-12):.1f}x less stray light)')

    fused_note = ''
    if jax.devices()[0].platform == 'tpu':
        big = CollimatedDisk.make(radius=jnp.float32(4.0),
                                  translation=[0, 0, -10.0]).sample(
                                      key, 8 * 1024 * 1024)
        s2 = make_scene(grid=False)
        _, sf, _ = jax.jit(lambda p, r, k: s2.simulate_fused(p, r, k))(
            params, big, jax.random.PRNGKey(2))
        frac = float(sf.moments[0, 0, 0]) / big.n
        fused_note = (f'fused 8M-ray run: {frac:.4f} of launched power '
                      f'reaches the sensor')
        print(fused_note)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    os.makedirs(OUT, exist_ok=True)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 5))
    e = scene.grid_half_extent
    im = ax1.imshow(np.log10(img / img.max() + 1e-8),
                    extent=[-e, e, -e, e], cmap='inferno', vmin=-6)
    fig.colorbar(im, ax=ax1, label='log10 relative irradiance')
    ax1.set_title('sensor irradiance: focus + Fresnel ghosts')
    ax1.set_xlabel('mm')
    prof = img[img.shape[0] // 2]
    xs = np.linspace(-e, e, img.shape[1])
    ax2.semilogy(xs, prof / prof.max() + 1e-9)
    ax2.set_xlabel('mm')
    ax2.set_ylabel('relative irradiance')
    ax2.set_title('horizontal cut: ghost halo ~1e-3 of peak')
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, '09_ghost_analysis.png'), dpi=110)
    print('saved', os.path.join(OUT, '09_ghost_analysis.png'))


if __name__ == '__main__':
    main()
