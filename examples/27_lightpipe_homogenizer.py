"""Lightpipe homogenizer: a mirrored rectangular pipe turns a peaked
source cone into a flat exit irradiance.

The classic illumination component (projector integrators, laser
homogenizers): an off-center point source launches a cone into a
4 x 4 mm mirrored pipe (``Box4SideElement`` with REFLECT faces — four
self-bounded infinite planes); after ~a dozen wall bounces the kaleido-
scope of virtual images overlaps into a uniform exit patch.  All in
the non-sequential bounce driver (cond-guarded early exit keeps the
50-bounce budget cheap once rays settle) with the MXU-binned
irradiance grid on the exit sensor.

Uniformity is quantified as the relative std over the central exit
area: the bare cone is strongly peaked (>50%), the pipe output flat
(<10%) — and the pipe loses no energy (ideal mirrors, flux conserved).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (Box4SideElement, PointSource, Scene,
                               SensorElement)
from raytracetorch_tpu.constants import PhysKind

L = 40.0          # pipe length to the exit sensor
W = 4.0           # pipe width/height


def run(with_pipe, key, n=400_000):
    els = []
    if with_pipe:
        els.append(Box4SideElement(width=W, height=W,
                                   ph_kind=PhysKind.REFLECT,
                                   name='pipe'))
    els.append(SensorElement(half_x=W / 2, half_y=W / 2,
                             translation=[0, 0, L], name='exit'))
    sc = Scene(els, n_bounces=50)
    sc.grid_shape = (64, 64)
    sc.grid_half_extent = W / 2
    # off-center source, NA 0.35 cone — deliberately asymmetric
    rays = PointSource.make(na=jnp.float32(0.35),
                            translation=[0.9, 0.5, 0.0]).sample(key, n)
    _, sens, _ = sc.simulate(sc.init_params(), rays, key)
    grid = np.asarray(sens.grid[0])
    flux = float(np.asarray(sens.moments)[0, ..., 0].sum())
    return grid, flux, n


def main():
    key = jax.random.PRNGKey(0)
    g_bare, f_bare, n = run(False, key)
    g_pipe, f_pipe, _ = run(True, key)

    def central_rel_std(g):
        c = g[12:52, 12:52]              # central ~80% of the exit
        return float(c.std() / max(c.mean(), 1e-12))

    u_bare, u_pipe = central_rel_std(g_bare), central_rel_std(g_pipe)
    print(f'bare cone : flux {f_bare:9.0f}  central rel-std '
          f'{100 * u_bare:5.1f}%')
    print(f'with pipe : flux {f_pipe:9.0f}  central rel-std '
          f'{100 * u_pipe:5.1f}%')
    # ideal mirrors conserve energy; the pipe folds EVERYTHING onto the
    # 4x4 exit while the bare cone overfills it
    assert f_pipe > f_bare
    assert f_pipe > 0.999 * n   # every ray reaches the exit (corner
                                # rays can land an ulp outside)
    assert u_bare > 3 * u_pipe
    assert u_pipe < 0.12

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 2, figsize=(8, 4))
        for ax, (g, t) in zip(axes, ((g_bare, 'bare cone'),
                                     (g_pipe, 'mirrored pipe'))):
            ax.imshow(g, origin='lower', cmap='magma',
                      extent=[-W / 2, W / 2, -W / 2, W / 2])
            ax.set_title(t)
        fig.suptitle('lightpipe homogenization (exit irradiance)')
        fig.tight_layout()
        fig.savefig(os.path.join(os.path.dirname(__file__), 'output',
                                 '27_lightpipe.png'), dpi=110)
        print('wrote examples/output/27_lightpipe.png')
    except ImportError:
        pass


if __name__ == '__main__':
    main()
