"""Hunt the ghosts of the Cooke triplet: rank all two-reflection
stray-light paths, then image the worst one on the detector.

Every pair of refracting surfaces spawns a ghost (utils/ghosts.py).
`ghost_report` traces a probe pencil through ALL 15 sequences of the
triplet's six faces in one vmapped batch and ranks them by detector
irradiance; `ghost_trace` then re-traces the worst offender with a
500k-ray bundle for an irradiance map — and, because the REFLECT_W
ghost physics is differentiable, prints d(ghost flux)/d(curvature):
the gradient an anti-ghost design loop would descend.

Run: python examples/18_ghost_analysis.py [--cpu]   (~2 min CPU)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:        # for when the TPU tunnel is claimed
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import ghost_report, ghost_trace
from raytracetorch_tpu.rays.ray import Rays

sys.path.insert(0, os.path.dirname(__file__))
cooke = __import__('16_cooke_triplet')

OUT = os.path.join(os.path.dirname(__file__), 'output')
IMG_Z = 60.9


def main():
    scene = cooke.build(pert=1.0)
    params = scene.init_params()

    rep = ghost_report(scene, params, aperture=5.0, z_det=IMG_Z)
    print(f'{len(rep.pairs)} two-reflection sequences '
          f'(one vmapped batch):\n')
    print(rep.table(top=8))

    worst = rep.pairs[rep.ranked()[0]]
    print(f'\nre-tracing worst ghost {worst} with 500k rays...')
    n = 500_000
    key = jax.random.PRNGKey(0)
    xy = jax.random.uniform(key, (2, n), minval=-5.0, maxval=5.0)
    ok = xy[0] ** 2 + xy[1] ** 2 <= 25.0
    zero = jnp.zeros((n,))
    rays = Rays.from_components(
        (xy[0], xy[1], zero - 10.0), (zero, zero, jnp.ones((n,))),
        ok.astype(jnp.float32), jnp.zeros((n,), jnp.int32), zero)

    out, _, _ = ghost_trace(scene, params, rays, key, worst)
    dz = jnp.where(jnp.abs(out.dz) < 1e-30, 1e-30, out.dz)
    t = (IMG_Z - out.pz) / dz
    xd, yd = out.px + t * out.dx, out.py + t * out.dy
    w = np.asarray(out.intensity)
    flux = float(np.sum(w)) / float(np.sum(np.asarray(ok)))
    print(f'ghost flux fraction {flux:.3e} '
          f'(probe-pencil report: {rep.flux[rep.ranked()[0]]:.3e} — '
          f'a full pupil disk sees different incidences/vignetting)')

    # anti-ghost gradient: how the worst ghost's flux moves with each
    # front-crown curvature
    def ghost_flux(p):
        o, _, _ = ghost_trace(scene, p, rays, key, worst)
        return jnp.sum(o.intensity)

    g = jax.grad(ghost_flux)(params)
    print('d(ghost flux)/d(crown_front c1) =',
          float(g['crown_front']['c1']))

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        os.makedirs(OUT, exist_ok=True)
        sel = w > 0
        fig, ax = plt.subplots(figsize=(4.2, 3.8))
        h, xe, ye = np.histogram2d(np.asarray(xd)[sel], np.asarray(yd)[sel],
                                   bins=160, range=[[-8, 8], [-8, 8]],
                                   weights=w[sel])
        ax.imshow(np.log10(h.T + 1e-9), origin='lower', cmap='inferno',
                  extent=[-8, 8, -8, 8])
        i, j = worst
        ax.set_title(f'worst ghost (rows {j}→{i}) on the detector, '
                     f'log irradiance', fontsize=9)
        ax.set_xlabel('x (mm)')
        ax.set_ylabel('y (mm)')
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '18_ghost.png'), dpi=120)
        print(f"saved {os.path.join(OUT, '18_ghost.png')}")
    except Exception as e:                      # headless-matplotlib guard
        print('plot skipped:', e)


if __name__ == '__main__':
    main()
