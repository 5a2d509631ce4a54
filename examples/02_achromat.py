"""Design an achromatic doublet: pull the F (blue) and C (red) foci together
with jax.grad through the chromatic trace.  Saves a longitudinal-chromatic-
aberration plot before/after."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import CollimatedDisk, DoubletLens, Rays, SequentialScene
from raytracetorch_tpu.optim.fit import fit_lbfgs

OUT = os.path.join(os.path.dirname(__file__), 'output')
WAVELENGTHS = np.linspace(0.45, 0.70, 26)


def focus_curve(scene, p, key):
    zs = []
    for wl in WAVELENGTHS:
        r = Rays.create([[0.0, 2.0, -10.0]], [[0.0, 0.0, 1.0]],
                        wavelength=[float(wl)])
        out, _, _ = scene.simulate(p, r, key)
        t = -out.pos[0, 1] / out.dir[0, 1]
        zs.append(float(out.pos[0, 2] + t * out.dir[0, 2]))
    return np.asarray(zs)


def main():
    key = jax.random.PRNGKey(0)
    scene = SequentialScene([DoubletLens(
        c1=0.02, c2=-0.025, c3=-0.004, d=20.0, t1=4.0, t2=2.0,
        ior_glass1=1.5168, ior_glass2=1.6727,
        abbe_vd1=64.17, abbe_vd2=32.25,
        c1_grad=True, c2_grad=True, c3_grad=True, name='achromat')])
    params = scene.init_params()

    b_f = CollimatedDisk.make(radius=jnp.float32(3.0), ray_id=0,
                              wavelength=0.4861, translation=[0, 0, -10.0])
    b_c = CollimatedDisk.make(radius=jnp.float32(3.0), ray_id=1,
                              wavelength=0.6563, translation=[0, 0, -10.0])
    rays = scene.sample_rays(key, [(b_f, 3000), (b_c, 3000)])

    def loss(p):
        out, _, _ = scene.simulate(p, rays, key)
        t = (100.0 - out.pos[:, 2]) / (out.dir[:, 2] + 1e-6)
        x = out.pos[:, 0] + t * out.dir[:, 0]
        y = out.pos[:, 1] + t * out.dir[:, 1]
        return jnp.mean(x ** 2 + y ** 2)

    before = focus_curve(scene, params, key)
    params, losses = fit_lbfgs(loss, params, trainable=scene.trainable(),
                               steps=50)
    after = focus_curve(scene, params, key)

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(WAVELENGTHS * 1e3, before, 'o-', label='initial')
    ax.plot(WAVELENGTHS * 1e3, after, 's-', label='achromatized')
    ax.set_xlabel('wavelength (nm)')
    ax.set_ylabel('paraxial focus z')
    ax.set_title('Longitudinal chromatic aberration')
    ax.legend()
    fig.savefig(os.path.join(OUT, 'achromat_lca.png'), dpi=120,
                bbox_inches='tight')
    print(f"F-C focus gap: {abs(before[1]-before[-2]):.3f} -> "
          f"{abs(after[1]-after[-2]):.3f}")


if __name__ == '__main__':
    main()
