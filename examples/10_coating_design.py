"""Anti-reflection coating design by gradient descent.

The thin-film module (utils/coatings.py) is a pure jax function of layer
thicknesses, so the same optimizer that designs lens curvatures designs
coatings.  Here: a 4-layer MgF2/ZnS stack on BK7 is optimized to minimize
the MEAN unpolarized reflectance over the visible band (0.45-0.65 um) and
0-30 degrees incidence — the classic broadband AR problem.  Compared
against bare glass (4.3%) and the single quarter-wave MgF2 coat (1.3%).
Saves a figure of R(lambda) before/after.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracetorch_tpu.utils.coatings import unpolarized_reflectance

OUT = os.path.join(os.path.dirname(__file__), 'output')
NS = 1.5168                       # BK7
N_LO, N_HI = 1.38, 2.35           # MgF2 / ZnS
STACK = [N_LO, N_HI, N_LO, N_HI]  # low index on the air side
WLS = jnp.linspace(0.45, 0.65, 21)
COS_AOI = jnp.cos(jnp.linspace(0.0, jnp.deg2rad(30.0), 5))


def band_R(d_stack, n_stack=STACK):
    R = unpolarized_reflectance(n_stack, list(d_stack), 1.0, NS,
                                COS_AOI[:, None], WLS[None, :])
    return jnp.mean(R)


def main():
    d = jnp.asarray([0.09, 0.05, 0.03, 0.02], jnp.float32)
    opt = optax.adam(1e-3)
    loss0 = float(band_R(d))

    @jax.jit
    def run(d):                    # whole design loop in ONE device program
        def step(carry, _):
            d, state = carry
            g = jax.grad(band_R)(d)
            up, state = opt.update(g, state)
            return (jnp.clip(d + up, 1e-3, 0.4), state), None
        (d, _), _ = jax.lax.scan(step, (d, opt.init(d)), None, length=1500)
        return d

    d = run(d)
    bare = float(band_R([], []))
    qw = float(band_R([0.55 / (4 * N_LO)], [N_LO]))
    final = float(band_R(d))
    print(f'mean R over 450-650 nm, 0-30 deg:')
    print(f'  bare BK7:            {bare * 100:.2f}%')
    print(f'  quarter-wave MgF2:   {qw * 100:.2f}%')
    print(f'  4-layer optimized:   {final * 100:.3f}%  '
          f'(init {loss0 * 100:.2f}%)')
    print(f'  thicknesses (nm): {np.asarray(d) * 1e3}')
    assert final < qw < bare

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    os.makedirs(OUT, exist_ok=True)
    wl = np.linspace(0.42, 0.70, 200)
    fig, ax = plt.subplots(figsize=(8, 5))
    for label, ns, ds in (
            ('bare BK7', [], []),
            ('quarter-wave MgF2', [N_LO], [0.55 / (4 * N_LO)]),
            ('4-layer optimized', STACK, list(np.asarray(d)))):
        R = unpolarized_reflectance(ns, ds, 1.0, NS, jnp.float32(1.0),
                                    jnp.asarray(wl, jnp.float32))
        ax.plot(wl * 1e3, np.asarray(R) * 100, label=label)
    ax.axvspan(450, 650, color='gray', alpha=0.12, label='design band')
    ax.set_xlabel('wavelength (nm)')
    ax.set_ylabel('reflectance (%)')
    ax.set_title('AR coating design by jax.grad (normal incidence cut)')
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(OUT, '10_coating_design.png'), dpi=110)
    print('saved', os.path.join(OUT, '10_coating_design.png'))


if __name__ == '__main__':
    main()
