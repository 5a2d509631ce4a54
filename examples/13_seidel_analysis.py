"""Seidel aberration analysis as a DESIGN tool: print the per-surface
third-order breakdown of a dispersive singlet, bend the lens to the
minimum-spherical shape by following jax.grad of S_I, then aspherize the
front face to kill S_I exactly — and verify each step with real traced
spot sizes.  Everything here is the differentiable-aberration-theory
workflow the Seidel module enables (utils/seidel.py; the torch reference
has no aberration theory at all)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np
from jax import enable_x64

from raytracetorch_tpu import (AsphericLens, CollimatedDisk, SequentialScene,
                               SingletLens, seidel, seidel_table)


def spot_rms(scene, params, z_img, key, n=20000):
    rays = scene.sample_rays(key, dtype=jnp.float64)
    out, _, _ = scene.simulate(params, rays, key)
    pos = np.asarray(out.pos)
    d = np.asarray(out.dir)
    x = pos[:, 0] + (z_img - pos[:, 2]) * d[:, 0] / d[:, 2]
    y = pos[:, 1] + (z_img - pos[:, 2]) * d[:, 1] / d[:, 2]
    return float(np.sqrt((x - x.mean()) ** 2 + (y - y.mean()) ** 2).mean())


def main():
    key = jax.random.PRNGKey(0)
    with enable_x64():
        # -- 1. the starting point: an equiconvex N-BK7-ish singlet ------
        def make(c1, c2):
            lens = SingletLens(c1=c1, c2=c2, d=14.0, t=2.0,
                               ior_glass=1.5168, abbe_vd=64.17, name='L')
            sc = SequentialScene([lens])
            sc.add_bundle(CollimatedDisk.make(radius=3.0, translation=[0, 0, -10.0]), n_rays=20000)
            return sc

        sc = make(0.02, -0.02)
        p = sc.init_params(jnp.float64)
        rep = sc.seidel(p, aperture=3.0, field=0.05)
        print('=== equiconvex singlet ===')
        print(seidel_table(rep))

        # -- 2. bend to minimum spherical: gradient-descend S_I^2 at
        #       constant power (c1 - c2 fixed) --------------------------
        dphi = 0.04

        def S_I_of_bend(c1):
            sc_b = make(float(0.02), float(-0.02))  # structure only
            q = sc_b.init_params(jnp.float64)
            q['L'] = dict(q['L'])
            q['L']['c1'] = c1
            q['L']['c2'] = c1 - dphi
            return seidel(sc_b, q, aperture=3.0, field=0.05).S_I

        c1 = jnp.asarray(0.02, jnp.float64)
        g = jax.grad(lambda c: S_I_of_bend(c) ** 2)
        for _ in range(60):
            c1 = c1 - 20.0 * g(c1)
        c1_best = float(c1)
        print(f"\nbest-form bending: c1 = {c1_best:.6f}, "
              f"c2 = {c1_best - dphi:.6f}, "
              f"S_I = {float(S_I_of_bend(c1)):.3e} "
              f"(was {float(S_I_of_bend(jnp.asarray(0.02))):.3e})")

        # -- 3. aspherize the front face: closed-form a4 for S_I = 0 -----
        sc_b = make(c1_best, c1_best - dphi)
        p_b = sc_b.init_params(jnp.float64)
        rep_b = sc_b.seidel(p_b, aperture=3.0, field=0.05)
        y1 = float(rep_b.y[0])
        a4 = -float(rep_b.S_I) / (8.0 * (1.5168 - 1.0) * y1 ** 4)
        asph = AsphericLens(c1=c1_best, c2=c1_best - dphi, d=14.0, t=2.0,
                            ior_glass=1.5168, a1=(a4,), name='L')
        sc_a = SequentialScene([asph])
        sc_a.add_bundle(CollimatedDisk.make(radius=3.0, translation=[0, 0, -10.0]), n_rays=20000)
        p_a = sc_a.init_params(jnp.float64)
        rep_a = sc_a.seidel(p_a, aperture=3.0, field=0.05)
        print(f"aspherized: a4 = {a4:.3e}  ->  S_I = "
              f"{float(rep_a.S_I):.3e}")

        # -- 4. real-ray verdict: axial spot RMS at the paraxial image ---
        z = float(rep.z_image)
        for label, scene, params, r in (
                ('equiconvex', sc, p, rep),
                ('best-form', sc_b, p_b, rep_b),
                ('aspherized', sc_a, p_a, rep_a)):
            rms = spot_rms(scene, params, float(r.z_image), key)
            print(f"{label:>12}: spot RMS {rms * 1e3:8.2f} um   "
                  f"S_I {float(r.S_I):+.3e}")


if __name__ == '__main__':
    main()
