"""Multi-configuration (zoom) design: one shared prescription, two system
states optimized together (optim/multiconfig.py — beyond the torch
reference, whose Scene holds a single parameter state per element).

A singlet on a z-slide must focus collimated light onto TWO sensor planes
(z = 110 and z = 130) — the classic refocus problem.  Shared leaves
(curvatures) receive the summed gradient over configurations; the slide
position is a per-configuration stacked leaf.  All configurations trace in
ONE vmapped program, so the 2-config merit costs about one 2x-wide trace.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

if '--cpu' in sys.argv:        # for when the TPU tunnel is claimed
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit_lbfgs
from raytracetorch_tpu.optim.goals import spot_size_loss
from raytracetorch_tpu.optim.multiconfig import (config_params, config_sweep,
                                                 multiconfig_loss,
                                                 stack_configs)


def main():
    key = jax.random.PRNGKey(7)
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    trans_grad=True, trans_mask=[0, 0, 1], name='lens'),
        SensorElement(radius=30.0, translation=[0, 0, 110.0],
                      name='sensor'),
    ])
    rays = CollimatedDisk.make(radius=jnp.float32(8.0),
                               translation=[0, 0, -10.0]).sample(key, 20000)

    mc, axes = stack_configs(scene.init_params(), [
        {'lens': {'trans': [0., 0., 5.]}},                      # config 0
        {'lens': {'trans': [0., 0., 25.]},                      # config 1
         'sensor': {'trans': [0., 0., 130.]}},
    ])

    def per_cfg(p, i):
        _, sensors, _ = scene.simulate(p, rays, key)
        return spot_size_loss(sensors)

    merit = multiconfig_loss(per_cfg, axes)
    rms = config_sweep(per_cfg, mc, axes)
    print(f"initial RMS spots: {np.asarray(rms)}")

    mc2, losses = fit_lbfgs(merit, mc, trainable=scene.trainable(),
                            steps=60)
    rms2 = config_sweep(per_cfg, mc2, axes)
    z = np.asarray(mc2['lens']['trans'])[:, 2]
    c1 = float(mc2['lens']['c1'])
    c2 = float(mc2['lens']['c2'])
    print(f"final RMS spots:   {np.asarray(rms2)}")
    print(f"slide positions:   z0={z[0]:.3f}  z1={z[1]:.3f} "
          f"(delta {z[1]-z[0]:.3f}, sensor spacing 20)")
    print(f"shared curvatures: c1={c1:.6f}  c2={c2:.6f} "
          f"(best-form ratio {c1/c2:.2f})")
    for i in range(2):
        p_i = config_params(mc2, axes, i)
        print(f"config {i}: lens z {float(p_i['lens']['trans'][2]):.3f}, "
              f"sensor z {float(p_i['sensor']['trans'][2]):.1f}, "
              f"RMS {float(rms2[i]):.2e}")


if __name__ == '__main__':
    main()
