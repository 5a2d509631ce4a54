"""Design a best-form singlet by L-BFGS through the differentiable trace.

Reproduces the reference's flagship workload (tests/test_optimize_singlet.py)
and saves before/after spot diagrams.  Run: python examples/01_singlet_design.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.fit import fit_lbfgs
from raytracetorch_tpu.render.viz import spot_diagram

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, c1_grad=True, c2_grad=True,
                    name='lens'),
        SensorElement(radius=20.0, translation=[0, 0, 100.0], name='sensor'),
    ])
    params = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, 30000)

    def spots(p, fname, title):
        _, _, aux = scene.simulate(p, rays, key, record_hits=True)
        spot_diagram(aux['hits'][-1], aux['hit_weights'][-1],
                     path=os.path.join(OUT, fname), title=title)

    def loss(p):
        _, sensors, _ = scene.simulate(p, rays, key)
        return sensors.spot_rms(0)[0] ** 2

    spots(params, 'singlet_before.png', 'Singlet spot (initial)')
    params, losses = fit_lbfgs(loss, params, trainable=scene.trainable(),
                               steps=60)
    spots(params, 'singlet_after.png', 'Singlet spot (best form)')

    c1, c2 = float(params['lens']['c1']), float(params['lens']['c2'])
    print(f"loss {float(losses[0]):.3e} -> {float(losses[-1]):.3e}")
    print(f"C1={c1:.6f} C2={c2:.6f}  C1/C2={c1/c2:.3f} (best form ~ -6)")
    print(f"f = {float(scene.elements[0].f(params['lens'])):.2f}")


if __name__ == '__main__':
    main()
