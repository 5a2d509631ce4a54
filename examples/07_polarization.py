"""Polarization through the main trace: Brewster-plate analyzer + a
polarization-resolved irradiance map.

Demonstrates ``scene.simulate(..., track_field=True)``: a glass plate
tilted at Brewster's angle transmits p-polarized light perfectly while
attenuating s; the sensor's irradiance grid is |E|^2-weighted, so the two
launch polarizations produce visibly different transmitted power maps, and
Stokes parameters classify the output states.
"""
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from raytracetorch_tpu import (CollimatedDisk, ElementCustom, SensorElement,
                               SequentialScene)
from raytracetorch_tpu.constants import PhysKind
from raytracetorch_tpu.elements import shapes
from raytracetorch_tpu.utils.polarization import (degree_of_polarization,
                                                  stokes_parameters)

OUT = os.path.join(os.path.dirname(__file__), 'output')
N_GLASS = 1.5


def main():
    key = jax.random.PRNGKey(0)
    theta_b = math.atan(N_GLASS)            # Brewster: 56.3 deg for n=1.5

    # A single air->glass interface tilted so the collimated +z beam meets
    # it at Brewster incidence, plus a sensor plane behind it.
    iface = ElementCustom(shapes.plane, 1, PhysKind.SNELL,
                          ph=(N_GLASS, 1.0), name='brewster',
                          rotation=[theta_b, 0.0, 0.0],
                          translation=[0.0, 0.0, 10.0])
    scene = SequentialScene([
        iface,
        SensorElement(half_x=6.0, half_y=6.0, translation=[0, 0, 30.0],
                      name='sensor'),
    ])
    scene.grid_shape = (96, 96)
    scene.grid_half_extent = 6.0
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 200_000)

    results = {}
    for label, E0 in [('s-pol (E along x)', [[1.0, 0.0, 0.0]]),
                      ('p-pol (E in y-z)', [[0.0, 1.0, 0.0]]),
                      ('circular', np.array([[1.0, 1.0j, 0.0]]) / np.sqrt(2))]:
        out, sensors, aux = scene.simulate(p, rays, key, track_field=True,
                                           E0=E0)
        power = float(jnp.mean(aux['field_power']))
        s0, s1, s2, s3 = stokes_parameters(aux['field'], out.dir_c)
        dop = float(jnp.mean(degree_of_polarization(s0, s1, s2, s3)))
        results[label] = (power, np.asarray(sensors.grid[0]), dop,
                          float(jnp.mean(s3 / jnp.maximum(s0, 1e-12))))
        print(f'{label:22s}  mean T = {power:.4f}   DoP = {dop:.3f}   '
              f'<S3/S0> = {results[label][3]:+.3f}')

    # p-pol transmits ~100% at Brewster; s-pol is attenuated
    assert results['p-pol (E in y-z)'][0] > 0.99
    assert results['s-pol (E along x)'][0] < 0.90

    try:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(12, 4))
        for ax, (label, (power, grid, dop, s3)) in zip(axes, results.items()):
            ax.imshow(grid, origin='lower', cmap='inferno')
            ax.set_title(f'{label}\nmean T = {power:.3f}')
            ax.set_xticks([])
            ax.set_yticks([])
        fig.suptitle("Brewster plate: |E|$^2$-weighted sensor irradiance")
        fig.tight_layout()
        fig.savefig(os.path.join(OUT, '07_polarization.png'), dpi=110)
        print('wrote', os.path.join(OUT, '07_polarization.png'))
    except ImportError:
        pass


if __name__ == '__main__':
    main()
