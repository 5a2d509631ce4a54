"""Render a scene in 3D and overlay traced ray paths + element profiles."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens,
                               SphericalMirror, Scene)
from raytracetorch_tpu.render.camera import Camera, Renderer
from raytracetorch_tpu.render.viz import (irradiance_map, path_plot,
                                          profile_plot, save_render)

OUT = os.path.join(os.path.dirname(__file__), 'output')


def main():
    key = jax.random.PRNGKey(0)
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    name='lens'),
        CircularAperture(radius=5.0, translation=[0, 0, 10.0], name='stop'),
        SensorElement(radius=6.0, translation=[0, 0, 19.0], name='sensor'),
    ])
    scene.grid_shape = (128, 128)
    scene.grid_half_extent = 0.6
    p = scene.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, 100000)
    out, sensors, aux = scene.simulate(p, rays, key, record_paths=True)

    path_plot(aux['paths'], path=os.path.join(OUT, 'ray_paths.png'),
              title='Singlet ray paths (y-z)')
    irradiance_map(sensors, 0, extent=0.6,
                   path=os.path.join(OUT, 'irradiance.png'),
                   title='Sensor irradiance (128x128)')

    r = Renderer(scene)
    profile_plot(r, p, 0, path=os.path.join(OUT, 'lens_profile.png'))
    cam = Camera(position=[22.0, 16.0, -22.0], look_at=[0.0, 0.0, 8.0],
                 fov_deg=40.0, width=800, height=600)
    img = r.jit_render(cam)(p)
    save_render(img, os.path.join(OUT, 'render_3d.png'))

    # Non-sequential fold: mirror scene
    fold = Scene([
        SphericalMirror(c1=-0.025, d=12.0, translation=[0, 0, 40.0],
                        name='mirror'),
        SensorElement(radius=10.0, translation=[0, 0, 0.5], name='sensor'),
    ], n_bounces=3)
    pf = fold.init_params()
    rays = CollimatedDisk.make(radius=jnp.float32(4.0)).sample(key, 2000)
    _, _, aux = fold.simulate(pf, rays, key, record_paths=True)
    path_plot(aux['paths'], path=os.path.join(OUT, 'mirror_fold_paths.png'),
              title='Non-sequential mirror fold')
    print('wrote', sorted(os.listdir(OUT)))


if __name__ == '__main__':
    main()
