"""Benchmark suite over the five BASELINE.json configs.

Each config prints one JSON line; run on the default device (TPU under
axon, CPU if forced).  The headline driver metric stays in bench.py.

  1. singlet sequential   — 1M-ray collimated beam through the benchmark
                            singlet + aperture + sensor (sim_benchmark.py)
  2. mixed surfaces       — cylindrical singlet + rect aperture + parabolic
                            mirror + sensor, sequential
  3. naive scene          — the same singlet scene traced by the
                            non-sequential nearest-hit bounce loop
  4. sensor render        — 1024x1024 single-bounce camera render
  5. differentiable design— value_and_grad of the spot-size loss (singlet)
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               CylSingletLens, ParabolicMirror,
                               RectangularAperture, Scene, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.optim.goals import spot_size_loss
from raytracetorch_tpu.render.camera import Camera, Renderer

N = 1_000_000
REPEATS = 10


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def emit(name, ms, unit='ms', **extra):
    print(json.dumps({'config': name, 'value': round(ms, 3), 'unit': unit,
                      **extra}), flush=True)


def singlet_scene(sequential=True):
    els = [
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5,
                    c1_grad=True, c2_grad=True, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0, 0, 19.0], name='sensor'),
    ]
    return (SequentialScene if sequential else Scene)(els)


def main():
    key = jax.random.PRNGKey(0)
    rays = jax.block_until_ready(CollimatedDisk.make(
        radius=jnp.float32(4.0), translation=[0, 0, -10.0]).sample(key, N))

    # 1. singlet sequential
    scene = singlet_scene()
    p = scene.init_params()
    f = jax.jit(lambda pp, r: scene.simulate(pp, r, key)[0].pos)
    ms = timeit(f, p, rays)
    emit('singlet_sequential_1M', ms, rays_per_s=round(N / ms * 1e3))

    # 2. mixed surfaces sequential
    mixed = SequentialScene([
        CylSingletLens(c1=0.04, c2=-0.04, height=12.0, width=14.0, t=3.0,
                       ior_glass=1.5, name='cyl'),
        RectangularAperture(half_x=5.0, half_y=5.0, invert=True,
                            translation=[0, 0, 8.0], name='stop'),
        SingletLens(c1=0.03, c2=-0.03, d=14.0, t=2.0, ior_glass=1.62,
                    translation=[0, 0, 14.0], name='lens2'),
        SensorElement(radius=10.0, translation=[0, 0, 40.0], name='sensor'),
    ])
    pm = mixed.init_params()
    fm = jax.jit(lambda pp, r: mixed.simulate(pp, r, key)[0].pos)
    ms = timeit(fm, pm, rays)
    emit('mixed_surfaces_sequential_1M', ms, rays_per_s=round(N / ms * 1e3),
         n_surfaces=sum(e.n_surfaces for e in mixed.elements))

    # 3. naive (non-sequential) scene, 8 bounces
    naive = singlet_scene(sequential=False)
    naive.n_bounces = 8
    pn = naive.init_params()
    fn = jax.jit(lambda pp, r: naive.simulate(pp, r, key)[0].pos)
    ms = timeit(fn, pn, rays)
    emit('naive_scene_1M_8bounce', ms,
         ray_bounces_per_s=round(N * 8 / ms * 1e3))

    # 4. sensor render 1024x1024
    cam = Camera(position=[25.0, 18.0, -25.0], look_at=[0.0, 0.0, 10.0],
                 fov_deg=45.0, width=1024, height=1024)
    r = Renderer(scene)
    fr = r.jit_render(cam)
    ms = timeit(fr, pn)
    emit('render_1024x1024', ms, fps=round(1e3 / ms, 1))

    # 5. differentiable design step
    def loss(pp, r):
        _, sensors, _ = scene.simulate(pp, r, key)
        return spot_size_loss(sensors)
    fg = jax.jit(jax.value_and_grad(loss))
    ms = timeit(fg, p, rays)
    emit('grad_step_1M', ms)


if __name__ == '__main__':
    main()
