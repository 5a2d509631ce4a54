"""Benchmark suite over the five BASELINE.json configs.

Timing methodology matches bench.py: chained on-device iterations inside one
jit (nothing elidable), forced by a scalar fetch, minus the measured
dispatch+fetch floor (the axon tunnel's block_until_ready is async and each
dispatch costs ~26 ms RPC).

  1. singlet sequential   — 1M-ray collimated beam through the benchmark
                            singlet + aperture + sensor (sim_benchmark.py)
  2. mixed surfaces       — cylindrical singlet + rect aperture + second
                            singlet + sensor, sequential (10 surfaces)
  3. naive scene          — the same singlet scene traced by the
                            non-sequential nearest-hit bounce loop
  4. sensor render        — 1024x1024 single-bounce camera render
  5. differentiable design— value_and_grad of the spot-size loss (singlet)
  6. fused large batch    — 16M-ray forward trace via the Pallas kernel
                            (SequentialScene.simulate_fused) vs plain XLA
  7. asphere trace        — 1M rays through an AsphericLens (Halley-4
                            root refinement, geom/surfaces.py::asph_refine)
  8. irradiance grid      — 1M rays + 256x256 sensor grid, fused
                            (in-kernel hit capture) vs XLA scatter-add
"""

import functools
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               CylSingletLens, RectangularAperture, Scene,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.optim.goals import spot_size_loss
from raytracetorch_tpu.render.camera import Camera, Renderer

N = 1_000_000
# The axon tunnel's dispatch+fetch floor jitters by a few ms run-to-run;
# sub-ms configs need long chains so (total - floor)/CHAIN stays accurate
# (CHAIN=10 once produced NEGATIVE times when the floor drifted upward
# between its measurement and the config's).
CHAIN = 100
REPEATS = 5


def fetch_ms(fn, *args):
    float(fn(*args))
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def chained(step, out_of):
    """Chain ``step`` CHAIN times on device; return a jitted scalar fn."""
    def run(*args):
        def body(carry, _):
            return step(carry, *args[1:]), None
        carry, _ = jax.lax.scan(body, args[0], None, length=CHAIN)
        return out_of(carry)
    return jax.jit(run)


def emit(name, ms, **extra):
    print(json.dumps({'config': name, 'ms': round(ms, 3), **extra}),
          flush=True)


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
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0, 0, -10.0]).sample(key, N)

    floor = fetch_ms(jax.jit(lambda r: r.intensity[0] + 1.0), rays)
    emit('dispatch_floor', floor)

    def reset(rr, dz=30.0):
        return rr.replace(pz=rr.pz - dz,
                          intensity=jnp.ones_like(rr.intensity))

    # 1. singlet sequential
    scene = singlet_scene()
    p = scene.init_params()
    f = chained(lambda rr, pp: scene.simulate(pp, reset(rr), key)[0],
                lambda rr: jnp.sum(rr.px))
    ms = (fetch_ms(f, rays, p) - floor) / CHAIN
    emit('singlet_sequential_1M', ms, rays_per_s=round(N / ms * 1e3))

    # 2. mixed surfaces sequential (10 surfaces)
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
    fm = chained(lambda rr, pp: mixed.simulate(pp, reset(rr), key)[0],
                 lambda rr: jnp.sum(rr.px))
    ms = (fetch_ms(fm, rays, pm) - floor) / CHAIN
    emit('mixed_surfaces_sequential_1M', ms, rays_per_s=round(N / ms * 1e3),
         n_surfaces=sum(e.n_surfaces for e in mixed.elements))

    # 3. naive (non-sequential) scene, 8 bounces
    naive = singlet_scene(sequential=False)
    naive.n_bounces = 8
    pn = naive.init_params()
    fn = chained(lambda rr, pp: naive.simulate(pp, reset(rr), key)[0],
                 lambda rr: jnp.sum(rr.px))
    ms = (fetch_ms(fn, rays, pn) - floor) / CHAIN
    emit('naive_scene_1M_8bounce', ms,
         ray_bounces_per_s=round(N * 8 / ms * 1e3))

    # 3b. same scene through the fused non-sequential kernel
    fnf = chained(lambda rr, pp: naive.simulate_fused(pp, reset(rr),
                                                      key)[0],
                  lambda rr: jnp.sum(rr.px))
    ms = (fetch_ms(fnf, rays, pn) - floor) / CHAIN
    emit('naive_scene_1M_8bounce_fused', ms,
         ray_bounces_per_s=round(N * 8 / ms * 1e3))

    # 4. sensor render 1024x1024
    cam = Camera(position=[25.0, 18.0, -25.0], look_at=[0.0, 0.0, 10.0],
                 fov_deg=45.0, width=1024, height=1024)
    r = Renderer(naive)

    def render_chain(pp):
        def body(acc, _):
            img = r.render_3d(jax.tree_util.tree_map(
                lambda a: a + 0.0 * acc, pp), cam)
            return jnp.sum(img) * 1e-12, None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=CHAIN)
        return acc
    ms = (fetch_ms(jax.jit(render_chain), pn) - floor) / CHAIN
    emit('render_1024x1024', ms, fps=round(1e3 / ms, 1))

    # 5. differentiable design step
    def grad_chain(pp, rr):
        def loss(q):
            _, sensors, _ = scene.simulate(q, rr, key)
            return spot_size_loss(sensors)

        def body(q, _):
            val, g = jax.value_and_grad(loss)(q)
            q = jax.tree_util.tree_map(lambda a: a + 0.0 * val, q)
            return q, val
        q, vals = jax.lax.scan(body, pp, None, length=CHAIN)
        return jnp.sum(vals)
    ms = (fetch_ms(jax.jit(grad_chain), p, rays) - floor) / CHAIN
    emit('grad_step_1M', ms)

    # 6. fused large-batch forward trace (16M rays, Pallas vs XLA)
    n_big = 16 * 1024 * 1024          # LANE-aligned: zero pad copies
    rays_big = CollimatedDisk.make(
        radius=jnp.float32(4.0),
        translation=[0, 0, -10.0]).sample(key, n_big)
    chain_big = 5
    for name, sim in (('xla', scene.simulate),
                      ('pallas_fused',
                       functools.partial(scene.simulate_fused,
                                         auto_dispatch=False))):
        def run(rr, pp, sim=sim):
            def body(r2, _):
                out, _, _ = sim(pp, reset(r2), key)
                return out, None
            out, _ = jax.lax.scan(body, rr, None, length=chain_big)
            return jnp.sum(out.px)
        ms = (fetch_ms(jax.jit(run), rays_big, p) - floor) / chain_big
        emit(f'large_batch_16M_{name}', ms,
             rays_per_s=round(n_big / ms * 1e3))

    # 7. asphere trace (Halley-4 refinement; was Newton-8: 1.74 ms)
    from raytracetorch_tpu.elements.lens import AsphericLens
    asph = SequentialScene([
        AsphericLens(c1=0.05, k1=-0.6, a1=[2.5e-4, 1e-6, 0.0, 0.0],
                     c2=-0.02, d=10.0, t=3.0, ior_glass=1.5, name='asph'),
        SensorElement(radius=8.0, translation=[0, 0, 19.0], name='sensor'),
    ])
    pa = asph.init_params()
    fa = chained(lambda rr, pp: asph.simulate(pp, reset(rr), key)[0],
                 lambda rr: jnp.sum(rr.px))
    ms = (fetch_ms(fa, rays, pa) - floor) / CHAIN
    emit('asphere_sequential_1M', ms, rays_per_s=round(N / ms * 1e3))

    # 8. irradiance grid: fused in-kernel hit capture vs XLA scatter
    gscene = singlet_scene()
    gscene.grid_shape = (256, 256)
    gscene.grid_half_extent = 1.0
    pg = gscene.init_params()
    for name, sim in (('xla', gscene.simulate),
                      ('pallas_fused',
                       functools.partial(gscene.simulate_fused,
                                         auto_dispatch=False))):
        def gstep(rr, pp, sim=sim):
            out, s, _ = sim(pp, reset(rr), key)
            return out.replace(px=out.px + s.grid[0, 0, 0] * 1e-30)
        fg = chained(gstep, lambda rr: jnp.sum(rr.px))
        ms = (fetch_ms(fg, rays, pg) - floor) / CHAIN
        emit(f'grid_256_1M_{name}', ms)


if __name__ == '__main__':
    main()
