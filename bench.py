"""Headline benchmark: 1M-ray singlet sequential trace on one TPU chip.

Scene and protocol follow BASELINE.md: the reference's committed benchmark
configuration (reference benchmarks/sim_benchmark.py:56-95 — CollimatedDisk
r=4 -> SingletLens(c=+/-0.05, d=10, t=3, n=1.5) + CircularAperture(r=5) +
Sensor disk r=6 @ z=19) traced sequentially over 1M rays.

Baseline: the reference's own code on torch-CPU measured by
benchmarks/reference_cpu_baseline.py on this machine: 1,000,000 rays in
1896 ms = 527,292 rays/s (see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": x}
plus auxiliary fields (trace ms, grad-step ms) in the same object.
"""

import json
import statistics
import time

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.optim.goals import spot_size_loss

BASELINE_RAYS_PER_S = 527_292.0     # reference torch-CPU, this machine
N_RAYS = 1_000_000
REPEATS = 20
WARMUP = 3


def build_scene():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                    ior_glass=1.5, ior_media=1.0,
                    c1_grad=True, c2_grad=True, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])


def main():
    scene = build_scene()
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    bundle = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0.0, 0.0, -10.0])
    rays = jax.block_until_ready(bundle.sample(key, N_RAYS))

    trace = jax.jit(lambda p, r, k: scene.simulate(p, r, k))

    def grad_step(p, r, k):
        def loss(pp):
            _, sensors, _ = scene.simulate(pp, r, k)
            return spot_size_loss(sensors)
        return jax.value_and_grad(loss)(p)

    grad = jax.jit(grad_step)

    for _ in range(WARMUP):
        out, sensors, _ = trace(params, rays, key)
        jax.block_until_ready(out.pos)

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out, sensors, _ = trace(params, rays, key)
        jax.block_until_ready(out.pos)
        times.append(time.perf_counter() - t0)
    trace_ms = statistics.mean(times) * 1e3

    for _ in range(WARMUP):
        val, g = grad(params, rays, key)
        jax.block_until_ready(val)
    gtimes = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        val, g = grad(params, rays, key)
        jax.block_until_ready(val)
        gtimes.append(time.perf_counter() - t0)
    grad_ms = statistics.mean(gtimes) * 1e3

    rays_per_s = N_RAYS / (trace_ms / 1e3)
    print(json.dumps({
        'metric': 'rays/sec on 1M-ray singlet sequential trace',
        'value': round(rays_per_s),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_s / BASELINE_RAYS_PER_S, 2),
        'trace_ms': round(trace_ms, 3),
        'grad_step_ms': round(grad_ms, 3),
        'n_rays': N_RAYS,
        'device': str(jax.devices()[0]),
        'spot_rms': round(float(sensors.spot_rms(0)[0]), 5),
    }))


if __name__ == '__main__':
    main()
