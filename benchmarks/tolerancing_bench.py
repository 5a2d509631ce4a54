"""Per-ray tolerancing throughput: batched-frame table vs the clean trace
(round-1 verdict item #9 gate: 1M-ray per-ray-noise trace within ~3x of
the clean trace on TPU)."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CollimatedDisk, SensorElement,
                               SequentialScene, SingletLens)
from raytracetorch_tpu.utils.tolerancing import per_ray_perturbed_trace

N = int(os.environ.get('TOL_N', 1_000_000))
CHAIN = 50


def fetch_ms(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def main():
    scene = SequentialScene([
        SingletLens(c1=0.016667, c2=-0.00283, d=25.4, t=4.0,
                    ior_glass=1.5168, name='lens'),
        SensorElement(radius=20.0, translation=[0.0, 0.0, 100.0],
                      name='sensor'),
    ])
    p = scene.init_params()
    key = jax.random.PRNGKey(0)
    rays = CollimatedDisk.make(radius=jnp.float32(5.0),
                               translation=[0, 0, -10.0]).sample(key, N)
    noise = {'lens': ((0.05, 0.05, 0.02), (0.001, 0.001, 0.0))}

    def chained(fn):
        def run(r):
            def body(rr, k):
                fresh = rr.replace(pz=rr.pz - 120.0,
                                   intensity=jnp.ones_like(rr.intensity))
                out = fn(fresh, k)
                return out, None
            keys = jax.random.split(key, CHAIN)
            out, _ = jax.lax.scan(body, r, keys)
            return jnp.sum(out.px) + jnp.sum(out.pz)
        return jax.jit(run)

    def clean(r, k):
        out, _, _ = scene.simulate(p, r, k)
        return out

    def noisy(r, k):
        out, _ = per_ray_perturbed_trace(scene, p, r, k, noise)
        return out

    floor = fetch_ms(jax.jit(lambda r: r.px[0] + 1.0), rays)
    t_clean = (fetch_ms(chained(clean), rays) - floor) / CHAIN
    t_noisy = (fetch_ms(chained(noisy), rays) - floor) / CHAIN
    print({'n_rays': N, 'clean_ms': round(t_clean, 3),
           'per_ray_noise_ms': round(t_noisy, 3),
           'ratio': round(t_noisy / t_clean, 2),
           'device': str(jax.devices()[0])})


if __name__ == '__main__':
    main()
