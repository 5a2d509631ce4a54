import statistics
import sys
import time

import jax
import jax.numpy as jnp

import raytracetorch_tpu.ops.pallas_trace as PT
from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)

key = jax.random.PRNGKey(0)
scene = SequentialScene([
    SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5, name='lens'),
    CircularAperture(radius=5.0, name='stop'),
    SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0], name='sensor'),
])
params = scene.init_params()
N = 1_000_000
rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                           translation=[0, 0, -10.0]).sample(key, N)
meta = scene.static_meta()
cfg = scene.sensor_config()
CHAIN = 20


def fetch_ms(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


floor_ms = fetch_ms(jax.jit(lambda r: r.intensity[0] + 1.0), rays)
print(f'floor {floor_ms:.2f} ms', flush=True)


def bench(tile):
    PT.TILE = tile

    def chained(p, r):
        def body(rr, _):
            fresh = rr.replace(pz=rr.pz - 30.0,
                               intensity=jnp.ones_like(rr.intensity))
            table = scene.build_table(p)
            out, sensors, _ = PT.trace_sequential_pallas(
                table, fresh, key, cfg, static_meta=meta)
            return out, None
        out, _ = jax.lax.scan(body, r, None, length=CHAIN)
        return jnp.sum(out.px) + jnp.sum(out.pz)

    total = fetch_ms(jax.jit(chained), params, rays)
    return max((total - floor_ms) / CHAIN, 1e-6)


for tile in (int(x) for x in sys.argv[1:]):
    t0 = time.perf_counter()
    try:
        ms = bench(tile)
        print(f'TILE={tile:6d}: {ms:8.3f} ms/trace   '
              f'(compile+run {time.perf_counter() - t0:.0f}s)', flush=True)
    except Exception as e:
        print(f'TILE={tile:6d}: FAIL {type(e).__name__}: {str(e)[:160]}',
              flush=True)
