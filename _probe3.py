import statistics, sys, time
import jax, jax.numpy as jnp
from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.ops.pallas_trace import trace_sequential_pallas_v2

key = jax.random.PRNGKey(0)
scene = SequentialScene([
    SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0, ior_glass=1.5, name='lens'),
    CircularAperture(radius=5.0, name='stop'),
    SensorElement(radius=6.0, translation=[0, 0, 19.0], name='sensor'),
])
params = scene.init_params()
meta = scene.static_meta()
cfg = scene.sensor_config()

def fetch_ms(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3

N = int(sys.argv[1]); CHAIN = int(sys.argv[2]); BR = int(sys.argv[3])
rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                           translation=[0, 0, -10.0]).sample(key, N)
floor_ms = fetch_ms(jax.jit(lambda r: r.intensity[0] + 1.0), rays)
print(f'N={N} floor {floor_ms:.2f} ms', flush=True)

def chained_pallas(p, r):
    def body(rr, _):
        fresh = rr.replace(pz=rr.pz - 30.0,
                           intensity=jnp.ones_like(rr.intensity))
        table = scene.build_table(p)
        out, _, _ = trace_sequential_pallas_v2(table, fresh, key, cfg,
                                               static_meta=meta,
                                               block_rows=BR)
        return out, None
    out, _ = jax.lax.scan(body, r, None, length=CHAIN)
    return jnp.sum(out.px) + jnp.sum(out.pz)

def chained_xla(p, r):
    def body(rr, _):
        fresh = rr.replace(pz=rr.pz - 30.0,
                           intensity=jnp.ones_like(rr.intensity))
        out, _, _ = scene.simulate(p, fresh, key)
        return out, None
    out, _ = jax.lax.scan(body, r, None, length=CHAIN)
    return jnp.sum(out.px) + jnp.sum(out.pz)

for name, fn in (('pallas_v2', chained_pallas), ('xla', chained_xla)):
    ms = max((fetch_ms(jax.jit(fn), params, rays) - floor_ms) / CHAIN, 1e-6)
    print(f'{name:10s}: {ms:9.3f} ms/trace = {N/ms*1e3/1e9:.2f} Grays/s',
          flush=True)
