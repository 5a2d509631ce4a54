"""Chunked XLA trace at large N: lax.map over VMEM-sized ray chunks.

Hypothesis: the monolithic XLA trace at 64M is HBM-bound (one ray-state
round trip per surface), but a 1M-ray chunk's state stays in VMEM across
the whole fused chain (measured 3 G rays/s at 1M).  Mapping the chunk
program over 64 chunks should then approach one-HBM-round-trip performance
using pure XLA — with gradients for free, unlike the Pallas kernel.

MEASURED: REFUTED on v5e.  64M rays, chunk=1M: monolithic 83.8 ms vs
chunked 305 ms (4x WORSE).  lax.map's per-iteration dynamic-slice in and
out of the [n_chunks, chunk] arrays is itself a full HBM round trip per
chunk, and XLA does not keep the loop-carried chunk resident in VMEM
across the scan boundary — the explicit VMEM pinning of the Pallas v2
kernel (ops/pallas_trace.py, 33.8 ms) is the real mechanism, not an
artifact a pure-XLA loop can reproduce.  Kept as the recorded negative
result."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)


def fetch_ms(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def main():
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    chunk = int(os.environ.get('CHUNK', 1_048_576))
    n = n_m * 1_000_000
    scene = SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                    ior_glass=1.5, ior_media=1.0, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    rays = CollimatedDisk.make(radius=jnp.float32(4.0),
                               translation=[0.0, 0.0, -10.0]).sample(key, n)
    print('device', jax.devices()[0], 'n', n, 'chunk', chunk, flush=True)

    def mono(r):
        out, _, _ = scene.simulate(params, r, key)
        return out

    def chunked(r):
        n_pad = -(-r.px.shape[0] // chunk) * chunk
        rr = jax.tree_util.tree_map(
            lambda a: jnp.pad(a, (0, n_pad - a.shape[0])).reshape(
                n_pad // chunk, chunk), r)

        def body(rc):
            out, _, _ = scene.simulate(params, rc, key)
            return out
        out = jax.lax.map(body, rr)
        return jax.tree_util.tree_map(
            lambda a: a.reshape(-1)[:r.px.shape[0]], out)

    chain = max(3, min(50, 200 // n_m))

    def chained(fn):
        def run(r):
            def body(rr, _):
                fresh = rr.replace(pz=rr.pz - 30.0,
                                   intensity=jnp.ones_like(rr.intensity))
                return fn(fresh), None
            out, _ = jax.lax.scan(body, r, None, length=chain)
            return jnp.sum(out.px) + jnp.sum(out.pz)
        return jax.jit(run)

    floor = fetch_ms(jax.jit(lambda r: r.px[0] + 1.0), rays)
    row = {'n_M': n_m, 'chunk': chunk, 'floor_ms': round(floor, 1)}
    for name, fn in [('mono', mono), ('chunked', chunked)]:
        total = fetch_ms(chained(fn), rays)
        ms = max((total - floor) / chain, 1e-6)
        row[name + '_ms'] = round(ms, 3)
        row[name + '_Grays'] = round(n / ms / 1e6, 3)
    print(row, flush=True)


if __name__ == '__main__':
    main()
