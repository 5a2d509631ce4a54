"""Pallas fused-chain kernel vs the XLA sequential driver at large N.

VERDICT round-1 item #2: the XLA path is at the per-surface-round-trip HBM
roofline for <=1M rays but ~3.4x off the one-round-trip bound at 64M rays
(BASELINE.md scaling table) because each surface's fusion boundary spills
the seven [N] ray-state arrays to HBM.  The pallas kernels pin a ray tile
in VMEM across the whole surface chain = ONE HBM round trip total.

Usage:  python benchmarks/pallas_vs_xla.py [n_millions ...]
Timing: chained-on-device per BASELINE.md protocol (axon dispatch ~26 ms).
"""

import os
import sys
import time
import statistics

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp

from raytracetorch_tpu import (CircularAperture, CollimatedDisk,
                               SensorElement, SequentialScene, SingletLens)
from raytracetorch_tpu.ops.pallas_trace import (trace_sequential_pallas,
                                                trace_sequential_pallas_v2)


def build_scene():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                    ior_glass=1.5, ior_media=1.0, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])


def fetch_ms(fn, *args, reps=3):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def chained(trace_fn, chain):
    """trace_fn(rays) -> rays; chain with state reset each iteration."""
    def run(r):
        def body(rr, _):
            fresh = rr.replace(pz=rr.pz - 30.0,
                               intensity=jnp.ones_like(rr.intensity))
            out = trace_fn(fresh)
            return out, None
        out, _ = jax.lax.scan(body, r, None, length=chain)
        return jnp.sum(out.px) + jnp.sum(out.py) + jnp.sum(out.pz)
    return jax.jit(run)


def main():
    n_millions = [int(x) for x in sys.argv[1:]] or [1, 4, 16, 64]
    scene = build_scene()
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    table_fn = jax.jit(scene.build_table)
    meta = scene.static_meta()
    cfg = scene.sensor_config()
    print('device:', jax.devices()[0], flush=True)

    # parity check on TPU at small N first
    rays_s = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0.0, 0.0, -10.0]).sample(key, 8192)
    table = table_fn(params)
    out_ref, sens_ref, _ = jax.jit(
        lambda p, r: scene.simulate(p, r, key))(params, rays_s)
    import numpy as np
    for nm, fn in [('v1', trace_sequential_pallas),
                   ('v2', trace_sequential_pallas_v2)]:
        try:
            out_pl, sens_pl, _ = jax.jit(
                lambda r: fn(table, r, key, cfg, meta))(rays_s)
            err = float(jnp.max(jnp.abs(out_pl.px - out_ref.px)
                                + jnp.abs(out_pl.py - out_ref.py)
                                + jnp.abs(out_pl.pz - out_ref.pz)))
            merr = float(jnp.max(jnp.abs(sens_pl.moments - sens_ref.moments)))
            print(f'parity {nm}: max pos err {err:.2e}  moment err {merr:.2e}',
                  flush=True)
        except Exception as e:
            print(f'parity {nm}: FAILED {type(e).__name__}: {e}', flush=True)

    for nm_ in n_millions:
        n = nm_ * 1_000_000
        if os.environ.get('ROUND_N'):     # tile-divisible N: no pad copies
            tile_ = int(os.environ.get('V2_BLOCK_ROWS', '64')) * 512
            n = (n // tile_) * tile_
        rays = CollimatedDisk.make(
            radius=jnp.float32(4.0),
            translation=[0.0, 0.0, -10.0]).sample(key, n)
        chain = max(3, min(200, int(200 / nm_)))
        floor = fetch_ms(jax.jit(lambda r: r.px[0] + 1.0), rays)

        def xla_fn(r):
            out, _, _ = scene.simulate(params, r, key)
            return out

        def v1_fn(r):
            out, _, _ = trace_sequential_pallas(table, r, key, cfg, meta)
            return out

        block_rows = int(os.environ.get('V2_BLOCK_ROWS', '64'))

        def v2_fn(r):
            out, _, _ = trace_sequential_pallas_v2(table, r, key, cfg, meta,
                                                   block_rows=block_rows)
            return out

        row = {'n_M': nm_, 'chain': chain, 'floor_ms': round(floor, 1)}
        runs = [('xla', xla_fn), ('v1', v1_fn), ('v2', v2_fn)]
        if os.environ.get('SKIP_V1'):
            runs = [r for r in runs if r[0] != 'v1']
        if os.environ.get('SKIP_XLA'):
            runs = [r for r in runs if r[0] != 'xla']
        for name, fn in runs:
            try:
                total = fetch_ms(chained(fn, chain), rays)
                ms = max((total - floor) / chain, 1e-6)
                row[name + '_ms'] = round(ms, 3)
                row[name + '_Grays'] = round(n / ms / 1e6, 3)
            except Exception as e:
                row[name + '_ms'] = f'FAIL {type(e).__name__}: {str(e)[:200]}'
        print(row, flush=True)


if __name__ == '__main__':
    main()
