"""Headline benchmark: 1M-ray singlet sequential trace on one TPU chip.

Scene and protocol follow BASELINE.md: the reference's committed benchmark
configuration (reference benchmarks/sim_benchmark.py:56-95 — CollimatedDisk
r=4 -> SingletLens(c=+/-0.05, d=10, t=3, n=1.5) + CircularAperture(r=5) +
Sensor disk r=6 @ z=19) traced sequentially over 1M rays.

Timing methodology: under the axon remote backend, ``block_until_ready`` is
asynchronous and each dispatch pays a ~26 ms RPC round trip, so naive
per-call timing is meaningless.  We therefore time M traces CHAINED ON
DEVICE inside one jit (each iteration consumes the previous output, so
nothing can be elided), force completion by fetching a result-dependent
scalar, and subtract the measured dispatch+fetch floor.  This reports true
device throughput.

Baseline: the reference's own code on torch-CPU measured by
benchmarks/reference_cpu_baseline.py on this machine: 1,000,000 rays in
1896 ms = 527,292 rays/s (see BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": rays/s, "unit": "rays/s", "vs_baseline": x, ...}
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
CHAIN = 200     # large enough that CHAIN * t_trace >> RPC-floor noise
GRAD_CHAIN = 50
REPEATS = 5


def build_scene():
    return SequentialScene([
        SingletLens(c1=0.05, c2=-0.05, d=10.0, t=3.0,
                    ior_glass=1.5, ior_media=1.0,
                    c1_grad=True, c2_grad=True, name='lens'),
        CircularAperture(radius=5.0, name='stop'),
        SensorElement(radius=6.0, translation=[0.0, 0.0, 19.0],
                      name='sensor'),
    ])


def _fetch_times_ms(fn, *args, reps=REPEATS):
    """Wall times (ms) of reps calls to fn(*args), each forced by fetching
    its scalar result; first (compile/warmup) call discarded."""
    float(fn(*args))     # warmup / compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return ts


def _median_fetch_ms(fn, *args, reps=REPEATS):
    """Median wall time of fn(*args) forced by fetching its scalar result."""
    return statistics.median(_fetch_times_ms(fn, *args, reps=reps))


def main():
    scene = build_scene()
    params = scene.init_params()
    key = jax.random.PRNGKey(0)
    bundle = CollimatedDisk.make(radius=jnp.float32(4.0),
                                 translation=[0.0, 0.0, -10.0])
    rays = bundle.sample(key, N_RAYS)

    shift = jnp.array([0.0, 0.0, 30.0])

    def chained_trace(p, r, k):
        def body(rr, _):
            fresh = rr.replace(pz=rr.pz - shift[2],
                               intensity=jnp.ones_like(rr.intensity))
            out, _, _ = scene.simulate(p, fresh, k)
            return out, None
        out, _ = jax.lax.scan(body, r, None, length=CHAIN)
        return jnp.sum(out.px) + jnp.sum(out.py) + jnp.sum(out.pz)

    def chained_grad(p, r, k):
        def loss(pp, rr):
            _, sensors, _ = scene.simulate(pp, rr, k)
            return spot_size_loss(sensors)

        def body(carry, _):
            pp, rr = carry
            val, g = jax.value_and_grad(loss)(pp, rr)
            # feed the value back so no step can be elided
            pp = jax.tree_util.tree_map(lambda a: a + 0.0 * val, pp)
            return (pp, rr), val
        (_, _), vals = jax.lax.scan(body, (p, r), None, length=GRAD_CHAIN)
        return jnp.sum(vals)

    # Median-of-N protocol (round-2 VERDICT item 5): the ~30 ms dispatch
    # floor jitters +/-15% run-to-run, so a single sample cannot tell a
    # real regression from noise.  Every quantity is median over REPEATS
    # runs and the JSON carries the per-run spread.
    floor_fn = jax.jit(lambda r: r.intensity[0] + 1.0)
    floor_ts = _fetch_times_ms(floor_fn, rays)
    floor_ms = statistics.median(floor_ts)

    trace_ts = _fetch_times_ms(jax.jit(chained_trace), params, rays, key)
    per_run_trace = [max((t - floor_ms) / CHAIN, 1e-6) for t in trace_ts]
    trace_ms = statistics.median(per_run_trace)

    grad_ts = _fetch_times_ms(jax.jit(chained_grad), params, rays, key)
    per_run_grad = [max((t - floor_ms) / GRAD_CHAIN, 1e-6) for t in grad_ts]
    grad_ms = statistics.median(per_run_grad)

    # single trace for the sensor stats
    _, sensors, _ = jax.jit(
        lambda p, r, k: scene.simulate(p, r, k))(params, rays, key)
    rms = float(sensors.spot_rms(0)[0])

    rays_per_s = N_RAYS / (trace_ms / 1e3)
    print(json.dumps({
        'metric': 'rays/sec on 1M-ray singlet sequential trace',
        'value': round(rays_per_s),
        'unit': 'rays/s',
        'vs_baseline': round(rays_per_s / BASELINE_RAYS_PER_S, 2),
        'trace_ms': round(trace_ms, 3),
        'trace_ms_runs': [round(t, 3) for t in per_run_trace],
        'trace_spread_pct': round(100.0 * (max(per_run_trace)
                                           - min(per_run_trace))
                                  / trace_ms, 1),
        'grad_step_ms': round(grad_ms, 3),
        'grad_ms_runs': [round(t, 3) for t in per_run_grad],
        'n_rays': N_RAYS,
        'chain': CHAIN,
        'repeats': REPEATS,
        'dispatch_floor_ms': round(floor_ms, 2),
        'floor_ms_runs': [round(t, 2) for t in floor_ts],
        'device': str(jax.devices()[0]),
        'spot_rms': round(rms, 5),
    }))


if __name__ == '__main__':
    main()
