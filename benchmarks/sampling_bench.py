"""Disk-sampling micro-benchmark: rejection vs polar (inverse-CDF).

The TPU-native rendition of the reference's sampler harness
(reference tests/sampling.py:45-82, rejection-vs-polar sweep on
cpu/cuda): the polar sampler is the production path
(rays/sources.py::disk_sample — sqrt-of-uniform radius, branch-free,
2 uniforms + 4 transcendentals per point); the rejection sampler is
the algorithm the reference benchmarks against it.  True rejection has
a data-dependent output shape, which XLA cannot compile — the honest
TPU version redraws REJECTED LANES IN PLACE under a ``lax.while_loop``
(static [N] shape, data-dependent trip count, E[iters] ~ log of the
miss tail), which is also how you'd write any accepted/rejected
sampler TPU-natively.

Timing uses the chained-dispatch methodology (utils/profiling.py::
device_time_ms): the axon tunnel's ~30 ms RPC floor swamps per-call
timing, so M dependent iterations run inside one jit and the floor is
subtracted.  Run: ``python benchmarks/sampling_bench.py [--cpu]``.
"""
import sys

sys.path.insert(0, '/root/repo')

import jax

if '--cpu' in sys.argv:
    jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp
from jax import lax


def polar(key, n):
    u1, u2 = jax.random.split(key)
    r = jnp.sqrt(jax.random.uniform(u1, (n,)))
    th = jax.random.uniform(u2, (n,), maxval=2.0 * jnp.pi)
    return r * jnp.cos(th), r * jnp.sin(th)


def rejection(key, n):
    def cond(s):
        return ~jnp.all(s[3])

    def body(s):
        key, x, y, ok = s
        key, k1, k2 = jax.random.split(key, 3)
        cx = jax.random.uniform(k1, (n,), minval=-1.0, maxval=1.0)
        cy = jax.random.uniform(k2, (n,), minval=-1.0, maxval=1.0)
        hit = cx * cx + cy * cy <= 1.0
        take = jnp.logical_and(~ok, hit)
        return (key, jnp.where(take, cx, x), jnp.where(take, cy, y),
                jnp.logical_or(ok, hit))

    z = jnp.zeros((n,), jnp.float32)
    _, x, y, _ = lax.while_loop(
        cond, body, (key, z, z, jnp.zeros((n,), bool)))
    return x, y


def main():
    from raytracetorch_tpu.utils.profiling import device_time_ms

    print(f'backend: {jax.default_backend()}')
    print(f"{'N':>10} | {'rejection (ms)':>14} | {'polar (ms)':>11} | "
          f"speedup")
    for n in (10_000, 100_000, 1_000_000, 10_000_000):
        def step_of(sampler):
            # the key chains the iterations; the float accumulator
            # (leaf 0 — device_time_ms's floor probe reads it) consumes
            # the samples so nothing is DCE'd
            def step(carry):
                acc, key = carry
                key, sub = jax.random.split(key)
                x, y = sampler(sub, n)
                return acc + x[0] + y[-1], key
            return step

        chain = max(10, min(200, 2_000_000 // n))
        t_rej = device_time_ms(step_of(rejection),
                               (jnp.float32(0), jax.random.PRNGKey(0)),
                               chain=chain)
        t_pol = device_time_ms(step_of(polar),
                               (jnp.float32(0), jax.random.PRNGKey(1)),
                               chain=chain)
        win = 'polar' if t_rej > t_pol else 'rejection'
        print(f'{n:>10} | {t_rej:>14.4f} | {t_pol:>11.4f} | '
              f'{t_rej / max(t_pol, 1e-9):.2f}x ({win})')


if __name__ == '__main__':
    main()
