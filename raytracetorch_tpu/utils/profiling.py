"""Profiling helpers: jax.profiler traces + the chained-timing method.

The reference's only instrumentation is ``time.perf_counter`` wall clocks
(SURVEY.md §5).  Here:

- :func:`trace` — context manager writing a TensorBoard-loadable
  ``jax.profiler`` trace (open with ``tensorboard --logdir``).
- :func:`device_time_ms` — robust device-time measurement on remote/async
  backends (the axon tunnel's ``block_until_ready`` is async and each
  dispatch costs ~26 ms RPC): chain M dependent iterations inside one jit,
  force completion with a scalar fetch, subtract the measured dispatch
  floor.  This is the methodology behind bench.py / benchmarks/suite.py.
"""

from __future__ import annotations

import contextlib
import statistics
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir='/tmp/jax-trace'):
    """``with profiling.trace('/tmp/t'): run()`` -> TensorBoard trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def _fetch_ms(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts) * 1e3


def device_time_ms(step_fn, carry0, chain=100, reps=5):
    """True device time per iteration of ``step_fn(carry) -> carry``.

    ``carry0`` must be a pytree of arrays; each chained iteration consumes
    the previous output so nothing can be elided.
    """
    def run(c):
        def body(cc, _):
            return step_fn(cc), None
        c, _ = jax.lax.scan(body, c, None, length=chain)
        leaves = jax.tree_util.tree_leaves(c)
        return sum(jnp.sum(l) for l in leaves
                   if jnp.issubdtype(l.dtype, jnp.floating))

    floor = _fetch_ms(jax.jit(lambda c: jnp.float32(1.0)
                              + jax.tree_util.tree_leaves(c)[0].ravel()[0]),
                      carry0, reps=reps)
    total = _fetch_ms(jax.jit(run), carry0, reps=reps)
    return max((total - floor) / chain, 0.0)
